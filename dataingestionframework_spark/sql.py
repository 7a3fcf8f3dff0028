"""SQL-text interface.

The reference exposes everything through Spark SQL text (f-string
queries over ``autoloader.*`` tables). This module gives our engine the
same front door: register managed/system/test tables as temp views and
run SQL against them — with the critical difference that names are
bound through the view catalog, not interpolated into strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog.system import SystemTables
from .catalog.table import TableCatalog
from .plans.tables import TABLES, load


def register_test_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the benchmark parquet tables as temp views."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def register_system_tables(spark: SparkSession, tables: SystemTables) -> list[str]:
    """Register the control-plane tables (header_config, logs, …)."""
    out = []
    for name in SystemTables.NAMES:
        tables._t(name).read().createOrReplaceTempView(name)
        out.append(name)
    return out


def register_catalog_table(spark: SparkSession, catalog: TableCatalog, name: str,
                           view: str | None = None) -> str:
    view = view or name.replace(".", "_")
    catalog.table(name).read().createOrReplaceTempView(view)
    return view


def run(spark: SparkSession, sql: str) -> DataFrame:
    """Run SQL text (over whatever views are registered)."""
    return spark.sql(sql)
