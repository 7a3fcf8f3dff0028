"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ingest→audit→reconcile slice at sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory (SURVEY §2 + M7
extensions) with DuckDB oracle twins; see
``dataingestionframework_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataingestionframework_spark.plans.oracles import ORACLES
from dataingestionframework_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataingestionframework_spark.plans.queries import ingest_reconcile

    return ingest_reconcile(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
