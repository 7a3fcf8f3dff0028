"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, an order-insensitive multiset of normalized values, AND
the Arrow-level output types.

The type check exists because the driver's hash is type-sensitive: it
canonicalizes both sides through pandas, so a DuckDB HUGEINT
(``decimal128(38,0)`` via Arrow) against a Spark ``bigint`` hash-fails
even when every value is bit-identical (proven rounds 4-6 on
``blocklist_filter_docs``). We therefore fetch the DuckDB side via
``.arrow()`` and compare normalized type tags against the Spark schema;
``decimal(38,0)`` vs ``bigint`` and ``int`` vs ``bigint`` are
mismatches, never silently equal.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

# ORACLE_STRICT_FLOATS=1 compares doubles BIT-EXACTLY (no 9dp
# normalization) — the driver-faithful audit mode: the driver hashes
# raw values, so a double differing in the 12th digit would pass the
# default gate but fail the driver.
import os  # noqa: E402

STRICT_FLOATS = os.environ.get("ORACLE_STRICT_FLOATS") == "1"

# ORACLE_TIMINGS=1 appends per-query wall clock (t=1.23s) to every
# verdict line — consumed by tools/fuzz_gate.py's per-family wall
# envelopes. Off by default so committed ORACLE_r{N}.txt artifacts
# stay byte-comparable across runs.
SHOW_TIMINGS = os.environ.get("ORACLE_TIMINGS") == "1"


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v if STRICT_FLOATS else round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    # None-safe total order (rollup subtotals contain NULL keys)
    out.sort(key=lambda row: [(v is None, repr(v)) for v in row])
    return out


def arrow_tag(t: pa.DataType) -> str:
    """Normalize a pyarrow type into the same tag space as Spark
    ``DataType.simpleString()`` so the two schemas can be compared."""
    if pa.types.is_int64(t) or pa.types.is_uint64(t):
        return "bigint"
    if pa.types.is_int32(t) or pa.types.is_uint32(t):
        return "int"
    if pa.types.is_int16(t) or pa.types.is_uint16(t):
        return "smallint"
    if pa.types.is_int8(t) or pa.types.is_uint8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # Spark session tz is UTC in all gates; naive-vs-UTC is the one
        # sanctioned equivalence (the driver strips tzinfo the same way
        # normalize() above does).
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{arrow_tag(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_tag(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{arrow_tag(t.key_type)},{arrow_tag(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_tag(dt) -> str:
    s = dt.simpleString()
    # timestamp_ltz / timestamp_ntz both land in the 'timestamp' bucket
    # (matches arrow_tag's naive-vs-UTC equivalence).
    if s.startswith("timestamp"):
        return "timestamp"
    return s


def type_mismatches(sdf_schema, arrow_schema) -> list[str]:
    spark_types = {f.name: spark_tag(f.dataType) for f in sdf_schema.fields}
    out = []
    for f in arrow_schema:
        st = spark_types.get(f.name)
        if st is None:
            continue  # column-name diff reported separately
        ot = arrow_tag(f.type)
        if st != ot and ot != "null":  # all-NULL oracle col: value check decides
            out.append(f"{f.name}: spark={st} oracle={ot}")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dataingestionframework_spark.session import get_spark

    spark = get_spark("oracle-check")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # pinned header: lets an auditor (and tests/test_artifacts.py) see
    # at a glance whether a committed artifact lags the registry
    print(f"# registry={len(queries)} queries oracles={len(oracles)} "
          f"sf_dir={sf_dir} typegate=arrow")

    import time

    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t_q = time.perf_counter()

        def _t() -> str:
            return f" t={time.perf_counter() - t_q:.2f}s" if SHOW_TIMINGS else ""

        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}{_t()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only ({len(srows)} rows){_t()}")
            n_weak += 1
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            if hasattr(tbl, "read_all"):  # duckdb may return a RecordBatchReader
                tbl = tbl.read_all()
            dcols = tbl.column_names
            drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}{_t()}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        tmis = type_mismatches(sschema, tbl.schema)
        if tmis:
            problems.append(f"types differ: {'; '.join(tmis)}")
        if not problems:
            sm = rows_multiset(scols, srows)
            dm = rows_multiset(dcols, drows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}{_t()}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows){_t()}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
