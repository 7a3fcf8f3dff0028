"""Delta-native parity smoke — run on a REAL cluster with delta-spark.

This container has no delta jars (no network; see DEPLOY.md), so
``catalog/delta.py`` is import-gated and its pytest coverage skips.
This script is the CI-style check a user runs once on a networked
cluster to close that gap: it executes the SAME operation script
against ``TableCatalog(backend="delta")`` and the parquet
copy-on-write emulation (``backend="parquet"``) and asserts the table
image is identical after EVERY step — create(+identity), append,
all five MERGE modes, UPDATE, DELETE, schema evolution, truncate,
and version time travel.

Usage (any Spark 4.x cluster or local session with delta-spark):

    spark-submit --packages io.delta:delta-spark_2.13:4.0.0 \
        tools/delta_smoke.py [work_dir]

or simply ``python tools/delta_smoke.py`` where ``pip install
delta-spark`` has run. Exits 0 on full parity, 1 on any divergence,
2 when delta-spark is absent.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F, types as T  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("current", T.IntegerType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _image(t):
    """Order-insensitive table image (column-name-sorted tuples)."""
    df = t.read()
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


class Parity:
    def __init__(self, spark, work_dir):
        from dataingestionframework_spark.catalog.table import TableCatalog

        self.p = TableCatalog(spark, f"{work_dir}/parquet").table("s.t")
        self.d = TableCatalog(
            spark, f"{work_dir}/delta", backend="delta"
        ).table("s.t")
        self.failures: list[str] = []
        self.steps = 0

    def step(self, label, fn):
        """Apply fn to both backends, then diff the full table image."""
        fn(self.p)
        fn(self.d)
        self.steps += 1
        pi, di = _image(self.p), _image(self.d)
        if pi != di:
            self.failures.append(
                f"{label}: parquet={pi[:5]}... delta={di[:5]}..."
            )
            print(f"FAIL  {label}")
        else:
            print(f"PASS  {label} ({len(pi)} rows)")


def main():
    try:
        from delta import DeltaTable  # noqa: F401
    except ImportError:
        print(
            "delta-spark is not installed — run this on a networked "
            "cluster (see DEPLOY.md 'Delta backend')."
        )
        sys.exit(2)

    from dataingestionframework_spark.session import get_spark

    work_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_spark("delta-smoke")
    _ = SparkSession  # silence linters; get_spark owns the session
    par = Parity(spark, work_dir)

    par.step("create", lambda t: t.create(SCHEMA))
    par.step(
        "append",
        lambda t: t.append(_df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)])),
    )
    par.step(
        "merge:update-all+insert-all",
        lambda t: t.merge(
            _df(spark, [(2, "b2", 1), (4, "d", 1)]),
            on=["id"],
            when_matched_update="all",
            when_not_matched_insert="all",
        ),
    )
    par.step(
        "merge:matched-delete",
        lambda t: t.merge(
            _df(spark, [(3, "c", 1)]), on=["id"], when_matched_delete=True
        ),
    )
    par.step(
        "merge:not-matched-by-source-update (soft delete)",
        lambda t: t.merge(
            _df(spark, [(1, "a", 1), (2, "b2", 1)]),
            on=["id"],
            when_not_matched_by_source_update={"current": F.lit(0)},
        ),
    )
    par.step(
        "update", lambda t: t.update(F.col("id") == 1, {"name": F.lit("a9")})
    )
    par.step("delete", lambda t: t.delete(F.col("id") == 4))
    par.step(
        "evolve+append (new column)",
        lambda t: t.append(
            spark.createDataFrame(
                [(7, "g", 1, "x")],
                T.StructType(
                    SCHEMA.fields
                    + [T.StructField("extra", T.StringType(), True)]
                ),
            ),
            merge_schema=True,
        ),
    )
    par.step("truncate", lambda t: t.truncate())

    # time travel: both histories must replay to the same images.
    par.step("tt:append-1", lambda t: t.append(_df(spark, [(1, "a", 1)])))
    par.step("tt:append-2", lambda t: t.append(_df(spark, [(2, "b", 1)])))
    n_p = len(par.p.history())
    n_d = len(par.d.history())
    for back in (1, 2):
        vi_p = sorted(
            tuple(r)
            for r in par.p.read(version=n_p - back).select("id").collect()
        )
        vi_d = sorted(
            tuple(r)
            for r in par.d.read(version=n_d - back).select("id").collect()
        )
        if vi_p != vi_d:
            par.failures.append(f"time-travel -{back}: {vi_p} != {vi_d}")
            print(f"FAIL  time-travel -{back}")
        else:
            print(f"PASS  time-travel -{back}")

    # identity column (delta-only surface: BIGINT GENERATED ALWAYS AS
    # IDENTITY, reference schema/schemas/3_column_configuration.py:201;
    # the parquet backend's id story is collision-free log ids in
    # catalog/system.py) — ids must come back unique and non-null.
    from dataingestionframework_spark.catalog.table import TableCatalog

    t = TableCatalog(spark, f"{work_dir}/id-d", backend="delta").table(
        "s.ident"
    )
    t.create(
        T.StructType(
            [
                T.StructField("rid", T.LongType(), False),
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.StringType(), True),
            ]
        ),
        identity_col="rid",
    )
    spark.sql(
        f"INSERT INTO delta.`{t.root}` (k, v) VALUES (1, 'x'), (2, 'y')"
    )
    spark.sql(f"INSERT INTO delta.`{t.root}` (k, v) VALUES (3, 'z')")
    rids = [r["rid"] for r in t.read().collect()]
    if len(set(rids)) != 3 or any(r is None for r in rids):
        par.failures.append(f"identity[delta]: rids={rids}")
        print("FAIL  identity[delta]")
    else:
        print("PASS  identity[delta]")

    # -- CHECK constraints (round-7/8 catalog surface) -----------------
    # same declaration point on both backends: a violating append must
    # raise on BOTH; a valid one must land on BOTH; after DROP the
    # previously-violating row must land on BOTH.
    from dataingestionframework_spark.errors import ConstraintViolationError

    extra_checks = 0

    def _rejects(t, df) -> bool:
        try:
            t.append(df, merge_schema=False)
            return False
        except Exception as e:  # noqa: BLE001
            # parquet backend: ConstraintViolationError; Delta: its own
            # DeltaInvariantViolationException — accept either spelling
            return isinstance(e, ConstraintViolationError) or (
                "onstraint" in type(e).__name__ + str(e)
                or "nvariant" in type(e).__name__ + str(e)
            )

    par.step(
        "constraint:add (current >= 0)",
        lambda t: t.add_check_constraint("cur_nonneg", "current >= 0"),
    )
    bad = _df(spark, [(99, "bad", -5)])
    ok_p, ok_d = _rejects(par.p, bad), _rejects(par.d, bad)
    extra_checks += 1
    if ok_p and ok_d and _image(par.p) == _image(par.d):
        print("PASS  constraint:violating-append-rejected[both]")
    else:
        par.failures.append(
            f"constraint rejection parity: parquet={ok_p} delta={ok_d}"
        )
        print("FAIL  constraint:violating-append-rejected")
    par.step(
        "constraint:valid-append",
        lambda t: t.append(_df(spark, [(5, "e", 2)]), merge_schema=False),
    )
    par.step(
        "constraint:drop",
        lambda t: t.drop_check_constraint("cur_nonneg"),
    )
    par.step(
        "constraint:append-after-drop",
        lambda t: t.append(_df(spark, [(99, "bad", -5)]), merge_schema=False),
    )

    # -- tags (named snapshots; round-7/8 surface) ----------------------
    # tag the current version on both, append, then read(tag=) must
    # reproduce the pre-append image on both backends.
    pre_p, pre_d = _image(par.p), _image(par.d)
    par.p.tag("smoke-tag")
    par.d.tag("smoke-tag")
    par.step(
        "tag:append-after-tag",
        lambda t: t.append(_df(spark, [(41, "zz", 3)]), merge_schema=False),
    )
    extra_checks += 1
    tp = sorted(
        tuple(r[c] for c in sorted(par.p.read(tag="smoke-tag").columns))
        for r in par.p.read(tag="smoke-tag").collect()
    )
    td = sorted(
        tuple(r[c] for c in sorted(par.d.read(tag="smoke-tag").columns))
        for r in par.d.read(tag="smoke-tag").collect()
    )
    if tp == pre_p and td == pre_d:
        print("PASS  tag:read-at-tag[both]")
    else:
        par.failures.append("tag read mismatch: read(tag) != pre-tag image")
        print("FAIL  tag:read-at-tag")

    # -- generated columns (round-7/8 surface) --------------------------
    # declaration points differ by design (parquet: post-hoc metadata;
    # delta: CREATE-time GENERATED ALWAYS AS) but the append contract
    # must match: omitted column computed, wrong value rejected.
    from dataingestionframework_spark.catalog.table import TableCatalog as TC

    gschema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
            T.StructField("v2", T.LongType(), True),
        ]
    )
    gp = TC(spark, f"{work_dir}/gen-p").table("s.gen")
    gp.create(T.StructType(gschema.fields[:2]))
    gp.set_generated_column("v2", "v * 2")
    gd = TC(spark, f"{work_dir}/gen-d", backend="delta").table("s.gen")
    gd.create(gschema, generated={"v2": "v * 2"})
    for t in (gp, gd):
        t.append(
            spark.createDataFrame([(1, 10)], "k long, v long"),
            merge_schema=True,
        )
    extra_checks += 1
    gi_p = sorted(tuple(r) for r in gp.read().select("k", "v", "v2").collect())
    gi_d = sorted(tuple(r) for r in gd.read().select("k", "v", "v2").collect())
    if gi_p == gi_d == [(1, 10, 20)]:
        print("PASS  generated:computed-on-append[both]")
    else:
        par.failures.append(f"generated compute: parquet={gi_p} delta={gi_d}")
        print("FAIL  generated:computed-on-append")
    wrong = spark.createDataFrame([(2, 10, 99)], gschema)
    extra_checks += 1
    if _rejects(gp, wrong) and _rejects(gd, wrong):
        print("PASS  generated:wrong-value-rejected[both]")
    else:
        par.failures.append("generated wrong-value accepted by a backend")
        print("FAIL  generated:wrong-value-rejected")

    # -- streaming rollup exactly-once via table txns (round 10) --------
    # the epoch rides the MERGE commit (parquet: atomically in the
    # pointer; delta: graft.txn.* TBLPROPERTIES — see delta.py:merge
    # for the atomicity caveat). Drive the REAL streaming maintainer
    # against both backends from the same source files, then prove the
    # redelivery guard and that truncate voids the bookkeeping.
    import datetime as dtm

    from dataingestionframework_spark.streaming.rollup import (
        merge_rollup,
        rollup_batch,
        streaming_rollup,
    )

    ev = spark.createDataFrame(
        [
            (i, dtm.datetime(2024, 1, 10 + i % 3, i % 24), f"t{i % 2}",
             float(i))
            for i in range(120)
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    src = f"{work_dir}/ev-src"
    ev.repartition(3).write.parquet(src)
    sschema = spark.read.parquet(src).schema
    rp = TC(spark, f"{work_dir}/ru-p").table("s.ru")
    rd = TC(spark, f"{work_dir}/ru-d", backend="delta").table("s.ru")
    for t, ck in ((rp, "ck-p"), (rd, "ck-d")):
        stream = (
            spark.readStream.schema(sschema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        streaming_rollup(stream, t, checkpoint=f"{work_dir}/{ck}")
    extra_checks += 1
    ri_p, ri_d = _image(rp), _image(rd)
    ok_txn = (
        rp.txn_version("streaming_rollup") >= 2
        and rd.txn_version("streaming_rollup") >= 2
    )
    if ri_p == ri_d and ok_txn:
        print(f"PASS  rollup:drain-parity+txn[both] ({len(ri_p)} rows)")
    else:
        par.failures.append(
            f"rollup drain: images equal={ri_p == ri_d} txns="
            f"({rp.txn_version('streaming_rollup')}, "
            f"{rd.txn_version('streaming_rollup')})"
        )
        print("FAIL  rollup:drain-parity+txn")
    # at-least-once redelivery of epoch 0 (handle-level mirror): the
    # txn guard must refuse the merge on BOTH backends
    extra_checks += 1
    for t in (rp, rd):
        if not (0 <= t.txn_version("streaming_rollup")):
            merge_rollup(t, rollup_batch(ev), txn=("streaming_rollup", 0))
    if _image(rp) == ri_p and _image(rd) == ri_d:
        print("PASS  rollup:redelivery-noop[both]")
    else:
        par.failures.append("rollup redelivery moved a table")
        print("FAIL  rollup:redelivery-noop")
    # truncate voids the bookkeeping with the data on BOTH backends
    extra_checks += 1
    rp.truncate()
    rd.truncate()
    if (
        rp.txn_version("streaming_rollup") == -1
        and rd.txn_version("streaming_rollup") == -1
    ):
        print("PASS  rollup:truncate-clears-txn[both]")
    else:
        par.failures.append(
            f"truncate left txns: parquet={rp.txn_version('streaming_rollup')} "
            f"delta={rd.txn_version('streaming_rollup')}"
        )
        print("FAIL  rollup:truncate-clears-txn")

    print(
        f"\n{par.steps + 2 + 1 + extra_checks} checks, "
        f"{len(par.failures)} failures"
        + ("" if not par.failures else ":\n  " + "\n  ".join(par.failures))
    )
    sys.exit(1 if par.failures else 0)


if __name__ == "__main__":
    main()
