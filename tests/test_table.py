"""ManagedTable: append/overwrite/merge/update/delete semantics."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("current", T.IntegerType(), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_create_append_read(spark, catalog):
    t = catalog.table("s.t1")
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    assert t.count() == 2
    t.append(_df(spark, [(3, "c", 1)]))
    assert t.count() == 3


def test_overwrite_and_truncate(spark, catalog):
    t = catalog.table("s.t2")
    t.append(_df(spark, [(1, "a", 1)]))
    t.overwrite(_df(spark, [(9, "z", 1), (10, "y", 1)]))
    assert t.count() == 2
    t.truncate()
    assert t.count() == 0


def test_update_and_delete(spark, catalog):
    t = catalog.table("s.t3")
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)]))
    t.update(F.col("id") == 2, {"name": F.lit("B")})
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    t.delete(F.col("id") == 1)
    assert sorted(r.id for r in t.read().collect()) == [2, 3]


def test_merge_upsert_and_soft_delete(spark, catalog):
    """The reference's header-config merge shape
    (modules/insert_config.py:202-270): update matched, insert new,
    soft-delete rows missing from source."""
    t = catalog.table("s.t4")
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    src = _df(spark, [(2, "b2", 1), (3, "c", 1)])
    t.merge(
        src,
        on=["id"],
        when_matched_update="all",
        when_not_matched_insert=True,
        when_not_matched_by_source_update={"current": F.lit(0)},
    )
    got = {r.id: (r.name, r.current) for r in t.read().collect()}
    assert got == {1: ("a", 0), 2: ("b2", 1), 3: ("c", 1)}


def test_merge_insert_only(spark, catalog):
    t = catalog.table("s.t5")
    t.append(_df(spark, [(1, "a", 1)]))
    t.merge(_df(spark, [(1, "X", 9), (2, "b", 1)]), on=["id"],
            when_matched_update=None, when_not_matched_insert=True)
    got = {r.id: r.name for r in t.read().collect()}
    assert got == {1: "a", 2: "b"}


def test_schema_evolution_append(spark, catalog):
    t = catalog.table("s.t6")
    t.append(_df(spark, [(1, "a", 1)]))
    wider = spark.createDataFrame(
        [(2, "b", 1, "extra")],
        T.StructType(list(SCHEMA.fields) + [T.StructField("note", T.StringType(), True)]),
    )
    t.append(wider, merge_schema=True)
    out = t.read()
    assert "note" in out.columns
    got = {r.id: r.note for r in out.collect()}
    assert got == {1: None, 2: "extra"}


def test_atomic_swap_versions_vacuum(spark, catalog):
    t = catalog.table("s.t7")
    t.append(_df(spark, [(1, "a", 1)]))
    t.overwrite(_df(spark, [(2, "b", 1)]))
    t.overwrite(_df(spark, [(3, "c", 1)]))
    assert t.count() == 1
    n = t.vacuum()
    assert n >= 2
    assert [r.id for r in t.read().collect()] == [3]


def test_partitioned_table_prunes(spark, catalog):
    """Date-style partitioning: layout + partition pruning in the plan."""
    import os

    t = catalog.table("s.part")
    df = spark.range(0, 1000).selectExpr("id", "CAST(id % 7 AS INT) AS bucket")
    t.create(df.schema, partition_cols=["bucket"])
    t.append(df)
    t.append(spark.range(1000, 1200).selectExpr("id", "CAST(id % 7 AS INT) AS bucket"))
    assert t.count() == 1200
    # physical layout: bucket=N directories
    subdirs = {d for d in os.listdir(t.data_dir()) if d.startswith("bucket=")}
    assert len(subdirs) == 7
    # partition pruning reaches the scan
    plan = t.read().filter(F.col("bucket") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan
    expected = sum(1 for i in range(1200) if i % 7 == 3)
    assert t.read().filter(F.col("bucket") == 3).count() == expected


def test_arrow_fast_path(spark, catalog):
    t = catalog.table("s.t8")
    t.create(SCHEMA)
    t.append_rows([{"id": 1, "name": "a", "current": 1}])
    t.append_rows([{"id": 2, "name": "b", "current": 1}])
    assert t.count() == 2
    t.update_rows("id", 2, {"name": "B2", "current": 0})
    got = {r.id: (r.name, r.current) for r in t.read().collect()}
    assert got == {1: ("a", 1), 2: ("B2", 0)}


# -- Delta backend adapter (import-gated; full CRUD runs only where
#    delta-spark is installed — this container has the parquet backend) --


def test_delta_backend_gating(spark, tmp_root):
    from dataingestionframework_spark.catalog.delta import HAS_DELTA, DeltaManagedTable
    from dataingestionframework_spark.catalog.table import TableCatalog

    with pytest.raises(ValueError):
        TableCatalog(spark, tmp_root, backend="bogus")
    if HAS_DELTA:
        pytest.skip("delta present; covered by test_delta_backend_crud")
    with pytest.raises(ImportError):
        DeltaManagedTable(spark, tmp_root)
    with pytest.raises(ImportError):
        TableCatalog(spark, tmp_root, backend="delta").table("s.t")


def test_delta_backend_crud(spark, tmp_root):
    from dataingestionframework_spark.catalog.delta import HAS_DELTA
    from dataingestionframework_spark.catalog.table import TableCatalog

    if not HAS_DELTA:
        pytest.skip("delta-spark not installed in this container")
    cat = TableCatalog(spark, tmp_root, backend="delta")
    t = cat.table("s.dt")
    t.create(SCHEMA)
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    t.merge(
        _df(spark, [(2, "b2", 1), (3, "c", 1)]),
        on=["id"],
        when_matched_update="all",
        when_not_matched_by_source_update={"current": F.lit(0)},
    )
    rows = {r.id: (r.name, r.current) for r in t.read().collect()}
    assert rows == {1: ("a", 0), 2: ("b2", 1), 3: ("c", 1)}
    t.update(F.col("id") == 3, {"name": F.lit("c3")})
    t.delete(F.col("id") == 1)
    assert {r.name for r in t.read().collect()} == {"b2", "c3"}


def test_time_travel_history_and_read_version(spark, catalog):
    """Commit-log time travel: every op is a version; read(version=n)
    reconstructs the exact table image at that commit (Delta
    versionAsOf / DESCRIBE HISTORY analogue on plain parquet)."""
    t = catalog.table("s.tt")
    t.create(SCHEMA)                                      # v0
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))      # v1
    t.append(_df(spark, [(3, "c", 1)]))                   # v2
    t.delete(F.col("id") == 2)                            # v3
    t.overwrite(_df(spark, [(9, "z", 0)]))                # v4

    hist = t.history()
    assert [h["op"] for h in hist] == ["create", "append", "append", "delete", "overwrite"]
    assert [h["version"] for h in hist] == [0, 1, 2, 3, 4]

    def ids(v):
        return sorted(r.id for r in t.read(version=v).collect())

    assert ids(0) == []
    assert ids(1) == [1, 2]
    assert ids(2) == [1, 2, 3]
    assert ids(3) == [1, 3]
    assert ids(4) == [9]
    assert sorted(r.id for r in t.read().collect()) == [9]  # latest = current

    # Appends share a version dir: v1's manifest must NOT see v2's file.
    assert hist[1]["n_files"] < hist[2]["n_files"]


def test_time_travel_after_vacuum_raises(spark, catalog):
    from dataingestionframework_spark.errors import TableNotFoundError

    t = catalog.table("s.ttv")
    t.append(_df(spark, [(1, "a", 1)]))
    t.overwrite(_df(spark, [(2, "b", 1)]))
    t.vacuum()
    with pytest.raises(TableNotFoundError):
        t.read(version=0).collect()   # pre-vacuum image is gone
    assert [r.id for r in t.read().collect()] == [2]


def test_read_changes_append_fast_path_and_row_diff(spark, catalog):
    """CDC between versions: append-only ranges resolve at FILE level
    (only the new files are read); ranges containing a rewrite fall
    back to a row-level bag diff with delete images."""
    t = catalog.table("s.cdc")
    t.create(SCHEMA)                                      # v0
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)]))      # v1
    t.append(_df(spark, [(3, "c", 1)]))                   # v2
    ch = t.read_changes(1, 2)
    assert {(r.id, r._change_type) for r in ch.collect()} == {(3, "insert")}
    # file-level path: the scan must touch only v2's new files
    files_read = [
        f for f in ch.inputFiles()
    ]
    assert len(files_read) < len(t.data_files())

    t.delete(F.col("id") == 1)                            # v3 (rewrite)
    ch2 = {(r.id, r._change_type) for r in t.read_changes(2).collect()}
    assert ch2 == {(1, "delete")}
    ch_all = {(r.id, r._change_type) for r in t.read_changes(0).collect()}
    assert ch_all == {(2, "insert"), (3, "insert")}


def test_incremental_agg_refresh_matches_recompute(spark, catalog):
    """CDC-driven continuous aggregate: applying only the changed rows
    must land exactly where a full recompute does — across appends AND
    a rewrite (delete images subtract)."""
    from dataingestionframework_spark.ingest.maintenance import incremental_agg_refresh

    src = catalog.table("s.facts")
    schema = T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    src.create(schema)
    df = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    src.append(df([("a", 1), ("a", 2), ("b", 10)]))

    agg = catalog.table("s.facts_agg")
    agg.create(T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.LongType(), True),
    ]))
    v = incremental_agg_refresh(src, agg, ["k"], "v", since_version=0)

    def snapshot():
        return {(r.k): (r.n, r.total) for r in agg.read().collect() if r.n}

    assert snapshot() == {"a": (2, 3), "b": (1, 10)}

    src.append(df([("b", 5), ("c", 7)]))          # append-only: file-level CDC
    v = incremental_agg_refresh(src, agg, ["k"], "v", since_version=v)
    assert snapshot() == {"a": (2, 3), "b": (2, 15), "c": (1, 7)}

    src.delete(F.col("v") == 2)                   # rewrite: row-diff CDC
    v = incremental_agg_refresh(src, agg, ["k"], "v", since_version=v)
    assert snapshot() == {"a": (1, 1), "b": (2, 15), "c": (1, 7)}

    # steady state: no new version → no-op, version unchanged
    assert incremental_agg_refresh(src, agg, ["k"], "v", since_version=v) == v

    # ground truth: full recompute of the source agrees
    truth = {
        r.k: (r.n, r.total)
        for r in src.read().groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("total")
        ).collect()
    }
    assert snapshot() == truth


def test_scd2_two_applies_full_interval_history(spark, catalog):
    """SCD2 across two change waves: intervals chain (v1 closes where
    v2 opens), exactly one current row per live key, history immutable."""
    from dataingestionframework_spark.catalog.scd import scd2_apply

    dim = catalog.table("s.scd")
    seed = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, attr string"
    ).select(
        "k", "attr",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    dim.append(seed)

    s1 = spark.createDataFrame([(1, "a2"), (2, "b"), (3, "c")], "k long, attr string")
    scd2_apply(dim, s1, ["k"], ["attr"], "2024-02-01")
    s2 = spark.createDataFrame([(1, "a3"), (2, "b9"), (3, "c")], "k long, attr string")
    scd2_apply(dim, s2, ["k"], ["attr"], "2024-03-01")

    rows = {(r.k, r.attr): (str(r.valid_from), str(r.valid_to), r.is_current)
            for r in dim.read().collect()}
    assert rows == {
        (1, "a"):  ("2024-01-01", "2024-02-01", False),
        (1, "a2"): ("2024-02-01", "2024-03-01", False),
        (1, "a3"): ("2024-03-01", "None", True),
        (2, "b"):  ("2024-01-01", "2024-03-01", False),
        (2, "b9"): ("2024-03-01", "None", True),
        (3, "c"):  ("2024-02-01", "None", True),
    }
    # invariant: exactly one current row per key
    cur = dim.read().filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_replace_where_swaps_only_matching_rows(spark, tmp_root):
    import os

    from dataingestionframework_spark.catalog.table import ManagedTable
    from pyspark.sql import functions as F

    t = ManagedTable(spark, os.path.join(tmp_root, "rw"))
    t.append(
        spark.createDataFrame(
            [(d, i, 1.0) for d in ("a", "b") for i in range(5)],
            "dt string, id int, v double",
        )
    )
    t.replace_where(
        spark.createDataFrame([("b", 99, 2.0)], "dt string, id int, v double"),
        F.col("dt") == "b",
    )
    rows = {(r.dt, r.id) for r in t.read().collect()}
    assert rows == {("a", i) for i in range(5)} | {("b", 99)}
    assert t.history()[-1]["op"] == "replace_where"
    # rows that violate the predicate are rejected, table untouched
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.replace_where(
            spark.createDataFrame([("a", 1, 0.0)], "dt string, id int, v double"),
            F.col("dt") == "b",
        )
    assert {(r.dt, r.id) for r in t.read().collect()} == rows


def test_dynamic_partition_overwrite_native(spark, tmp_root):
    """spark.sql.sources.partitionOverwriteMode=dynamic: an overwrite
    rewrites ONLY the partitions present in the incoming frame — the
    idempotent daily-reload pattern on plain partitioned parquet."""
    import os

    tgt = os.path.join(tmp_root, "dpo")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "dt string, v int"
    ).write.partitionBy("dt").parquet(tgt)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame([("b", 99)], "dt string, v int").write.mode(
            "overwrite"
        ).partitionBy("dt").parquet(tgt)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {(r.dt, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {("a", 1), ("a", 2), ("b", 99)}


def test_merge_schema_evolution_and_metrics(spark, tmp_root):
    """MERGE with schema evolution (Delta withSchemaEvolution analogue):
    a source column unknown to the target is admitted, historic rows
    NULL-backfill; Delta-style operation metrics come back on request."""
    import os

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, os.path.join(tmp_root, "mse"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    src = spark.createDataFrame(
        [(2, "B", 9.5), (3, "C", 1.5)], "id long, v string, score double"
    )
    metrics = t.merge(
        src,
        on=["id"],
        when_matched_update="all",
        merge_schema=True,
        return_metrics=True,
    )
    assert metrics == {"n_matched": 1, "n_inserted": 1, "n_not_matched_by_source": 1}
    got = {r.id: (r.v, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("B", 9.5), 3: ("C", 1.5)}
    assert [f.name for f in t.schema().fields] == ["id", "v", "score"]


def test_check_constraints_enforced_on_writes(spark, tmp_root):
    """Delta ADD CONSTRAINT parity: existing data validated at ADD;
    appends, UPDATEs and MERGEs that would violate are rejected whole
    (no partial write); dropping the constraint re-opens the gate."""
    import os

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.errors import ConstraintViolationError
    from pyspark.sql import functions as F

    t = ManagedTable(spark, os.path.join(tmp_root, "ck"))
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"))
    t.add_check_constraint("v_positive", "v > 0")
    assert t.constraints() == {"v_positive": "v > 0"}
    # adding a constraint existing data violates fails
    with _pytest.raises(ConstraintViolationError):
        t.add_check_constraint("v_small", "v < 15")
    # bad append rejected atomically
    with _pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(3, -1.0)], "id long, v double"))
    assert t.count() == 2
    # bad UPDATE rejected too (funnels through overwrite)
    with _pytest.raises(ConstraintViolationError):
        t.update(F.col("id") == 1, {"v": F.lit(-5.0)})
    assert {r.v for r in t.read().collect()} == {10.0, 20.0}
    # good writes pass; dropping the constraint admits the bad row
    t.append(spark.createDataFrame([(3, 5.0)], "id long, v double"))
    t.drop_check_constraint("v_positive")
    t.append(spark.createDataFrame([(4, -1.0)], "id long, v double"))
    assert t.count() == 4


def test_tags_pin_versions_against_vacuum(spark, tmp_root):
    """Iceberg-tag analogue: a named snapshot stays readable after
    VACUUM (its version dir is pinned); untagged old versions are
    reclaimed; read(tag=) resolves by name."""
    import os

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.errors import TableNotFoundError
    from pyspark.sql import functions as F

    t = ManagedTable(spark, os.path.join(tmp_root, "tags"))
    t.append(spark.createDataFrame([(i,) for i in range(10)], "id long"))
    tagged_v = t.tag("corpus-2024-08")       # latest commit
    t.delete(F.col("id") >= 5)               # new version
    t.delete(F.col("id") >= 3)               # another
    assert t.read(tag="corpus-2024-08").count() == 10
    t.vacuum()
    # tagged image survives vacuum; current image intact
    assert t.read(tag="corpus-2024-08").count() == 10
    assert t.count() == 3
    assert t.tags() == {"corpus-2024-08": tagged_v}
    with _pytest.raises(TableNotFoundError):
        t.read(tag="nope")
    t.untag("corpus-2024-08")
    t.vacuum()
    with _pytest.raises(TableNotFoundError):
        t.read(tag="corpus-2024-08")


def test_generated_columns_computed_and_validated(spark, tmp_root):
    """GENERATED ALWAYS AS parity: omitted generated columns are
    computed at append; supplied values disagreeing with the generator
    are rejected; agreeing values pass."""
    import os

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.errors import ConstraintViolationError

    t = ManagedTable(spark, os.path.join(tmp_root, "gen"))
    t.append(
        spark.createDataFrame(
            [(1, "2024-03-05 10:00:00")], "id long, ts string"
        ).selectExpr("id", "cast(ts as timestamp) AS ts")
    )
    t.set_generated_column("dt", "to_date(ts)")
    t.append(
        spark.createDataFrame(
            [(2, "2024-04-01 09:00:00")], "id long, ts string"
        ).selectExpr("id", "cast(ts as timestamp) AS ts")
    )
    got = {r.id: str(r.dt) for r in t.read().collect() if r.dt is not None}
    assert got[2] == "2024-04-01"  # computed server-side
    with _pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame(
                [(3, "2024-05-01 09:00:00", "1999-01-01")],
                "id long, ts string, dt string",
            ).selectExpr("id", "cast(ts as timestamp) AS ts", "cast(dt as date) AS dt")
        )
    # a caller supplying the CORRECT value is accepted
    t.append(
        spark.createDataFrame(
            [(4, "2024-06-02 09:00:00", "2024-06-02")],
            "id long, ts string, dt string",
        ).selectExpr("id", "cast(ts as timestamp) AS ts", "cast(dt as date) AS dt")
    )
    assert t.count() == 3  # ids 1,2,4 (id 3 was rejected atomically)


def test_concurrent_write_conflict_detected(spark, tmp_root):
    """Optimistic concurrency: a copy-on-write commit whose base version
    moved underneath it fails with ConcurrentWriteError instead of
    silently dropping the other writer's commit; retry then succeeds."""
    import os

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.errors import ConcurrentWriteError
    from pyspark.sql import functions as F

    t = ManagedTable(spark, os.path.join(tmp_root, "occ"))
    t.append(spark.createDataFrame([(i,) for i in range(10)], "id long"))
    base = t._current_version()
    # writer B lands a commit while writer A's image is in flight
    t2 = ManagedTable(spark, t.root)
    t2.delete(F.col("id") == 9)
    with _pytest.raises(ConcurrentWriteError):
        t.overwrite(
            t.read(version=0).filter(F.col("id") < 5),
            _op="delete",
            expect_version=base,
        )
    # B's commit survived (nothing was clobbered); A retries and wins
    assert t.count() == 9
    t.delete(F.col("id") >= 5)
    assert t.count() == 5


def test_read_stream_incremental_appends(spark, tmp_root):
    """Managed table as a streaming source: a checkpointed AvailableNow
    drain picks up exactly the rows appended since the last drain."""
    import os

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, os.path.join(tmp_root, "rs"))
    t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    ckpt = os.path.join(tmp_root, "rs_ckpt")
    out = os.path.join(tmp_root, "rs_out")

    def drain():
        q = (
            t.read_stream()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r.id for r in spark.read.schema("id long").parquet(out).collect()
        )

    assert drain() == [1, 2]
    t.append(spark.createDataFrame([(3,)], "id long"))
    assert drain() == [1, 2, 3]  # only id=3 processed in the second drain


def test_replace_where_null_predicate_is_nullsafe(spark, tmp_root):
    """Delta replaceWhere semantics under NULLs: existing rows where the
    predicate evaluates to NULL are RETAINED (only predicate-TRUE rows
    are replaced), and incoming rows with a NULL-valued predicate count
    as violations — a bare filter(~cond) gets both directions wrong."""
    import os

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, os.path.join(tmp_root, "rwnull"))
    t.append(
        spark.createDataFrame(
            [("a", 1), ("b", 2), (None, 3)], "dt string, id int"
        )
    )
    t.replace_where(
        spark.createDataFrame([("b", 99)], "dt string, id int"),
        F.col("dt") == "b",
    )
    # NULL-dt row survives the swap
    rows = {(r.dt, r.id) for r in t.read().collect()}
    assert rows == {("a", 1), (None, 3), ("b", 99)}
    # a NULL-dt incoming row does not satisfy dt=='b' -> rejected
    with _pytest.raises(ValueError):
        t.replace_where(
            spark.createDataFrame([(None, 7)], "dt string, id int"),
            F.col("dt") == "b",
        )
    assert {(r.dt, r.id) for r in t.read().collect()} == rows


def test_merge_conflict_detected(spark, tmp_root):
    """merge() captures its base version before resolving the data path,
    so a commit landing in that window raises ConcurrentWriteError
    (same protection as delete/update/replace_where)."""
    import os
    from unittest import mock

    import pytest as _pytest

    from dataingestionframework_spark.catalog.table import ManagedTable
    from dataingestionframework_spark.errors import ConcurrentWriteError

    t = ManagedTable(spark, os.path.join(tmp_root, "mocc"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    src = spark.createDataFrame([(2, "B2"), (3, "C")], "id long, v string")

    real_read = t.read

    def read_then_concurrent_commit(*a, **kw):
        df = real_read(*a, **kw)
        ManagedTable(spark, t.root).delete(F.col("id") == 1)  # racer lands
        return df

    with mock.patch.object(t, "read", side_effect=read_then_concurrent_commit):
        with _pytest.raises(ConcurrentWriteError):
            t.merge(src, on=["id"], when_matched_update="all")
    # racer's commit survived; retry then succeeds
    assert {r.id for r in t.read().collect()} == {2}
    t.merge(src, on=["id"], when_matched_update="all")
    assert {(r.id, r.v) for r in t.read().collect()} == {(2, "B2"), (3, "C")}


def test_merge_metrics_match_delta_semantics(spark, tmp_root):
    """n_matched mirrors Delta numTargetRowsUpdated: 0 for an
    insert-only merge even when join matches exist."""
    import os

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, os.path.join(tmp_root, "mmetr"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    src = spark.createDataFrame([(2, "B2"), (3, "C")], "id long, v string")
    metrics = t.merge(
        src,
        on=["id"],
        when_matched_update=None,
        when_not_matched_insert=True,
        return_metrics=True,
    )
    assert metrics == {"n_matched": 0, "n_inserted": 1, "n_not_matched_by_source": 1}
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "b", 3: "C"}  # matched row NOT updated


def test_restore_rolls_forward_to_historical_content(spark, tmp_root):
    import os

    from pyspark.sql import functions as F

    from dataingestionframework_spark.catalog.table import ManagedTable

    t = ManagedTable(spark, os.path.join(tmp_root, "restoreme"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t.overwrite(df1)
    v1 = int(t.history()[-1]["version"])
    t.tag("good", v1)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.delete(F.col("id") == 1)
    assert {r.id for r in t.read().collect()} == {2, 3}

    t.restore(version=v1)
    assert {(r.id, r.v) for r in t.read().collect()} == {(1, "a"), (2, "b")}
    # restore is a COMMIT: history grew, the pre-restore state is still
    # readable, and a restore-of-the-restore round-trips
    hist = t.history()
    assert hist[-1]["op"] == "restore"
    assert len(hist) >= 4
    t.restore(tag="good")
    assert {r.id for r in t.read().collect()} == {1, 2}
