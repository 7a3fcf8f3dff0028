"""ConfigStore sync (staging→merge→soft-delete) + OpsLog state machine."""

from pyspark.sql import functions as F

from dataingestionframework_spark.catalog.system import ConfigStore, OpsLog, SystemTables
from dataingestionframework_spark.specs import ColumnSpec, IngestionSpec


def _spec(hid, name):
    return IngestionSpec(
        header_id=hid,
        source_name=name,
        table_name=f"main.{name}",
        source_path=f"/tmp/{name}",
        file_format="csv",
        columns=[
            ColumnSpec("a", "a", "int", 1),
            ColumnSpec("b", "b", "string", 2, is_pii=True),
        ],
    )


def test_config_sync_and_soft_delete(spark, catalog):
    st = SystemTables(catalog).create_all()
    store = ConfigStore(st)
    store.sync([_spec(1, "one"), _spec(2, "two")])
    assert st.header.count() == 2
    assert st.columns.count() == 4
    assert st.control.count() == 2
    assert {r.StatusID for r in st.status.read().collect()} == {0, 1, 2, 3}

    # re-sync without header 2 → soft-deleted, not removed
    store.sync([_spec(1, "one-renamed")])
    hdr = {r.HeaderID: (r.SourceName, r.IsCurrent) for r in st.header.read().collect()}
    assert hdr[1] == ("one-renamed", 1)
    assert hdr[2][1] == 0

    # round-trip: load_specs returns only current
    specs = store.load_specs()
    assert [s.header_id for s in specs] == [1]
    assert specs[0].source_name == "one-renamed"
    assert specs[0].columns[1].is_pii


def test_opslog_dual_write(spark, catalog):
    st = SystemTables(catalog).create_all()
    store = ConfigStore(st)
    store.sync([_spec(5, "five")])
    log = OpsLog(st)
    log.write(5, "START", "starting", 1, batch_id=1)
    log.write(5, "ROW_COUNT", "100", 1, batch_id=1)
    log.write(5, "END", "done", 2, batch_id=1)

    assert st.logs.count() == 3
    ctl = st.control.read().filter(F.col("HeaderID") == 5).first()
    assert ctl.StatusID == 2 and ctl.LatestBatchID == 1

    log.write(5, "START", "starting", 1, batch_id=2)
    ctl = st.control.read().filter(F.col("HeaderID") == 5).first()
    assert ctl.PreviousBatchID == 1 and ctl.LatestBatchID == 2
