"""Round-artifact consistency: the committed oracle-gate artifact must
not lag the query registry (round-4 verdict item 2 — ORACLE_r4.txt had
218 PASS lines while the registry had 222 because four queries landed
after the artifact was generated).

Regenerate with:
    python tools/check_oracle.py /root/testdata/sf0.01 | tee ORACLE_r<N>.txt
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_oracle_artifact() -> str:
    paths = glob.glob(os.path.join(REPO, "ORACLE_r*.txt"))
    assert paths, "no ORACLE_r*.txt artifact committed"
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def test_oracle_artifact_covers_registry_at_head():
    from dataingestionframework_spark.plans.queries import QUERIES

    path = _newest_oracle_artifact()
    lines = open(path).read().splitlines()
    n_pass = sum(1 for ln in lines if ln.startswith("PASS "))
    n_fail = sum(1 for ln in lines if ln.startswith("FAIL "))
    assert n_fail == 0, f"{os.path.basename(path)} records {n_fail} FAILs"
    assert n_pass >= len(QUERIES), (
        f"{os.path.basename(path)} has {n_pass} PASS lines but the "
        f"registry has {len(QUERIES)} queries — regenerate the artifact "
        "as the last act of the round"
    )


def test_every_query_has_oracle_twin_or_is_documented():
    """Every registry entry has a DuckDB twin — the repo invariant the
    round-4 mmr_rerank gap broke. If a future operator genuinely can't
    be SQL-oracled, list it here with a reason instead of silently
    shipping weak."""
    from dataingestionframework_spark.plans.oracles import ORACLES
    from dataingestionframework_spark.plans.queries import QUERIES

    documented_weak: dict[str, str] = {}
    missing = [q for q in QUERIES if q not in ORACLES and q not in documented_weak]
    assert not missing, f"queries without oracle twins: {missing}"
    stale = [o for o in ORACLES if o not in QUERIES]
    assert not stale, f"oracles without queries: {stale}"
