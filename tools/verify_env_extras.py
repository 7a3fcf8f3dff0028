"""One-command verification of the environment-gated capabilities.

This container is DNS-less (no pip/apt/Maven), so three capabilities
ship call-compatible but test-skipped: the Delta backend
(catalog/delta.py), transformWithStateInPandas stream mode (needs
protobuf), and the Avro format leg (needs spark-avro). On a NETWORKED
host, run:

    python tools/verify_env_extras.py            # report + run what's present
    python tools/verify_env_extras.py --install  # print the install commands

Exit code 0 = every present extra passed its tests; missing extras are
reported (not failures) unless --strict, which requires all three.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def probe() -> dict[str, tuple[bool, str]]:
    """(available, how-to-install) per extra."""
    jars = _spark_jars_dir()
    has_delta_jar = any(
        f.startswith("delta-spark") for f in os.listdir(jars)
    ) and importlib.util.find_spec("delta") is not None
    try:
        has_proto = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no google namespace package at all
        has_proto = False
    has_avro = any(f.startswith("spark-avro") for f in os.listdir(jars))
    return {
        "delta": (
            has_delta_jar,
            "pip install delta-spark  # and/or drop delta-spark_2.13-4.x.jar"
            f" + delta-storage-4.x.jar into {jars}",
        ),
        "protobuf": (has_proto, "pip install protobuf"),
        "avro": (
            has_avro,
            "spark-submit --packages org.apache.spark:spark-avro_2.13:"
            "<spark-version>, or drop the spark-avro jar into " + jars,
        ),
    }


# What each extra unlocks: the pytest selector that must go 0-skip.
TESTS = {
    "delta": ["tests/test_table.py", "-k", "delta"],
    "protobuf": ["tests/test_advanced_ops.py", "-k", "tws"],
    "avro": ["tests/test_round5_ops.py", "-k", "avro"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--install", action="store_true", help="print install commands and exit")
    ap.add_argument("--strict", action="store_true", help="missing extras are failures")
    args = ap.parse_args()

    state = probe()
    missing = [k for k, (ok, _) in state.items() if not ok]
    for k, (ok, how) in state.items():
        print(f"{'PRESENT' if ok else 'MISSING'}  {k}" + ("" if ok else f"  -> {how}"))
    if args.install:
        return 0
    rc = 0
    for k, (ok, _) in state.items():
        if not ok:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *TESTS[k]]
        print(f"\n== {k}: {' '.join(cmd)}")
        r = subprocess.run(cmd, cwd=REPO)
        rc = rc or r.returncode
    if missing:
        print(f"\nmissing extras (install then re-run): {', '.join(missing)}")
        if args.strict:
            rc = rc or 2
    return rc


if __name__ == "__main__":
    sys.exit(main())
