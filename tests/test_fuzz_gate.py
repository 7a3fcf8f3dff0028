"""Opt-in differential fuzz sweep: `pytest -m fuzz`.

Runs tools/fuzz_gate.py — the full oracle-parity gate against an
adversarially perturbed rebuild of the tables (NULL/NaN/unicode/
duplicate/empty rows; see the tool's docstring). ~8 min; the round-7
run of this sweep found 28 real cross-engine divergences that the
fixed-corpus gate could never see, so keep it green.
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.fuzz


def test_fuzz_gate_no_real_failures(tmp_path):
    proc = subprocess.run(
        [sys.executable, "tools/fuzz_gate.py", str(tmp_path / "fuzz_sf")],
        capture_output=True, text=True, timeout=3000,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"fuzz gate failed:\n{tail}"
    assert "# fuzz verdict: 0 real failures" in proc.stdout, tail
