"""Replay the recorded acceptance goldens WITHOUT the reference binary.

docs/ACCEPTANCE.json is produced by `python scripts/acceptance.py` with the
reference build present (.refbuild/bin/slam_plus_plus); its ref_chi2/ref_iters
columns are the goldens for the deterministic synthetic datasets the script
regenerates from fixed seeds.  This test re-runs OUR solvers on the quick rows
and compares against those recorded goldens, so golden regression coverage
survives without the binary (the analogue of the reference's hard-coded
golden table in scripts/tests/unit_tests.sh:50-262).

Slow rows (w100K, venice-class BA, the incremental replays) are only run
with SLAMPP_SLOW=1.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(ROOT, "docs", "ACCEPTANCE.json")

QUICK = {
    "intel-scale batch -po",
    "intel-scale incr fastL -nsp 1",
}


def _rows():
    if not os.path.exists(GOLDENS):
        pytest.skip("docs/ACCEPTANCE.json not recorded yet")
    with open(GOLDENS) as f:
        rows = json.load(f)
    slow = os.environ.get("SLAMPP_SLOW") == "1"
    return [r for r in rows if slow or r["row"] in QUICK]


@pytest.mark.slow
@pytest.mark.parametrize("row", _rows(), ids=lambda r: r["row"])
def test_acceptance_golden_replay(row):
    # run in a subprocess: scripts/acceptance.py configures the jax backend
    # at import time, and each row may take minutes — isolate them
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "acceptance.py"),
         "--rows", row["row"], "--no-ref",
         "--out", "/tmp/_acc_replay.md"],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": ROOT})
    assert out.returncode == 0, out.stdout + out.stderr
    with open("/tmp/_acc_replay.json") as f:
        res = json.load(f)[0]
    ref = row["ref_chi2"]
    ratio = res["chi2"] / ref if ref > 0 else \
        (1.0 if res["chi2"] <= 0.01 else float("inf"))
    assert ratio <= 1.05, (res, row)
