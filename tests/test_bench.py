"""bench.py plumbing tests (CPU mode, tiny shapes).

Round-3 verdict #7: the bench must print its single JSON line under
every outcome, skip stages it cannot afford, and turn numeric failures
into a nonzero exit code instead of a note string.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")


def _run_bench(extra_env, timeout=900):
    env = {**os.environ, "XIVO_PLATFORM": "cpu", "BENCH_BATCH": "2",
           "BENCH_SECONDS": "0.5", "BENCH_CONSISTENCY": "0",
           "BENCH_IMG": "0", **extra_env}
    r = subprocess.run([sys.executable, BENCH], env=env,
                       capture_output=True, text=True, timeout=timeout)
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, (r.stdout, r.stderr[-2000:])
    return r.returncode, json.loads(lines[-1])


@pytest.fixture(scope="module")
def happy():
    return _run_bench({})


def test_bench_happy_path_emits_json(happy):
    rc, out = happy
    assert rc == 0
    assert out["metric"] == "pcw_vio_frames_per_s_per_chip"
    assert out["pcw_fps"] > 0
    assert out["ate_rmse_m"] < 1.0
    assert out["consistency_disabled"] and out["img_disabled"]


def test_bench_numeric_fault_exits_nonzero():
    """A NaN ATE must fail the bench loudly — rc 2 — while the JSON
    line still prints with the measured fields."""
    rc, out = _run_bench({"BENCH_FAULT": "pcw_nan"})
    assert rc == 2
    assert "numeric_failure" in out
    assert out["pcw_fps"] > 0          # measurement still reported


def test_bench_budget_skips_stages():
    """With the budget nearly exhausted after stage 1, later stages are
    skipped with explicit markers instead of risking a driver timeout."""
    rc, out = _run_bench({"BENCH_CONSISTENCY": "1", "BENCH_IMG": "1",
                          "BENCH_BUDGET_S": "1"})
    assert rc == 0
    assert "consistency_skipped_for_budget" in out
    assert "img_skipped_for_budget" in out
    assert out["pcw_fps"] > 0
