"""Perf-regression guard (VERDICT r3 item 5): the analogue of the
reference's benchmark/benchmark_regression.jl branch-vs-main harness
(/root/reference/benchmark/README.md). `python bench.py --check` re-measures
the headline rows (flagship nonhydrostatic, hydrostatic lat-lon,
cubed-sphere) and fails on a >10% regression against the committed floors in
BENCH_BASELINES.json. Off-TPU the timings are meaningless, so the test
skips itself on CPU/GPU backends — the driver's real-chip bench run is where
it bites; run `python bench.py --check` manually on the chip after perf
work."""

import os
import subprocess
import sys

import jax
import pytest


@pytest.mark.skipif(jax.default_backend() in ("cpu", "gpu"),
                    reason="perf floors are recorded on the TPU")
def test_bench_check_passes():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "bench.py", "--check"], cwd=here,
                         capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stdout + out.stderr


def test_bench_baselines_file_well_formed():
    import json
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BASELINES.json")) as f:
        rows = json.load(f)
    assert rows, "no perf floors recorded"
    for metric, floor in rows.items():
        assert isinstance(floor, (int, float)) and floor > 0, metric
