"""Headline benchmark: 256³ nonhydrostatic WENO LES, time per RK3 step.

Mirrors the reference's canonical benchmark setup
(benchmark/benchmark_nonhydrostatic_models.jl / benchmarkable_nonhydrostatic_
model.jl: RectilinearGrid(size=(N,N,N)) + default model, warmup, then timed
time_step!). Baseline anchor: 432 M cell-updates/s (V100, Float32, WENO —
docs/src/appendix/benchmarks.md:120-125; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CU_PER_S = 432e6  # V100 Float32 256³ WENO (BASELINE.md)

# committed round-over-round floors for `--check` (the analogue of the
# reference's benchmark/benchmark_regression.jl branch-vs-main guard):
# metric prefix -> cell-updates/s recorded on the v5e at the time the row
# last moved. `python bench.py --check` re-measures and FAILS (exit 1) on a
# >10% regression against any row present here. Update a row when a change
# legitimately moves it (and say so in the commit).
BASELINES_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASELINES.json")


def check():
    """Run the headline rows and compare against BENCH_BASELINES.json.
    Exits 1 on any >10% regression; prints one line per row."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    with open(BASELINES_FILE) as f:
        baselines = json.load(f)
    env = dict(os.environ)
    rows = {}

    def run(cmd, only=None, steps="10"):
        # enough steps to amortize the remote-dispatch overhead (the axon
        # tunnel adds ~1-4 ms per enqueued step: a 3 ms cubed-sphere step
        # measured at 5 steps reads 2-3x slow and false-positives the guard)
        e = dict(env)
        e.setdefault("BENCH_STEPS", steps)
        if only:
            e["BENCH_ONLY"] = only
        out = subprocess.run([sys.executable, cmd], cwd=here, env=e,
                             capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                row = json.loads(line)
                rows[row["metric"]] = row["value"]

    run("bench.py")
    run("bench_extra.py", "hydro", steps="10")
    run("bench_extra.py", "cs", steps="50")

    failed = False
    for metric, floor in baselines.items():
        cur = rows.get(metric)
        if cur is None:
            print(f"MISSING {metric} (no row produced)")
            failed = True
            continue
        ratio = cur / floor
        tag = "OK" if ratio >= 0.9 else "REGRESSION"
        if ratio < 0.9:
            failed = True
        print(f"{tag:10s} {metric}: {cur / 1e6:.1f}M vs floor "
              f"{floor / 1e6:.1f}M ({ratio:.2f}x)")
    sys.exit(1 if failed else 0)


def main():
    n = int(os.environ.get("BENCH_N", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize pins the axon TPU tunnel before env
        # vars apply; force the platform before the backend initializes
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: the first (cold) compile of the 256³ step
    # through the remote-compile tunnel is slow; subsequent runs reuse it.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.models import NonhydrostaticModel

    platform = jax.devices()[0].platform
    if platform == "cpu" and "BENCH_N" not in os.environ:
        n = 64  # keep CPU smoke-runs fast

    def build(**kw):
        rng = np.random.default_rng(0)   # fresh seed per build: the
        # fallback model must see identical initial fields
        grid = RectilinearGrid(size=(n, n, n), extent=(1.0, 1.0, 1.0),
                               topology=("periodic", "periodic", "bounded"),
                               dtype=jnp.float32)
        m = NonhydrostaticModel(grid=grid, advection=WENO(5), **kw)
        m.set(u=0.1 * rng.standard_normal((n, n, n)).astype(np.float32),
              v=0.1 * rng.standard_normal((n, n, n)).astype(np.float32))
        return m

    model = build()
    dt = jnp.asarray(1e-4, model.grid.dtype)

    def fetch(state):
        # device→host readback of one scalar: forces completion of all
        # enqueued steps (block_until_ready alone does not synchronize
        # through remote-execution tunnels)
        return float(jnp.sum(state["fields"]["u"][0, 0]))

    # warmup / compile; if the correction-fused kernel fails to compile on
    # this backend, fall back so the benchmark always reports
    try:
        state = model._step(model.state, dt)
        fetch(state)
    except Exception as e:
        print(f"# corr-fused path failed ({type(e).__name__}); retrying "
              "with fuse_correction=False", file=sys.stderr)
        model = build(fuse_correction=False)
        state = model._step(model.state, dt)
        fetch(state)

    if model._fuse_correction and platform != "cpu":
        # auto-tune: quick A/B of the correction-fused vs separate-correct
        # paths (both compile once, cached persistently); keep the faster
        alt = build(fuse_correction=False)
        alt_state = alt._step(alt.state, dt)
        fetch(alt_state)

        def time3(m, st):
            t0 = time.perf_counter()
            for _ in range(3):
                st = m._step(st, dt)
            fetch(st)
            return time.perf_counter() - t0

        t_fused = time3(model, state)
        t_plain = time3(alt, alt_state)
        print(f"# corr-fusion A/B: fused {t_fused / 3 * 1e3:.2f} ms vs "
              f"plain {t_plain / 3 * 1e3:.2f} ms", file=sys.stderr)
        if t_plain < t_fused:
            model, state = alt, alt_state

    t0 = time.perf_counter()
    for _ in range(steps):
        state = model._step(state, dt)
    fetch(state)
    elapsed = time.perf_counter() - t0

    t_median = elapsed / steps
    cu_per_s = n ** 3 / t_median

    print(json.dumps({
        "metric": f"nonhydrostatic_{n}^3_weno5_f32_cell_updates_per_s",
        "value": cu_per_s,
        "unit": "cell-updates/s",
        "vs_baseline": cu_per_s / BASELINE_CU_PER_S,
    }))


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
