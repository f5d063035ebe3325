"""Headline benchmarks: the three driver-captured rows.

1. hydrostatic lat-lon 512x256x32 WENO-VI split-explicit (production
   primitive-equation config)
2. cubed-sphere hydrostatic 6x64x64x32 split-explicit (panel-batched step)
3. flagship: 256^3 nonhydrostatic WENO LES, time per RK3 step — printed
   LAST so a single-line parser reads the flagship row.

Mirrors the reference's canonical benchmark setups
(benchmark/benchmark_nonhydrostatic_models.jl,
benchmark/benchmark_models_stepping.jl: build model, warmup, timed
time_step!). Baseline anchor for the flagship: 432 M cell-updates/s (V100,
Float32, WENO — docs/src/appendix/benchmarks.md:120-125; see BASELINE.md).

Variance protocol (the analogue of the reference's BenchmarkTools
sampling): each row is the MEDIAN over >=3 independent timing blocks, with
the relative spread (max-min)/median reported in the row; block length
doubles (bounded) until the spread is <=2%. Committed floors in
BENCH_BASELINES.json are trusted-median x 0.95; `python bench.py --check`
re-measures and fails on a >10% regression against any floor
(benchmark/benchmark_regression.jl analogue). See docs/roofline.md
"Measurement variance" for the session-to-session band.

Env knobs: BENCH_ONLY=flagship|hydro|cs (default: all three),
BENCH_STEPS (starting block length), BENCH_BLOCKS, BENCH_N.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CU_PER_S = 432e6  # V100 Float32 256³ WENO (BASELINE.md)

BASELINES_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASELINES.json")


def check():
    """Run the headline rows and compare against BENCH_BASELINES.json.
    Exits 1 on any >10% regression; prints one line per row."""
    rows = {}
    for row in all_rows():
        rows[row["metric"]] = row["value"]

    with open(BASELINES_FILE) as f:
        baselines = json.load(f)
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


def flagship_row():
    """The 256^3 nonhydrostatic WENO-5 RK3 row. Returns the row dict."""
    n = int(os.environ.get("BENCH_N", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    blocks = int(os.environ.get("BENCH_BLOCKS", "3"))

    import jax
    import jax.numpy as jnp

    from bench_extra import _jax_setup, timed_blocks
    _jax_setup()

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

    med, spread, steps_used, _ = timed_blocks(
        model._step, state, dt, fetch, steps, blocks,
        on_cpu=platform == "cpu")
    cu_per_s = n ** 3 / med
    return {
        "metric": f"nonhydrostatic_{n}^3_weno5_f32_cell_updates_per_s",
        "value": cu_per_s,
        "unit": "cell-updates/s",
        "vs_baseline": cu_per_s / BASELINE_CU_PER_S,
        "step_ms": med * 1e3, "spread_pct": round(spread * 100, 2),
        "steps": steps_used, "blocks": blocks,
    }


def all_rows():
    """Yield the three headline rows, flagship LAST. A secondary row that
    fails to build never blocks the flagship row."""
    only = os.environ.get("BENCH_ONLY", "")
    import bench_extra
    if only in ("", "hydro"):
        try:
            yield bench_extra.hydro_row()
        except Exception as e:
            print(f"# hydro row failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if only in ("", "cs"):
        try:
            yield bench_extra.cs_row()
        except Exception as e:
            print(f"# cs row failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if only in ("", "flagship"):
        yield flagship_row()


def main():
    for row in all_rows():
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
