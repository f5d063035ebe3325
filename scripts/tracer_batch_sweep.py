"""12-tracer batch-split sweep (VERDICT r4 item 5's missing measurement,
first run in round 3 as a scratch probe): step time of the 256^3 WENO-5
nonhydrostatic model with 12 active tracers as a function of the
FUSED_TRACER_BATCH split (how many tracers share one Pallas megakernel
call — the advecting velocity slabs are re-DMA'd once per batch,
kernels/fused_advection.py:680-699).

Recorded result (v5e, round 5): single 93.0 / K=2 91.4 / K=3 89.4 /
K=4 87.25 / K=6 89.5 / K=12 92.2 ms — a shallow bowl with K=4 optimal
(~6% under the single kernel). Velocity-slab re-streaming is NOT the
12-tracer cost (round 3's flat result confirmed at finer resolution); the
per-tracer WENO reconstruction is. The auto heuristic now batches by 4
past 6 tracers (kernels/fused_advection.py), re-measured 87.08 ms; the
12-vs-0 step ratio is 3.38x against the 25.8 ms 0-tracer base. The <=75 ms
target is bounded out by the per-tracer VPU floor (~5.1 ms/tracer at the
measured mix rate).

Usage: python scripts/tracer_batch_sweep.py [batch_sizes...]
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(batch):
    env = dict(os.environ)
    if batch:
        env["FUSED_TRACER_BATCH"] = str(batch)
    code = r"""
import os, sys, time, json
sys.path.insert(0, %r)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(%r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel
from bench_extra import timed_blocks
n = 256 if jax.devices()[0].platform != "cpu" else 32
rng = np.random.default_rng(0)
names = tuple(f"c{i}" for i in range(12))
grid = RectilinearGrid(size=(n, n, n), extent=(1.0, 1.0, 1.0),
                       topology=("periodic", "periodic", "bounded"),
                       dtype=jnp.float32)
m = NonhydrostaticModel(grid=grid, advection=WENO(5), tracers=names)
m.set(u=0.1 * rng.standard_normal((n, n, n)).astype(np.float32),
      **{nm: rng.random((n, n, n), dtype=np.float32) for nm in names})
dt = jnp.asarray(1e-4, jnp.float32)
fetch = lambda st: float(jnp.sum(st["fields"]["u"][0, 0]))
med, spread, steps, _ = timed_blocks(m._step, m.state, dt, fetch, 10, 3,
                                     on_cpu=jax.devices()[0].platform == "cpu")
print(json.dumps({"batch": os.environ.get("FUSED_TRACER_BATCH", "auto"),
                  "step_ms": round(med * 1e3, 2),
                  "spread_pct": round(spread * 100, 2)}))
""" % (HERE, HERE)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
            return
    print(json.dumps({"batch": batch, "error": out.stderr[-300:]}),
          flush=True)


if __name__ == "__main__":
    batches = sys.argv[1:] or ["auto", "2", "3", "4", "6", "12"]
    for b in batches:
        run_one(None if b == "auto" else b)
