#!/bin/bash
# Round-2 TPU measurement sweep — run when the axon tunnel is back.
# Each command prints JSON/ms lines; results feed PARITY + README + BENCH_r02.
set -x
cd /root/repo

# 1. flagship (corr-fused default): expect >= 653M cu/s
timeout 2400 python bench.py

# 2. flagship with correction fusion disabled (A/B the new kernel)
timeout 2400 python - <<'EOF'
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel
n = 256
grid = RectilinearGrid(size=(n,)*3, extent=(1.,1.,1.),
                       topology=("periodic","periodic","bounded"),
                       dtype=jnp.float32)
m = NonhydrostaticModel(grid=grid, advection=WENO(5), fuse_correction=False)
rng = np.random.default_rng(0)
m.set(u=0.1*rng.standard_normal((n,)*3).astype(np.float32),
      v=0.1*rng.standard_normal((n,)*3).astype(np.float32))
dt = jnp.asarray(1e-4, jnp.float32)
s = m._step(m.state, dt); float(jnp.sum(s["fields"]["u"][0,0]))
t0 = time.perf_counter()
for _ in range(10): s = m._step(s, dt)
float(jnp.sum(s["fields"]["u"][0,0]))
el = (time.perf_counter()-t0)/10
print(json.dumps({"metric":"flagship_no_corr_fusion_ms","value":el*1e3}))
EOF

# 3. per-phase breakdown at 256^3
timeout 2400 env BENCH_N=256 BENCH_STEPS=20 python microbench.py

# 4. tile experiments on the update kernel (quick A/B via env knobs)
for tiles in 32x64 32x128:split 64x64:split; do
  timeout 2400 env FUSED_UPDATE_TILES=$tiles BENCH_STEPS=10 python bench.py || true
done

# 5. secondary benches (shallow water, hydro, LES, tracer scaling)
timeout 3600 python bench_extra.py

# 6. hydro fused variants
timeout 3600 env BENCH_ONLY=hydro HYDRO_FUSED=packed python bench_extra.py || true
