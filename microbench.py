"""Phase breakdown of the nonhydrostatic step on the current backend."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pins the axon TPU tunnel before env vars apply
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel

N = int(os.environ.get("BENCH_N", "128"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))

grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                       topology=("periodic", "periodic", "bounded"),
                       dtype=jnp.float32)
model = NonhydrostaticModel(grid=grid, advection=WENO(5))
rng = np.random.default_rng(0)
model.set(u=0.1 * rng.standard_normal((N, N, N)).astype(np.float32),
          v=0.1 * rng.standard_normal((N, N, N)).astype(np.float32))

state = model.state
f = state["fields"]
dt = jnp.asarray(1e-4, jnp.float32)


def fetch(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return float(jnp.sum(leaf[0, 0]))
    return float(jax.tree.leaves(out)[0])


def timeit(name, fn, *args):
    out = fn(*args)           # compile
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    fetch(out)
    el = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {el * 1e3:8.2f} ms")
    return el


fill = jax.jit(lambda f: model._fill_all(f, 0.0))
tend = jax.jit(lambda f: model._compute_tendencies(f, 0.0)[0])
proj = jax.jit(lambda u, v, w: model._project(u, v, w, dt, 0.0))
solve = jax.jit(model.pressure_solver.solve)
step = model._step

ff = fill(f)
t_fill = timeit("fill_halos (all fields)", fill, f)
t_tend = timeit("tendencies (WENO x4)", tend, ff)
rhs = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
t_solve = timeit("poisson solve", solve, rhs)
t_proj = timeit("projection (fill+solve+grad)", proj, ff["u"], ff["v"], ff["w"])
t_step = timeit("full RK3 step", step, state, dt)
print(f"sum of phases ×3 stages ≈ {(t_fill + t_tend + t_proj) * 3 * 1e3:.1f} ms")

# -- fused fast-path kernels (when engaged) ---------------------------------
if model._fused_update is not None:
    tr = {n: f[n] for n in model.tracer_names}
    up1 = jax.jit(lambda u, v, w: model._fused_update(u, v, w, tr, None,
                                                      dt, 0.0 * dt))
    Gm, new = up1(ff["u"], ff["v"], ff["w"])
    t_up1 = timeit("fused update (stage 1)", up1, ff["u"], ff["v"], ff["w"])
    up2 = jax.jit(lambda u, v, w, Gm: model._fused_update(
        u, v, w, tr, Gm, dt, 0.5 * dt))
    t_up2 = timeit("fused update (stage 2+)", up2,
                   new["u"], new["v"], new["w"], Gm)
    if model._fuse_correction:
        Hx, Hy, _ = model.grid.H
        p = jnp.pad(jnp.zeros(model.grid.N, model.grid.dtype),
                    ((Hx, Hx), (Hy, Hy), (0, 0)), mode="wrap")
        upc = jax.jit(lambda u, v, w, Gm, p: model._fused_update(
            u, v, w, tr, Gm, dt, 0.5 * dt, p=p, corr_dt=dt))
        t_upc = timeit("fused update (corr-fused)", upc,
                       new["u"], new["v"], new["w"], Gm, p)
if model._fused_div is not None:
    fd = jax.jit(lambda u, v, w: model._fused_div(u, v, w, 1.0 / dt))
    t_div = timeit("fused divergence", fd, ff["u"], ff["v"], ff["w"])
    rhs_i = fd(ff["u"], ff["v"], ff["w"])
    Hx, Hy, _ = model.grid.H
    embed = jax.jit(lambda pi: jnp.pad(pi, ((Hx, Hx), (Hy, Hy), (0, 0)),
                                       mode="wrap"))
    t_embed = timeit("p pad-wrap embed", embed, rhs_i)
if model._fused_correct is not None:
    pp = jnp.pad(rhs_i, ((Hx, Hx), (Hy, Hy), (0, 0)), mode="wrap")
    fc = jax.jit(lambda p, u, v, w: model._fused_correct(p, u, v, w, dt))
    t_corr = timeit("fused correct", fc, pp, ff["u"], ff["v"], ff["w"])
