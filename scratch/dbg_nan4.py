import os, sys; os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu'); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.advection.vector_invariant import WENOVectorInvariant
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models import CubedSphereHydrostaticModel
from oceananigans_tpu.grids.topology import LOC_CFC, LOC_FCC
from oceananigans_tpu.operators.operators import dx_c, dy_c
R, OMEGA = 6.371e6, 7.292e-5
grid = ConformalCubedSphereGrid((8, 8, 8), z=(-3000.0, 0.0), radius=R,
                                halo=4, dtype=jnp.float64)
m = CubedSphereHydrostaticModel(grid, tracers=("b",), rotation_rate=OMEGA,
    momentum_advection=WENOVectorInvariant(order=5), tracer_advection=WENO(5),
    bottom_height=lambda lam, phi: -3000.0 + 1500.0*np.exp(-((lam-1.0)**2+(phi-0.4)**2)/0.3))
m.set(b=lambda lam, phi, z: 2e-5*z + 1e-4*np.exp(-(lam**2+(phi-0.5)**2)/0.2))
for i in range(7):
    m.time_step(600.0)
st0 = {n: m.state[n] for n in ("u","v","eta","b")}
sf = m._filled(st0, m.state["time"])
p = 0
g = m.panels[p].grid
u, v = sf["u"][p], sf["v"][p]
dU = dx_c(g, g.Ax(LOC_FCC) * u)
dV = dy_c(g, g.Ay(LOC_CFC) * v)
print("dU finite:", bool(np.isfinite(np.asarray(dU)).all()),
      "dV finite:", bool(np.isfinite(np.asarray(dV)).all()))
i, j = 10, 11
for k in (1, 4):
    print("k=", k)
    print("  u row  ", np.asarray(u)[i-3:i+4, j, k])
    print("  dU row ", np.asarray(dU)[i-3:i+4, j, k])
    print("  dV row ", np.asarray(dV)[i-3:i+4, j, k])
ds = m.momentum_advection.divergence_scheme
val = ds.biased_by(g, dU, 0, 0, u, smooth=[dU + dV])
print("biased NaNs:", np.argwhere(~np.isfinite(np.asarray(val)))[:5].tolist())
# compute betas manually in f32 and f64
from oceananigans_tpu.advection.schemes import _ShiftCache, left_shifts, mirror, smoothness_value
sc = _ShiftCache(dU + dV, 0, None)
for s in range(3):
    shifts = left_shifts(3, s, 0)
    b32 = smoothness_value(sc, shifts, ds._sfactors[s], compute_dtype=jnp.float32)
    b64 = smoothness_value(sc, shifts, ds._sfactors[s], compute_dtype=jnp.float64)
    print("s", s, "beta32", np.asarray(b32)[i, j, 1], "beta64", np.asarray(b64)[i, j, 1])
