import os, sys; os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu'); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.advection.vector_invariant import WENOVectorInvariant
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models import CubedSphereHydrostaticModel
R, OMEGA = 6.371e6, 7.292e-5
grid = ConformalCubedSphereGrid((8, 8, 8), z=(-3000.0, 0.0), radius=R,
                                halo=4, dtype=jnp.float64)
m = CubedSphereHydrostaticModel(grid, tracers=("b",), rotation_rate=OMEGA,
    momentum_advection=WENOVectorInvariant(order=5), tracer_advection=WENO(5),
    bottom_height=lambda lam, phi: -3000.0 + 1500.0*np.exp(-((lam-1.0)**2+(phi-0.4)**2)/0.3))
m.set(b=lambda lam, phi, z: 2e-5*z + 1e-4*np.exp(-(lam**2+(phi-0.5)**2)/0.2))
for i in range(12):
    m.time_step(600.0)
    u = np.asarray(m.state["u"])
    if not np.isfinite(u).all():
        for n in ("u","v","b","eta"):
            a = np.asarray(m.state[n])
            bad = np.argwhere(~np.isfinite(a))
            print("step", i+1, n, "nan count", len(bad), "first sites", bad[:6].tolist(), flush=True)
        break
    print("step", i+1, "ok umax", np.abs(u).max(), flush=True)
