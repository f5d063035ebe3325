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
for i in range(7):
    m.time_step(600.0)

def scan(name, a):
    a = np.asarray(a)
    bad = ~np.isfinite(a)
    amax = np.abs(a[np.isfinite(a)]).max() if np.isfinite(a).any() else None
    if bad.any():
        print(name, "NONFINITE", bad.sum(), np.argwhere(bad)[:4].tolist(), flush=True)
    else:
        print(name, "ok, max", amax, flush=True)

st0 = {n: m.state[n] for n in ("u","v","eta","b")}
sf = m._filled(st0, m.state["time"])
for n in ("u","v","eta","b"):
    scan("sf."+n, sf[n])
w = m._w(sf)
scan("w", w)
zetas = m._vertex_zetas(sf["u"], sf["v"])
for p in range(6):
    scan(f"zeta{p}", zetas[p])
G, auxs = m._tendencies(sf, w, m.state["time"])
for n in ("u","v","b"):
    scan("G."+n, G[n])
# per-panel pHY
for p in [0]:
    pp = m.panels[p]
    ph = pp._hydrostatic_pressure({n: sf[n][p] for n in ("u","v","b","eta")}, 0.0)
    scan("ph0", ph)
