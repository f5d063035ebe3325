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
    if bad.any():
        print(name, "NONFINITE", bad.sum(), np.argwhere(bad)[:4].tolist(), flush=True)
    else:
        print(name, "ok", flush=True)

st0 = {n: m.state[n] for n in ("u","v","eta","b")}
sf = m._filled(st0, m.state["time"])
w = m._w(sf)
zetas = m._vertex_zetas(sf["u"], sf["v"])
p = 0
pp = m.panels[p]
g = pp.grid
ma = m.momentum_advection
u, v, wp = sf["u"][p], sf["v"][p], w[p]
h_u, h_v = ma._horizontal(g, u, v, zeta=zetas[p])
scan("horizontal_u", h_u); scan("horizontal_v", h_v)
b_u, b_v = ma._bernoulli(g, u, v)
scan("bernoulli_u", b_u); scan("bernoulli_v", b_v)
z_u, z_v = ma._vertical(g, u, v, wp)
scan("vertical_u", z_u); scan("vertical_v", z_v)
phi_u, phi_v = ma._divergence_flux(g, u, v)
scan("phi_u", phi_u); scan("phi_v", phi_v)
cu = m.coriolis.x_f_cross_U(g, u, v, wp)
scan("coriolis_u", cu)
