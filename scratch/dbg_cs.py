import os; os.environ["JAX_PLATFORMS"]="cpu"
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models.cubed_sphere_hydrostatic import CubedSphereHydrostaticModel
R, OMEGA, G = 6.371e6, 7.292e-5, 9.81
U, H0 = 20.0, 1000.0
grid = ConformalCubedSphereGrid((12, 12, 3), z=(-H0, 0.0), radius=R, dtype=jnp.float64)
m = CubedSphereHydrostaticModel(grid, tracers=("c",), rotation_rate=OMEGA,
                                buoyancy_tracer=None, gravity=G)
m.set_geographic(u_east=lambda lam, phi: U*np.cos(phi), v_north=lambda lam, phi: 0.0*lam)
m.set(eta=lambda lam, phi: -(R*OMEGA*U + 0.5*U*U)*np.sin(phi)**2/G,
      c=lambda lam, phi, z: np.exp(-((lam+np.pi/2)**2+phi**2)/0.18))
st0 = {n: m.state[n] for n in ("u","v","eta","c")}
sf = m._filled(st0, 0.0)
w = m._w(sf)
print("max |w|", float(jnp.abs(w).max()))
Gt, auxs = m._tendencies(sf, w, 0.0)
H, N = grid.H[0], grid.N[0]
sl = (slice(None), slice(H,H+N), slice(H,H+N), slice(3,6))
print("interior max |Gu|", float(jnp.abs(Gt["u"][sl]).max()),
      "|Gv|", float(jnp.abs(Gt["v"][sl]).max()))
pp = m.panels[0]
fields_p = {n: sf[n][0] for n in ("u","v","c","eta")}
zetas = m._vertex_zetas(sf["u"], sf["v"])
adv_u, adv_v = m.momentum_advection.momentum_tendencies(pp.grid, fields_p["u"], fields_p["v"], w[0], zeta=zetas[0])
print("adv_u max", float(jnp.abs(adv_u[H:H+N,H:H+N,3:6]).max()))
cor_u = m.coriolis.x_f_cross_U(pp.grid, fields_p["u"], fields_p["v"], w[0])
print("cor_u max", float(jnp.abs(cor_u[H:H+N,H:H+N,3:6]).max()))
from oceananigans_tpu.operators.operators import ddx
from oceananigans_tpu.grids.topology import LOC_FCC
geta = G*ddx(pp.grid, fields_p["eta"], LOC_FCC)
print("g deta max", float(jnp.abs(geta[H:H+N,H:H+N]).max()))
print("balance residual:", float(jnp.abs((-adv_u - cor_u - geta[...,:1]*jnp.ones_like(adv_u))[H:H+N,H:H+N,3:6]).max()))
