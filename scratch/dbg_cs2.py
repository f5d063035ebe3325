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
u0 = np.asarray(m.state["u"]).copy()
H, N = grid.H[0], grid.N[0]
sl = (slice(None), slice(H,H+N), slice(H,H+N), slice(3,6))
for i in range(18):
    m.time_step(900.0)
    d = np.abs(np.asarray(m.state["u"]) - u0)[sl]
    if True:
        idx = np.unravel_index(np.argmax(d), d.shape)
        print(i+1, "drift", d.max()/U, "at", idx,
              "eta max", float(jnp.abs(m.state["eta"]).max()), flush=True)
