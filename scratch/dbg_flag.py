import os, sys; os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu'); jax.config.update("jax_enable_x64", True)
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.advection.vector_invariant import WENOVectorInvariant
from oceananigans_tpu.boundary_conditions import BoundaryCondition, FieldBoundaryConditions
from oceananigans_tpu.boundary_conditions.boundary_condition import FLUX
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures import (CATKEVerticalDiffusivity, ClosureTuple,
                                       TriadIsopycnalSkewSymmetricDiffusivity)
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models import CubedSphereHydrostaticModel

R, OMEGA = 6.371e6, 7.292e-5
which = sys.argv[1]
grid = ConformalCubedSphereGrid((8, 8, 8), z=(-3000.0, 0.0), radius=R,
                                halo=4, dtype=jnp.float64)
kw = dict(tracers=("b",), rotation_rate=OMEGA)
if "weno" in which:
    kw.update(momentum_advection=WENOVectorInvariant(order=5), tracer_advection=WENO(5))
if "catke" in which and "gm" in which:
    kw["closure"] = ClosureTuple(CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
        TriadIsopycnalSkewSymmetricDiffusivity(kappa_skew=1000.0, kappa_symmetric=1000.0, buoyancy=BuoyancyTracer()))
elif "catke" in which:
    kw["closure"] = CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer())
elif "gm" in which:
    kw["closure"] = TriadIsopycnalSkewSymmetricDiffusivity(kappa_skew=1000.0, kappa_symmetric=1000.0, buoyancy=BuoyancyTracer())
if "bath" in which:
    kw["bottom_height"] = lambda lam, phi: -3000.0 + 1500.0*np.exp(-((lam-1.0)**2+(phi-0.4)**2)/0.3)
if "se" in which:
    kw.update(free_surface="split_explicit", substeps=12)
if "bc" in which:
    kw["boundary_conditions"] = {
        "u": FieldBoundaryConditions(top=BoundaryCondition(FLUX, -5e-5)),
        "b": FieldBoundaryConditions(top=BoundaryCondition(FLUX, 2e-9))}
if kw.get("closure") is not None or "se" in which:
    kw["timestepper"] = "QuasiAdamsBashforth2"
m = CubedSphereHydrostaticModel(grid, **kw)
m.set(b=lambda lam, phi, z: 2e-5*z + 1e-4*np.exp(-(lam**2+(phi-0.5)**2)/0.2))
for i in range(8):
    m.time_step(600.0)
    bad = [n for n in ("u","v","b","eta") if not np.isfinite(np.asarray(m.state[n])).all()]
    print(which, "step", i+1, "bad:", bad, "umax", float(jnp.nanmax(jnp.abs(m.state["u"]))), "emax", (float(jnp.nanmax(m.state["e"])) if "e" in m.state else None), flush=True)
    if bad: break
print(which, "done |u|max", float(jnp.abs(m.state["u"]).max()), flush=True)
