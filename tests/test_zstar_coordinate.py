"""The reference's z* coordinate suite (test/test_zstar_coordinate.jl):
for a matrix of grids (rectilinear/lat-lon × immersed bottoms × stretched
z) × free surfaces × timesteppers, every step must preserve

  1. the σ-weighted tracer totals ∫b dV and ∫c dV,
  2. a zero grid-relative vertical velocity at the free surface
     (checked via the column telescoping identity ∂t_σ·H + ∇·∫u dz ≈ 0
     in its discrete form — the raw surface ω before the impenetrability
     clamp),
  3. a uniform 'constant' tracer at exactly 1 (constancy preservation).

Design note: the reference's MutableVerticalDiscretization-in-ZCoordinate
cases (a mutable grid pinned to σ = const) have no analogue here — the
static grid IS static by design; σ exists only as the z* traced proxy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.grids.latlon import LatitudeLongitudeGrid
from oceananigans_tpu.immersed import (GridFittedBottom,
                                       ImmersedBoundaryGrid,
                                       PartialCellBottom)
from oceananigans_tpu.models.free_surfaces import (ExplicitFreeSurface,
                                                   ImplicitFreeSurface,
                                                   SplitExplicitFreeSurface)
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel

# stretched interior z faces on (-20, 0), seeded like the reference
_rng = np.random.default_rng(1234)
Z_FACES = np.array([i + (0.0 if i in (-20, 0) else float(_rng.random()))
                    for i in range(-20, 1)])
Z_FACES[0], Z_FACES[-1] = -20.0, 0.0


def sigma_weighted_totals(model):
    """∫ c σ dV per tracer, with σ from the GRID η (the conserved mass)."""
    grid = model.grid
    eta_g = model.state["eta_grid"]
    sig = np.asarray(model._sigma_fields(eta_g)[("c", "c")])
    sl = grid.interior_slices
    h, n = grid.H[2], grid.N[2]
    dz = np.asarray(np.broadcast_to(np.asarray(grid.dz(("c", "c", "c")),
                                               float), grid.padded_shape))
    dz_int = dz[sl[0], sl[1], h:h + n]
    az = np.asarray(np.broadcast_to(np.asarray(grid.Az(("c", "c", "c")),
                                               float), grid.padded_shape))
    az_int = az[sl[0], sl[1], h:h + n]
    wet = 1.0
    if hasattr(grid, "fluid_mask"):
        wet = np.asarray(grid.fluid_mask(("c", "c", "c"),
                                         jnp.float64))[sl]
    out = {}
    for name in model.tracer_names:
        c = np.asarray(model.field(name).interior)
        out[name] = float((c * sig[sl[0], sl[1]] * dz_int * az_int
                           * wet).sum())
    return out


def surface_omega_residual(model):
    """max |∂t_σ·H + ∇·(moving transport)/Az| over wet columns — the raw
    surface grid-relative velocity before the impenetrability clamp
    (reference: maximum(abs, w[:, :, Nz+1]) < eps)."""
    from oceananigans_tpu.models.zstar import ZStarGrid
    from oceananigans_tpu.operators.operators import div_xy_ccc
    grid = model.grid
    ff = model._fill_all(model.state["fields"], model.time)
    eta_g = model.state["eta_grid"]
    sig = model._sigma_fields(eta_g)
    mg = ZStarGrid(grid, sig)
    div_h = np.asarray(div_xy_ccc(mg, ff["u"], ff["v"]))
    sl = grid.interior_slices
    h, n = grid.H[2], grid.N[2]
    dz = np.asarray(np.broadcast_to(np.asarray(grid.dz(("c", "c", "c")),
                                               float), grid.padded_shape))
    sig_cc = np.asarray(sig[("c", "c")])[sl[0], sl[1]]
    div_col = (div_h[sl[0], sl[1], h:h + n] * dz[sl[0], sl[1], h:h + n]
               * sig_cc).sum(axis=-1, keepdims=True)
    dts = np.asarray(model.state["dt_sigma"])[sl[0], sl[1]]
    H_geo, wet = model._zstar_geo[("c", "c", "c")]
    H_arr = np.asarray(H_geo) if not np.isscalar(H_geo) else H_geo
    resid = dts * (H_arr[sl[0], sl[1]] if not np.isscalar(H_arr)
                   else H_arr) + div_col
    if wet is not None:
        resid = resid * np.asarray(wet)[sl[0], sl[1]]
    return float(np.abs(resid).max())


def run_zstar_case(grid, free_surface, timestepper, n_steps=30, dt=60.0,
                   check_every=10):
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=free_surface, timestepper=timestepper,
        tracers=("b", "c", "constant"),
        buoyancy=None, vertical_coordinate="zstar")
    rng = np.random.default_rng(1234)
    Nx, Ny, Nz = grid.N
    xmid = 0.5 * (float(np.asarray(grid.coord_padded(0, "c")).min())
                  + float(np.asarray(grid.coord_padded(0, "c")).max()))
    model.set(b=lambda x, y, z: jnp.where(x < xmid, 0.06, 0.01),
              c=rng.random((Nx, Ny, Nz)), constant=1.0)
    # a resolved initial surface displacement drives real grid motion
    Lx = (float(np.asarray(grid.coord_padded(0, "c")).max()) - xmid) * 2
    model.set(eta=lambda x, y, z: 0.3 * jnp.sin(2 * jnp.pi
                                                * (x - xmid) / Lx))
    tot0 = sigma_weighted_totals(model)
    scale = {k: max(abs(v), 1e-12) for k, v in tot0.items()}
    wmax0 = None
    for step in range(1, n_steps + 1):
        model.time_step(dt)
        if step % check_every == 0 or step == n_steps:
            tot = sigma_weighted_totals(model)
            for name in ("b", "c"):
                rel = abs(tot[name] - tot0[name]) / scale[name]
                assert rel < 2e-11, \
                    f"{name} not conserved at step {step}: rel {rel}"
            cmin = np.asarray(model.field("constant").interior)
            if hasattr(grid, "fluid_mask"):
                wet = np.asarray(grid.fluid_mask(
                    ("c", "c", "c"), jnp.float64))[grid.interior_slices] > 0
                cmin = cmin[wet]
            assert np.abs(cmin - 1.0).max() < 1e-11, \
                f"constancy violated at step {step}"
            resid = surface_omega_residual(model)
            # relative to the grid-motion rate itself: |∂t_σ·H|max
            dts_h = float(np.abs(np.asarray(
                model.state["dt_sigma"])).max()) * 20.0
            assert resid < 1e-9 * dts_h + 1e-15, \
                f"surface omega residual {resid} (dts*H {dts_h}) step {step}"
    eta = np.asarray(model.field("eta").interior)
    assert np.abs(eta).max() > 1e-3, "free surface never moved"


def _grids():
    rect = RectilinearGrid(size=(8, 8, 20), x=(0, 100e3), y=(-10e3, 10e3),
                           z=Z_FACES,
                           topology=("periodic", "periodic", "bounded"))
    rect_bb = RectilinearGrid(size=(8, 8, 20), x=(0, 100e3),
                              y=(-10e3, 10e3), z=Z_FACES,
                              topology=("bounded", "bounded", "bounded"))
    llg = LatitudeLongitudeGrid(size=(8, 8, 20), longitude=(0, 1),
                                latitude=(0, 1), z=Z_FACES,
                                topology=("periodic", "bounded", "bounded"))
    rng = np.random.default_rng(7)
    bottom = -10.0 + 4.0 * rng.random((8, 8))
    irect = ImmersedBoundaryGrid(
        RectilinearGrid(size=(8, 8, 20), x=(0, 100e3), y=(-10e3, 10e3),
                        z=Z_FACES,
                        topology=("periodic", "periodic", "bounded")),
        GridFittedBottom(bottom))
    return {"rect": rect, "rect_bounded": rect_bb, "latlon": llg,
            "immersed": irect}


# fast tier: one representative config per grid class
@pytest.mark.parametrize("gname", ["rect", "latlon", "immersed"])
def test_zstar_invariants_split_explicit_qab2(gname):
    grid = _grids()[gname]
    run_zstar_case(grid, SplitExplicitFreeSurface(substeps=20),
                   "QuasiAdamsBashforth2")


# full tier: the wider free-surface × stepper × topology matrix
@pytest.mark.slow
@pytest.mark.parametrize("gname", ["rect", "rect_bounded", "latlon",
                                   "immersed"])
@pytest.mark.parametrize("fs", ["split_explicit", "implicit", "explicit"])
@pytest.mark.parametrize("stepper", ["QuasiAdamsBashforth2", "split_rk3"])
def test_zstar_invariants_matrix(gname, fs, stepper):
    grid = _grids()[gname]
    free_surface = {"split_explicit": SplitExplicitFreeSurface(substeps=20),
                    "implicit": ImplicitFreeSurface(),
                    "explicit": ExplicitFreeSurface()}[fs]
    dt = 5.0 if fs == "explicit" else 60.0
    run_zstar_case(grid, free_surface, stepper, n_steps=20, dt=dt)


def test_zstar_with_catke_substepped_tke():
    """z* + CATKE: the substepped TKE equation lives outside the σ-form
    tracer update (the reference also skips :e in ab2_step_tracers!), and
    the remaining tracers keep machine-exact constancy alongside it."""
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.closures.catke import CATKEVerticalDiffusivity

    grid = RectilinearGrid(size=(16, 1, 8), x=(0, 1e4), y=(0, 1e3),
                           z=(-100.0, 0),
                           topology=("periodic", "periodic", "bounded"))
    m = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=SplitExplicitFreeSurface(substeps=20),
        tracers=("b", "e", "c"), buoyancy=BuoyancyTracer(),
        closure=CATKEVerticalDiffusivity(), vertical_coordinate="zstar")
    m.set(b=lambda x, y, z: 1e-5 * z, c=1.0,
          eta=lambda x, y, z: 0.3 * jnp.sin(2 * jnp.pi * x / 1e4))
    for _ in range(20):
        m.time_step(30.0)
    c = np.asarray(m.field("c").interior)
    e = np.asarray(m.field("e").interior)
    assert np.abs(c - 1.0).max() < 1e-12
    assert np.isfinite(e).all() and (e >= 0).all()
