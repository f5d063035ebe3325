"""LatitudeLongitudeGrid tests + baroclinic-adjustment-style run (reference
analogue: test/test_lat_lon_*.jl; BASELINE config 4)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     SplitExplicitFreeSurface)


def test_latlon_grid_construction():
    g = LatitudeLongitudeGrid(size=(36, 16, 4), longitude=(0, 360),
                              latitude=(-40, 40), z=(-1000, 0))
    assert g.topology == ("periodic", "bounded", "bounded")
    assert g.N == (36, 16, 4)
    lam = g.xnodes("c")
    assert np.isclose(lam[0], 5.0)
    phi = g.ynodes("f")
    assert np.isclose(phi[0], -40) and np.isclose(phi[-1], 40)


def test_latlon_metrics():
    R = 6.371e6
    g = LatitudeLongitudeGrid(size=(36, 16, 4), longitude=(0, 360),
                              latitude=(-40, 40), z=(-1000, 0), radius=R)
    dx = np.asarray(g.dx(("c", "c", "c")))
    # dx shrinks toward the poles (|φ| = 37.5° rows vs equator rows)
    h = g.H[1]
    eq = dx[0, h + 8, 0]
    pole = dx[0, h, 0]
    assert pole < eq
    assert np.isclose(eq, R * np.cos(np.deg2rad(2.5)) * np.deg2rad(10),
                      rtol=1e-6)
    # total surface area ≈ band area (Az is broadcastable (1, ny, 1): the
    # x-extent contributes a factor Nx)
    Az = np.asarray(g.Az(("c", "c", "c")))
    total = Az[0, h:h + 16, 0].sum() * 36
    exact = 2 * np.pi * R ** 2 * (np.sin(np.deg2rad(40))
                                  - np.sin(np.deg2rad(-40)))
    assert np.isclose(total, exact, rtol=1e-10)


def test_latlon_hydrostatic_model_runs():
    g = LatitudeLongitudeGrid(size=(24, 16, 4), longitude=(0, 360),
                              latitude=(-60, 60), z=(-1000, 0))
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=SplitExplicitFreeSurface(substeps=30),
        coriolis=HydrostaticSphericalCoriolis(),
        buoyancy=BuoyancyTracer(), tracer_advection=WENO(5))
    model.set(b=lambda lam, phi, z: 1e-6 * z + 1e-8 * jnp.tanh(phi / 10),
              eta=lambda lam, phi, z: 0.01 * jnp.cos(jnp.deg2rad(lam)))
    for _ in range(5):
        model.time_step(300.0)
    for name in ("u", "v", "eta", "b"):
        assert np.all(np.isfinite(np.asarray(model.field(name).interior))), name


def test_baroclinic_adjustment_develops():
    # BASELINE config 4 (reduced): a baroclinically unstable front on a
    # lat-lon strip spins up eddy kinetic energy without blowing up
    g = LatitudeLongitudeGrid(size=(32, 32, 6), longitude=(0, 20),
                              latitude=(30, 50), z=(-1000, 0),
                              topology=("periodic", "bounded", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=SplitExplicitFreeSurface(substeps=40),
        coriolis=HydrostaticSphericalCoriolis(),
        buoyancy=BuoyancyTracer(), tracer_advection=WENO(5))
    N2, M2 = 1e-5, 1e-7

    def b0(lam, phi, z):
        return N2 * z + M2 * 1e5 * jnp.tanh((phi - 40) / 2) \
            + 1e-8 * jnp.sin(18 * jnp.deg2rad(lam))

    model.set(b=b0)
    for _ in range(10):
        model.time_step(600.0)
    u = np.asarray(model.field("u").interior)
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() > 1e-6  # front slumping generates flow


def test_spherical_coriolis_energy_conserving_zero_work():
    """The EnergyConserving Sadourny form does NO discrete work:
    Σ u·(x_f_cross_U)·V_fcc + Σ v·(y_f_cross_U)·V_cfc = 0 over a periodic-x
    lat-lon domain with impenetrable y-walls (reference:
    hydrostatic_spherical_coriolis.jl EnergyConserving()) — the defining
    property of the discretization the round-5 lat-lon fix installed."""
    import jax.numpy as jnp
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
    from oceananigans_tpu.grids.topology import LOC_CFC, LOC_FCC

    grid = LatitudeLongitudeGrid(size=(16, 12, 4), longitude=(0, 360),
                                 latitude=(-60, 60), z=(-100, 0),
                                 halo=(4, 4, 4))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=None,
        coriolis=HydrostaticSphericalCoriolis(scheme="energy_conserving"))
    rng = np.random.default_rng(7)
    model.set(u=rng.standard_normal((16, 12, 4)),
              v=rng.standard_normal((16, 12, 4)))
    g = model.grid          # the model may inflate halos
    f = model.state["fields"]
    filled = model._fill_all(f, 0.0)
    u, v = filled["u"], filled["v"]
    cor = model.coriolis
    X = -cor.x_f_cross_U(g, u, v, u)          # G_u contribution
    Y = -cor.y_f_cross_U(g, u, v, u)          # G_v contribution
    Vu = jnp.broadcast_to(jnp.asarray(g.V(LOC_FCC)), u.shape)
    Vv = jnp.broadcast_to(jnp.asarray(g.V(LOC_CFC)), v.shape)
    ii = g.interior_slices
    work = float(jnp.sum((u * X * Vu)[ii]) + jnp.sum((v * Y * Vv)[ii]))
    scale = float(jnp.sum(jnp.abs(u * X * Vu)[ii])
                  + jnp.sum(jnp.abs(v * Y * Vv)[ii]))
    assert abs(work) / scale < 1e-5, (work, scale)
    # the enstrophy-conserving form does NOT have this property pointwise
    cor2 = HydrostaticSphericalCoriolis(scheme="enstrophy_conserving")
    X2 = -cor2.x_f_cross_U(g, u, v, u)
    Y2 = -cor2.y_f_cross_U(g, u, v, u)
    w2 = float(jnp.sum((u * X2 * Vu)[ii]) + jnp.sum((v * Y2 * Vv)[ii]))
    assert abs(w2) / scale > 1e-5
