"""CATKE substepped TKE equation + surface TKE flux tests (reference:
time_step_catke_equation.jl, tke_top_boundary_condition.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.boundary_conditions.boundary_condition import (
    FieldBoundaryConditions, FluxBoundaryCondition)
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.closures.catke import CATKEVerticalDiffusivity
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel


def _wind_mixing_model(tau=-1e-4, N2=1e-5, nz=32, H=64.0, dt_tke=None):
    grid = RectilinearGrid(size=(1, 1, nz), z=(-H, 0.0),
                           topology=("flat", "flat", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        closure=CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer(),
                                         tke_time_step=dt_tke),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBoundaryCondition(tau))})
    model.set(b=lambda x, y, z: N2 * z)
    return model


def test_surface_tke_flux_from_momentum_bc():
    """The e top flux BC is auto-installed from the u/v top flux BCs:
    J_e = -Cw_ustar * u*^3 with u* = |tau|^(1/2) (reference:
    friction_velocity + _top_tke_flux, catke_equation.jl:109-119)."""
    model = _wind_mixing_model(tau=-1e-4)
    assert model._substepped_tke
    bc = model.bcs["e"].top
    assert bc is not None and callable(bc.condition)
    J = float(bc.condition(0.0, 0.0, 0.0))
    ustar = 1e-2  # (tau^2)^(1/4)
    assert J == pytest.approx(-3.179 * ustar ** 3, rel=1e-6)
    # TKE is injected: after one step e > 0 at the surface
    model.time_step(60.0)
    e = np.asarray(model.field("e").interior)[0, 0]
    assert e[-1] > 0 and np.isfinite(e).all()


def test_wind_mixing_deepening():
    """Mixed-layer deepening under constant wind stress roughly follows the
    Pollard-Rhines scaling h ~ 1.05 u* sqrt(t/N) (the reference's documented
    CATKE column behavior for wind-driven mixing)."""
    N2 = 1e-5
    model = _wind_mixing_model(tau=-1e-4, N2=N2)
    dt = 120.0
    for _ in range(360):          # 12 h
        model.time_step(dt)
    b = np.asarray(model.field("b").interior)[0, 0]
    e = np.asarray(model.field("e").interior)[0, 0]
    z = model.grid.znodes("c")
    assert np.isfinite(b).all() and (e >= 0).all()
    # mixed-layer depth: shallowest z where b deviates from the initial
    # stratification by more than 10% of the local value
    b0 = N2 * z
    mixed = np.abs(b - b0) > 0.1 * np.abs(b0)
    assert mixed.any(), "no mixing happened"
    h_model = -z[mixed].min()
    t = 360 * dt
    h_pr = 1.05 * 1e-2 * np.sqrt(t / np.sqrt(N2))
    assert 0.4 * h_pr < h_model < 2.5 * h_pr, (h_model, h_pr)
    # TKE is concentrated in the mixed layer
    assert e[-1] > e[0]


def test_tke_substep_count_and_consistency():
    """M = ceil(dt/dt_tke) substeps (reference: get_time_step +
    calculate M); the substepped result stays close to the single-solve
    result over a short run."""
    m1 = _wind_mixing_model(dt_tke=None)
    m4 = _wind_mixing_model(dt_tke=15.0)
    assert m4.closure.substeps_for(60.0) == 4
    assert m4.closure.substeps_for(1.0) == 1
    for _ in range(30):
        m1.time_step(60.0)
        m4.time_step(60.0)
    e1 = np.asarray(m1.field("e").interior)[0, 0]
    e4 = np.asarray(m4.field("e").interior)[0, 0]
    assert np.isfinite(e4).all() and (e4 >= 0).all()
    # same physics, finer TKE time resolution: order-of-magnitude agreement
    assert abs(e4.sum() - e1.sum()) < 0.5 * (abs(e1.sum()) + 1e-12)


def test_unforced_column_stays_quiet():
    """No surface forcing, stable stratification: TKE stays (near) zero and
    the stratification is preserved."""
    grid = RectilinearGrid(size=(1, 1, 16), z=(-50.0, 0.0),
                           topology=("flat", "flat", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        closure=CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()))
    model.set(b=lambda x, y, z: 1e-5 * z)
    for _ in range(20):
        model.time_step(60.0)
    e = np.asarray(model.field("e").interior)[0, 0]
    b = np.asarray(model.field("b").interior)[0, 0]
    assert np.abs(e).max() < 1e-8
    assert (np.diff(b) > -1e-9).all()


# -- k-ε variable stability functions (reference:
# tke_dissipation_stability_functions.jl) --------------------------------------

def test_keps_stability_function_check_values():
    from oceananigans_tpu.closures.tke_dissipation import (
        ConstantStabilityFunctions, VariableStabilityFunctions)
    sf = VariableStabilityFunctions()
    # log-layer 𝕊u₀ from the U&B (2003) eq. 13 balance with the default
    # coefficients lands on ~0.533 (the constant-function value is 0.53)
    assert sf.Su0 == pytest.approx(0.53296, abs=2e-4)
    # free-convection αᴺ bound (U&B 2005 eq. A.22, ×0.73 safety)
    assert sf.minimum_stratification_number() == pytest.approx(-2.294,
                                                               abs=2e-3)
    # neutral limit: 𝕊u(0,0) = Cu₀/Cd₀
    Su, Sc = sf.evaluate(0.0, 0.0)
    assert Su == pytest.approx(0.1067) and Sc == pytest.approx(0.1120)
    csf = ConstantStabilityFunctions()
    assert csf.evaluate(5.0, 3.0) == (0.53, 0.53)


def test_keps_prandtl_number_increases_with_stratification():
    """Ri-dependent turbulent Prandtl number: Pr = 𝕊u/𝕊c grows with the
    stratification number αᴺ (the physical content of the variable
    stability functions the constant-Cμ model lacks)."""
    from oceananigans_tpu.closures.tke_dissipation import (
        VariableStabilityFunctions)
    sf = VariableStabilityFunctions()
    prs = []
    for aN in (0.0, 5.0, 20.0, 100.0):
        aM = min(1.0, float(sf.maximum_shear_number(aN)))
        Su, Sc = sf.evaluate(aN, aM)
        prs.append(Su / Sc)
    assert all(np.diff(prs) > 0), prs
    Su0, Sc0 = sf.evaluate(0.0, 0.0)
    assert Su0 / Sc0 == pytest.approx(0.1067 / 0.1120, rel=1e-6)


def test_keps_column_with_variable_stability_functions():
    """Wind-forced k-ε column: TKE and ε stay positive-finite, mixing
    deepens the surface layer, and κu respects the dissipation floor."""
    from oceananigans_tpu.closures.tke_dissipation import (
        TKEDissipationVerticalDiffusivity)
    grid = RectilinearGrid(size=(1, 1, 24), z=(-50.0, 0.0),
                           topology=("flat", "flat", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        closure=TKEDissipationVerticalDiffusivity(buoyancy=BuoyancyTracer()),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4)),
            "e": FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-7))})
    model.set(b=lambda x, y, z: 1e-5 * z, e=1e-6, eps=1e-9)
    for _ in range(120):
        model.time_step(60.0)
    e = np.asarray(model.field("e").interior)[0, 0]
    eps = np.asarray(model.field("eps").interior)[0, 0]
    b = np.asarray(model.field("b").interior)[0, 0]
    assert np.isfinite(e).all() and np.isfinite(eps).all()
    assert (e >= 0).all() and (eps >= 0).all()
    assert e[-1] > e[0]           # turbulence near the surface
    assert np.isfinite(b).all()


def test_catke_split_rk3():
    """CATKE under the SplitRK3 stepper: per-stage Euler TKE step
    (reference: the SplitRungeKutta3TimeStepper variant of
    time_step_catke_equation.jl)."""
    grid = RectilinearGrid(size=(1, 1, 24), z=(-50.0, 0.0),
                           topology=("flat", "flat", "bounded"))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        closure=CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
        timestepper="SplitRungeKutta3",
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4))})
    assert model._substepped_tke
    model.set(b=lambda x, y, z: 1e-5 * z)
    for _ in range(60):
        model.time_step(60.0)
    e = np.asarray(model.field("e").interior)[0, 0]
    b = np.asarray(model.field("b").interior)[0, 0]
    assert np.isfinite(e).all() and (e >= 0).all()
    assert e[-1] > 1e-6          # wind-driven TKE near the surface
    assert np.isfinite(b).all()


def test_keps_substepping_and_friction_velocity():
    """k-ε substepped (e, ε) equations (reference:
    time_step_tke_dissipation_equations!, tke_dissipation_equations.jl:
    23-98): M = ceil(dt/dt_keps) substeps, u* auto-derived from the u top
    flux BC for the ε Charnock roughness, results consistent with the
    single-substep run."""
    from oceananigans_tpu.closures.tke_dissipation import (
        TKEDissipationVerticalDiffusivity)

    def make(dt_keps):
        grid = RectilinearGrid(size=(1, 1, 24), z=(-50.0, 0.0),
                               topology=("flat", "flat", "bounded"))
        model = HydrostaticFreeSurfaceModel(
            grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
            closure=TKEDissipationVerticalDiffusivity(
                buoyancy=BuoyancyTracer(),
                tke_dissipation_time_step=dt_keps),
            boundary_conditions={
                "u": FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4))})
        model.set(b=lambda x, y, z: 1e-5 * z, e=1e-6, eps=1e-9)
        return model

    m1 = make(None)
    m4 = make(15.0)
    assert m4._substepped_tke
    assert m4.closure.substeps_for(60.0) == 4
    # u* = (tau^2)^(1/4) derived from the u top flux BC
    assert m4.closure.friction_velocity == pytest.approx(1e-2, rel=1e-6)
    for _ in range(60):
        m1.time_step(60.0)
        m4.time_step(60.0)
    for m in (m1, m4):
        e = np.asarray(m.field("e").interior)[0, 0]
        eps = np.asarray(m.field("eps").interior)[0, 0]
        assert np.isfinite(e).all() and np.isfinite(eps).all()
        assert (e >= 0).all() and (eps > 0).all()
        assert e[-1] > e[0]
    e1 = np.asarray(m1.field("e").interior)[0, 0]
    e4 = np.asarray(m4.field("e").interior)[0, 0]
    assert abs(e4.sum() - e1.sum()) < 0.5 * (abs(e1.sum()) + 1e-12)


def test_catke_inside_closure_tuple():
    """A ClosureTuple containing CATKE drives the substepped TKE path
    exactly like the bare closure (reference: closure tuples unwrapped by
    time_step_catke_equation.jl); a zero-diffusivity partner changes
    nothing."""
    from oceananigans_tpu.closures import ClosureTuple, ScalarDiffusivity

    def make(closure):
        grid = RectilinearGrid(size=(1, 1, 24), z=(-50.0, 0.0),
                               topology=("flat", "flat", "bounded"))
        model = HydrostaticFreeSurfaceModel(
            grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
            closure=closure,
            boundary_conditions={
                "u": FieldBoundaryConditions(top=FluxBoundaryCondition(-1e-4))})
        model.set(b=lambda x, y, z: 1e-5 * z)
        return model

    bare = make(CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()))
    tup = make(ClosureTuple(ScalarDiffusivity(nu=0.0, kappa=0.0),
                            CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer())))
    assert tup._substepped_tke
    assert tup._substepped_names == ("e",)
    # the surface TKE flux BC is installed through the tuple
    assert tup.bcs["e"].top is not None and callable(tup.bcs["e"].top.condition)
    for _ in range(30):
        bare.time_step(60.0)
        tup.time_step(60.0)
    eb = np.asarray(bare.field("e").interior)[0, 0]
    et = np.asarray(tup.field("e").interior)[0, 0]
    bb = np.asarray(bare.field("b").interior)[0, 0]
    bt = np.asarray(tup.field("b").interior)[0, 0]
    assert np.allclose(et, eb, rtol=1e-10, atol=1e-14)
    assert np.allclose(bt, bb, rtol=1e-10, atol=1e-14)
