"""Reference API-surface parity shims (names from src/Oceananigans.jl's
export list that map mechanically onto existing machinery here)."""

import numpy as np

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.models import NonhydrostaticModel


def test_time_discretization_markers():
    from oceananigans_tpu.closures import (
        ExplicitTimeDiscretization, ScalarDiffusivity,
        VerticallyImplicitTimeDiscretization)
    sd = ScalarDiffusivity(
        nu=1e-2, time_discretization=VerticallyImplicitTimeDiscretization())
    assert sd.time_discretization == "vertically_implicit"
    assert ScalarDiffusivity(
        nu=0, time_discretization=ExplicitTimeDiscretization()
    ).time_discretization == "explicit"


def test_lilly_coefficient_spec():
    from oceananigans_tpu.closures import LillyCoefficient, Smagorinsky
    sm = Smagorinsky(coefficient=LillyCoefficient(smagorinsky=0.1, Pr=0.7))
    assert sm.buoyancy_modified and sm.C == 0.1 and sm.Pr == 0.7


def test_biharmonic_formulation_ctors():
    from oceananigans_tpu.closures import (
        HorizontalScalarBiharmonicDiffusivity,
        VerticalScalarBiharmonicDiffusivity)
    assert VerticalScalarBiharmonicDiffusivity(nu=1.0).formulation == "vertical"
    assert HorizontalScalarBiharmonicDiffusivity(
        nu=1.0).formulation == "horizontal"


def test_piecewise_linear_mask():
    from oceananigans_tpu.forcings import PiecewiseLinearMask
    m = PiecewiseLinearMask(center=0.0, width=2.0)
    assert float(m(0, 0, 0.0)) == 1.0
    assert float(m(0, 0, 1.0)) == 0.5
    assert float(m(0, 0, 3.0)) == 0.0


def test_formulation_and_coordinate_markers():
    from oceananigans_tpu.models.hydrostatic import (ZCoordinate,
                                                     ZStarCoordinate)
    from oceananigans_tpu.models.shallow_water import (
        ConservativeFormulation, VectorInvariantFormulation)
    assert ConservativeFormulation() == "conservative"
    assert VectorInvariantFormulation() == "vector_invariant"
    assert ZCoordinate() == "z"
    assert ZStarCoordinate() == "zstar"


def test_minimum_spacing_aliases():
    grid = RectilinearGrid(size=(8, 4, 2), extent=(8.0, 8.0, 8.0))
    assert np.isclose(grid.minimum_xspacing(), 1.0)
    assert np.isclose(grid.minimum_yspacing(), 2.0)
    assert np.isclose(grid.minimum_zspacing(), 4.0)


def test_buoyancy_and_pressure_fields():
    from oceananigans_tpu.models.diagnostic_operations import (BuoyancyField,
                                                               PressureField)
    grid = RectilinearGrid(size=(8, 8), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid, tracers=("b",),
                                buoyancy=BuoyancyTracer())
    model.set(b=lambda x, y, z: x)
    b = np.asarray(BuoyancyField(model).interior)
    assert np.isfinite(b).all() and b.std() > 0
    assert PressureField(model).interior.shape[0] == 8


def test_conjure_time_step_wizard():
    from oceananigans_tpu.simulation import Simulation
    from oceananigans_tpu.simulation.diagnostics import (
        conjure_time_step_wizard)
    grid = RectilinearGrid(size=(8, 8), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid)
    model.set(u=0.1 * np.random.default_rng(0).standard_normal((8, 8)))
    sim = Simulation(model, dt=1e-3, stop_iteration=25)
    conjure_time_step_wizard(sim, cfl=0.5)
    sim.run()
    assert "time_step_wizard" in sim.callbacks
    assert sim.dt != 1e-3          # wizard adapted the step


def test_averaged_time_interval_writer_and_field_dataset(tmp_path):
    from oceananigans_tpu.simulation import Simulation
    from oceananigans_tpu.simulation.output_readers import (FieldDataset,
                                                            written_names)
    from oceananigans_tpu.simulation.output_writers import (
        AveragedTimeInterval, FieldWriter)
    grid = RectilinearGrid(size=(8, 8), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid, tracers=("b",),
                                buoyancy=BuoyancyTracer())
    model.set(b=lambda x, y, z: x)
    d = str(tmp_path / "avg")
    sim = Simulation(model, dt=0.05, stop_iteration=60)
    sim.add_output_writer(FieldWriter(
        model, dict(b="b"), d, schedule=AveragedTimeInterval(1.0, window=0.5)))
    sim.run()
    assert written_names(d) == ["b"]
    ds = FieldDataset(d)
    assert len(ds.b.times) >= 2
    assert np.isfinite(ds.b[0]).all()


def test_averaged_time_interval_truly_averages(tmp_path):
    """Regression: the default-window AveragedTimeInterval must write window
    averages, not instantaneous snapshots (the forced iteration-0 output
    must not desync the averaging windows)."""
    import json
    import os

    from oceananigans_tpu.simulation import Simulation
    from oceananigans_tpu.simulation.output_writers import (
        AveragedTimeInterval, FieldWriter)

    grid = RectilinearGrid(size=(4, 4), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid)
    d = str(tmp_path / "avg2")
    sim = Simulation(model, dt=0.05, stop_iteration=60)
    sim.add_output_writer(FieldWriter(
        model, {"t": lambda m: np.asarray([m.time])}, d,
        schedule=AveragedTimeInterval(1.0)))
    sim.run()
    idx = json.load(open(os.path.join(d, "series.json")))
    # the [t-1, t] window average of "model time" is t - 0.5 (+dt/2 bias)
    for t, it in zip(idx["times"], idx["iterations"]):
        if t == 0.0:
            continue          # forced initial output is instantaneous
        v = float(np.load(os.path.join(d, f"t_{it}.npy"))[0])
        assert abs(v - (t - 0.5)) < 0.06, (t, v)


def test_averaged_time_interval_stride_and_timedelta():
    import datetime as dtm

    from oceananigans_tpu.simulation.output_writers import (
        AveragedTimeInterval, WindowedTimeAverage)

    s = AveragedTimeInterval(dtm.timedelta(hours=1),
                             window=dtm.timedelta(minutes=30), stride=2)
    assert s.interval == 3600.0 and s.window == 1800.0 and s.stride == 2

    class _M:
        time = 0.0
        iteration = 0

    m = _M()
    w = WindowedTimeAverage(lambda model: np.asarray([model.time]),
                            1.0, window=1.0, stride=2)
    for k in range(11):
        m.time = k * 0.1
        w.collect(m)
    # stride=2 keeps samples at t = 0.0, 0.2, ..., 1.0 (6 of 11)
    assert w._count == 6, w._count


def test_lilly_coefficient_inherits_model_buoyancy():
    """Smagorinsky(coefficient=LillyCoefficient(...)) must actually apply
    the Lilly stability correction: the model injects its buoyancy
    formulation into the closure (regression: the correction was silently
    skipped because closure.buoyancy stayed None)."""
    from oceananigans_tpu.closures import LillyCoefficient, Smagorinsky

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0))
    closure = Smagorinsky(coefficient=LillyCoefficient())
    model = NonhydrostaticModel(grid=grid, tracers=("b",),
                                buoyancy=BuoyancyTracer(), closure=closure)
    assert closure.buoyancy is model.buoyancy
    # stable stratification reduces the eddy viscosity vs neutral
    rng = np.random.default_rng(0)
    model.set(u=0.1 * rng.standard_normal((8, 8, 8)),
              b=lambda x, y, z: 25.0 * z)
    f = model._fill_all(model.state["fields"], 0.0)
    aux_strat = closure.compute_diffusivities(model.grid, f, 0.0)
    model.set(b=0.0)
    f0 = model._fill_all(model.state["fields"], 0.0)
    aux_neut = closure.compute_diffusivities(model.grid, f0, 0.0)
    sl = model.grid.interior_slices
    nu_s = float(np.mean(np.asarray(aux_strat["nu_e"])[sl]))
    nu_n = float(np.mean(np.asarray(aux_neut["nu_e"])[sl]))
    assert nu_s < 0.2 * nu_n, (nu_s, nu_n)


def test_horizontal_divergence_damping_closures():
    """HorizontalDivergence(Scalar|ScalarBiharmonic)Diffusivity damp only
    the divergent mode: a discretely divergence-free flow gets zero
    tendency; a divergent flow is damped."""
    import jax.numpy as jnp

    from oceananigans_tpu.closures import (
        HorizontalDivergenceScalarBiharmonicDiffusivity,
        HorizontalDivergenceScalarDiffusivity)

    grid = RectilinearGrid(size=(32, 32), extent=(2 * np.pi, 2 * np.pi),
                           topology=("periodic", "periodic", "flat"))
    for closure in (HorizontalDivergenceScalarDiffusivity(nu=0.1),
                    HorizontalDivergenceScalarBiharmonicDiffusivity(nu=0.1)):
        m = NonhydrostaticModel(grid=grid, closure=closure)
        xf, yc = np.meshgrid(grid.xnodes("f"), grid.ynodes("c"),
                             indexing="ij")
        xc, yf = np.meshgrid(grid.xnodes("c"), grid.ynodes("f"),
                             indexing="ij")
        sl = m.grid.interior_slices
        # rotational (discretely divergence-free): zero tendency
        m.set(u=np.sin(xf) * np.cos(yc), v=-np.cos(xc) * np.sin(yf))
        f0 = m._fill_all(m.state["fields"], 0.0)
        G = closure.momentum_tendencies(m.grid, f0, {})
        assert float(jnp.abs(G["u"][sl]).max()) < 1e-5
        # divergent: damping opposes the divergence (set must not
        # project the divergent mode away for this check)
        m.set(u=np.sin(xf) * np.cos(yc), v=np.cos(xc) * np.sin(yf),
              enforce_incompressibility=False)
        f1 = m._fill_all(m.state["fields"], 0.0)
        G1 = closure.momentum_tendencies(m.grid, f1, {})
        assert float(jnp.abs(G1["u"][sl]).max()) > 1e-3


def test_flux_tapering_and_extractors():
    from oceananigans_tpu.closures import (FluxTapering,
                                           IsopycnalSkewSymmetricDiffusivity,
                                           ScalarDiffusivity, SmagorinskyLilly,
                                           TriadIsopycnalSkewSymmetricDiffusivity,
                                           diffusivity, viscosity)
    iso = IsopycnalSkewSymmetricDiffusivity(kappa_redi=100.0,
                                            slope_limiter=FluxTapering(5e-3))
    assert iso.maximum_slope == 5e-3
    tri = TriadIsopycnalSkewSymmetricDiffusivity(
        kappa_skew=10.0, slope_limiter=FluxTapering(2e-3))
    assert tri.maximum_slope == 2e-3
    assert viscosity(SmagorinskyLilly(), {"nu_e": 7}) == 7
    sd = ScalarDiffusivity(nu=1e-2, kappa={"b": 3e-2})
    assert viscosity(sd, {}) == 1e-2
    assert diffusivity(sd, {}, "b") == 3e-2
