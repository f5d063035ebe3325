"""Reference API-surface parity shims (names from src/Oceananigans.jl's
export list that map mechanically onto existing machinery here)."""

import numpy as np
import pytest

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
    # stride=2 keeps samples at t = 0.0, 0.2, ..., 1.0 (6 of 11); since
    # round 5 samples are dt-WEIGHTED (the t=0 anchor carries no weight),
    # so the window weight sums to 1.0 and the average of f(t)=t is the
    # left-Riemann 0.2·(0.2+0.4+0.6+0.8+1.0) = 0.6
    assert abs(w._wsum - 1.0) < 1e-12, w._wsum
    out = w.result()
    assert abs(float(out[0]) - 0.6) < 1e-12, out


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


def test_reference_export_surface():
    """Every name in the reference's export list (src/Oceananigans.jl:7-118)
    resolves at the top level, modulo the documented mappings: λ/φ → lambda_/
    phi_, ∂x/∂y/∂z → partial_*, set!/compute!/run!/time_step! → methods or
    free functions without the bang, TEOS10 == TEOS10EquationOfState,
    JLD2Writer == FieldWriter. MultiRegion/apply_regionally names are
    deliberate design divergences (PARITY.md) — superseded by mesh sharding
    and the cubed-sphere panel axis."""
    import oceananigans_tpu as ot

    exported = """
    CPU GPU Center Face Periodic Bounded Flat
    RectilinearGrid LatitudeLongitudeGrid OrthogonalSphericalShellGrid
    TripolarGrid ExponentialDiscretization ReferenceToStretchedDiscretization
    PowerLawStretching LinearStretching
    nodes xnodes ynodes rnodes znodes lambda_nodes phi_nodes
    xspacings yspacings rspacings zspacings
    minimum_xspacing minimum_yspacing minimum_zspacing
    xspacing yspacing zspacing xarea yarea zarea volume
    ImmersedBoundaryGrid GridFittedBoundary GridFittedBottom
    PartialCellBottom ImmersedBoundaryCondition
    Distributed Partition
    Centered UpwindBiased WENO VectorInvariant WENOVectorInvariant
    FluxFormAdvection
    BoundaryCondition FluxBoundaryCondition ValueBoundaryCondition
    GradientBoundaryCondition OpenBoundaryCondition PerturbationAdvection
    FieldBoundaryConditions
    Field CenterField XFaceField YFaceField ZFaceField
    Average Integral CumulativeIntegral Reduction Accumulation
    BackgroundField interior compute regrid
    Forcing Relaxation LinearTarget GaussianMask PiecewiseLinearMask
    AdvectiveForcing
    FPlane ConstantCartesianCoriolis BetaPlane NonTraditionalBetaPlane
    BuoyancyForce BuoyancyTracer SeawaterBuoyancy LinearEquationOfState
    TEOS10 BuoyancyField
    UniformStokesDrift StokesDrift
    VerticalScalarDiffusivity HorizontalScalarDiffusivity ScalarDiffusivity
    VerticalScalarBiharmonicDiffusivity HorizontalScalarBiharmonicDiffusivity
    ScalarBiharmonicDiffusivity SmagorinskyLilly Smagorinsky LillyCoefficient
    DynamicCoefficient AnisotropicMinimumDissipation
    ConvectiveAdjustmentVerticalDiffusivity CATKEVerticalDiffusivity
    TKEDissipationVerticalDiffusivity RiBasedVerticalDiffusivity
    VerticallyImplicitTimeDiscretization viscosity diffusivity
    LagrangianParticles DroguedParticleDynamics
    NonhydrostaticModel HydrostaticFreeSurfaceModel ShallowWaterModel
    ConservativeFormulation VectorInvariantFormulation PressureField
    ZCoordinate ZStarCoordinate
    ExplicitFreeSurface ImplicitFreeSurface SplitExplicitFreeSurface
    HydrostaticSphericalCoriolis PrescribedVelocityFields
    Clock TimeStepWizard conjure_time_step_wizard time_step
    Simulation run Callback iteration
    iteration_limit_exceeded stop_time_exceeded wall_time_limit_exceeded
    CFL AdvectiveCFL DiffusiveCFL
    NetCDFWriter JLD2Writer Checkpointer
    TimeInterval IterationInterval WallTimeInterval AveragedTimeInterval
    SpecifiedTimes FileSizeLimit AndSchedule OrSchedule written_names
    FieldTimeSeries FieldDataset InMemory OnDisk
    at KernelFunctionOperation
    ConformalCubedSphereGrid prettytime
    """.split()
    missing = [n for n in exported if not hasattr(ot, n)]
    assert not missing, f"top-level names missing: {missing}"


def test_free_function_api():
    import jax.numpy as jnp
    import oceananigans_tpu as ot

    grid = RectilinearGrid(size=(8, 8, 4), extent=(1.0, 2.0, 3.0))
    assert np.isclose(ot.minimum_yspacing(grid), 0.25)
    x = np.asarray(ot.xnodes(grid, ot.Center()))
    assert x.shape == (8,) and np.isclose(x[0], 1 / 16)
    assert np.isclose(float(ot.volume(grid, ("c", "c", "c"))),
                      (1 / 8) * (2 / 8) * (3 / 4))

    model = NonhydrostaticModel(grid=grid, tracers=("c",))
    model.set(c=lambda x, y, z: x)
    ot.time_step(model, 1e-3)
    assert ot.iteration(model) == 1
    assert np.all(np.isfinite(np.asarray(ot.interior(model.field("c")))))


def test_reduction_accumulation_scans():
    import oceananigans_tpu as ot

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0))
    model = NonhydrostaticModel(grid=grid, tracers=("c",))
    model.set(c=lambda x, y, z: z)
    c = model.field("c")
    mx = ot.Reduction("maximum", c, dims=2)
    # extent z convention: z in (-Lz, 0), top cell center at -1/8
    got = np.asarray(mx.interior).squeeze()
    assert got.shape == (4, 4) and np.allclose(got, -1 / 8, atol=1e-6)
    acc = ot.Accumulation("cumsum", c, dims=2)
    a = np.asarray(acc.interior)
    assert a.shape == (4, 4, 4)
    assert np.allclose(a[0, 0], np.cumsum(np.asarray(c.interior)[0, 0]))


def test_file_size_limit_schedule(tmp_path):
    import oceananigans_tpu as ot

    p = tmp_path / "out.bin"
    sched = ot.FileSizeLimit(64, str(p))
    assert not sched(None)
    p.write_bytes(b"x" * 100)
    assert sched(None)


def test_clock_constructor():
    import oceananigans_tpu as ot

    c = ot.Clock(time=3.5, iteration=7)
    assert float(c["time"]) == 3.5 and int(c["iteration"]) == 7
    assert not np.isfinite(float(c["last_dt"]))


def test_unicode_curvilinear_aliases():
    """λnodes/φnodes/λspacings/φspacings export-list parity
    (src/Oceananigans.jl exports; λ and φ are valid Python identifiers)."""
    import oceananigans_tpu as ot

    grid = ot.LatitudeLongitudeGrid(size=(8, 4, 2),
                                    longitude=(0.0, 40.0),
                                    latitude=(-10.0, 10.0), z=(-1.0, 0.0))
    assert np.allclose(ot.λnodes(grid, "c"), ot.lambda_nodes(grid, "c"))
    assert np.allclose(ot.φnodes(grid, "c"), ot.phi_nodes(grid, "c"))
    assert np.allclose(np.asarray(ot.λspacings(grid, "c")), 5.0)
    assert np.allclose(np.asarray(ot.φspacings(grid, "c")), 5.0)
    assert np.allclose(np.asarray(ot.λspacing(grid, "f")), 5.0)
    assert np.allclose(np.asarray(ot.φspacing(grid, "f")), 5.0)


def test_heptadiagonal_solver_method_maps_to_pcg():
    """Reference solver_method :HeptadiagonalIterativeSolver assembles the
    same vertically-integrated Helmholtz operator as a sparse matrix
    (matrix_implicit_free_surface_solver.jl); here it maps onto the
    matrix-free CG applying the identical operator."""
    import oceananigans_tpu as ot
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel

    grid = ot.LatitudeLongitudeGrid(size=(8, 8, 4),
                                    longitude=(0.0, 10.0),
                                    latitude=(-5.0, 5.0), z=(-100.0, 0.0))
    fs = ot.ImplicitFreeSurface(solver_method="HeptadiagonalIterativeSolver")
    model = HydrostaticFreeSurfaceModel(grid=grid, free_surface=fs,
                                        tracers=())
    assert model._ifs_method == "PreconditionedConjugateGradient"
    model.time_step(60.0)
    eta = np.asarray(model.field("eta").interior)
    assert np.all(np.isfinite(eta))


def test_reference_export_aliases():
    """Late round-5 export-list diff vs src/Oceananigans.jl: the set! free
    function, MultiRegion partition aliases, and the Derivative operation."""
    import oceananigans_tpu as ot
    grid = ot.RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                              topology=("periodic", "periodic", "bounded"))
    f = ot.CenterField(grid)
    ot.set(f, 3.0)                       # set!(field, value)
    np.testing.assert_allclose(np.asarray(f.interior), 3.0)
    p = ot.XPartition(4)
    assert (p.x, p.y) == (4, 1)
    p = ot.YPartition(2)
    assert (p.x, p.y) == (1, 2)
    with pytest.raises(NotImplementedError):
        ot.CubedSpherePartition(1, 1)
    d = ot.Derivative(f, 0)
    assert np.isfinite(np.asarray(d.interior)).all()
