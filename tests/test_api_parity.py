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
