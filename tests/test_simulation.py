"""Simulation / schedules / output / checkpoint tests (reference analogue:
test/test_simulations.jl, test_schedules.jl, test_output_writers.jl,
test_checkpointer.jl)."""

import json
import os

import numpy as np
import jax.numpy as jnp

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation import Simulation
from oceananigans_tpu.simulation.checkpointer import Checkpointer, restore
from oceananigans_tpu.simulation.diagnostics import (AdvectiveCFL,
                                                     TimeStepWizard)
from oceananigans_tpu.simulation.output_writers import FieldWriter
from oceananigans_tpu.utils.schedules import (IterationInterval, SpecifiedTimes,
                                              TimeInterval)


def tiny_model():
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1))
    m = NonhydrostaticModel(grid=grid, tracers=("c",))
    m.set(u=lambda x, y, z: 0.01 * jnp.sin(2 * jnp.pi * x))
    return m


def test_run_until_stop_time():
    sim = Simulation(tiny_model(), dt=0.01, stop_time=0.1)
    sim.run()
    assert np.isclose(sim.model.time, 0.1, atol=1e-9)


def test_run_until_stop_iteration():
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=7)
    sim.run()
    assert sim.model.iteration == 7


def test_callback_iteration_interval():
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=10)
    count = []
    sim.add_callback(lambda s: count.append(s.model.iteration),
                     IterationInterval(2))
    sim.run()
    assert count == [2, 4, 6, 8, 10]


def test_time_interval_schedule_aligns_dt():
    sim = Simulation(tiny_model(), dt=0.03, stop_time=0.1)
    times = []
    sim.add_callback(lambda s: times.append(s.model.time), TimeInterval(0.05))
    sim.run()
    # the dt was shrunk to land exactly on 0.05 and 0.10
    assert any(np.isclose(t, 0.05, atol=1e-9) for t in times)
    assert any(np.isclose(t, 0.10, atol=1e-9) for t in times)


def test_specified_times_schedule():
    sim = Simulation(tiny_model(), dt=0.03, stop_time=0.12)
    times = []
    sim.add_callback(lambda s: times.append(s.model.time),
                     SpecifiedTimes(0.04, 0.11))
    sim.run()
    assert np.isclose(times[0], 0.04, atol=1e-9)
    assert np.isclose(times[1], 0.11, atol=1e-9)


def test_field_writer_and_reader(tmp_path):
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=4)
    path = str(tmp_path / "out")
    w = FieldWriter(sim.model, outputs={"u": "u", "c": "c"}, path=path,
                    schedule=IterationInterval(2))
    sim.add_output_writer(w)
    sim.run()
    index = json.load(open(os.path.join(path, "series.json")))
    assert index["iterations"] == [0, 2, 4]
    u2 = np.load(os.path.join(path, "u_2.npy"))
    assert u2.shape == (8, 8, 4)


def test_checkpoint_restore_bitwise(tmp_path):
    m1 = tiny_model()
    sim = Simulation(m1, dt=0.01, stop_iteration=5)
    ck = Checkpointer(m1, schedule=IterationInterval(5), dir=str(tmp_path))
    sim.add_output_writer(ck)
    sim.run()
    path = ck.path(5)
    assert os.path.exists(path)
    u5 = np.asarray(m1.state["fields"]["u"]).copy()

    # restore into a fresh model and continue: must match a straight run
    m2 = tiny_model()
    restore(m2, path)
    assert np.array_equal(np.asarray(m2.state["fields"]["u"]), u5)
    assert m2.iteration == 5
    m1.time_step(0.01)
    m2.time_step(0.01)
    assert np.allclose(np.asarray(m1.state["fields"]["u"]),
                       np.asarray(m2.state["fields"]["u"]), atol=0)


def test_time_step_wizard():
    m = tiny_model()
    m.set(u=1.0)  # fast flow
    wiz = TimeStepWizard(cfl=0.5, max_change=1.5, min_change=0.1)
    new = wiz.new_dt(m, 1.0)
    # dt limited toward cfl * dx/u = 0.5 * 0.125 but clamped by min_change
    assert new == 0.1
    cfl = AdvectiveCFL(new)(m)
    assert cfl > 0


def test_nan_checker_aborts():
    m = tiny_model()
    ints = m.grid.interior_slices
    iidx = (ints[0].start + 2, ints[1].start + 2, ints[2].start + 1)
    m.state["fields"]["u"] = m.state["fields"]["u"].at[iidx].set(np.nan)
    sim = Simulation(m, dt=0.01, stop_iteration=200)
    try:
        sim.run()
        raised = False
    except RuntimeError as e:
        raised = "NaN" in str(e)
    assert raised


def test_windowed_time_average():
    from oceananigans_tpu.simulation.output_writers import WindowedTimeAverage
    m = tiny_model()
    sim = Simulation(m, dt=0.01, stop_iteration=20)
    wta = WindowedTimeAverage(lambda model: model.field("u"),
                              interval=0.1, window=0.1)
    sim.add_callback(lambda s: wta.collect(s.model), IterationInterval(1))
    sim.run()
    result = wta.result()
    assert result is not None
    assert result.shape == (8, 8, 4)
    assert np.all(np.isfinite(result))


def test_field_time_series_reader(tmp_path):
    from oceananigans_tpu.simulation.output_readers import FieldTimeSeries
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=6)
    path = str(tmp_path / "series")
    w = FieldWriter(sim.model, outputs={"u": "u"}, path=path,
                    schedule=IterationInterval(2))
    sim.add_output_writer(w)
    sim.run()
    fts = FieldTimeSeries(path, "u")
    assert len(fts) == 4  # iterations 0, 2, 4, 6
    assert fts[0].shape == (8, 8, 4)
    # time interpolation between snapshots
    mid = fts.at_time(0.03)
    assert np.all(np.isfinite(mid))
    lazy = FieldTimeSeries(path, "u", backend="on_disk")
    assert np.allclose(lazy[2], fts[2])


def test_variance_dissipation_diagnostic():
    from oceananigans_tpu.simulation.variance_dissipation import (
        VarianceDissipation)
    from oceananigans_tpu.advection import WENO as _W
    grid = RectilinearGrid(size=(16, 16, 4), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    m = NonhydrostaticModel(grid=grid, advection=_W(5), tracers=("c",))
    rng2 = np.random.default_rng(3)
    m.set(u=0.1 * rng2.standard_normal((16, 16, 4)),
          c=rng2.random((16, 16, 4)))
    vd = VarianceDissipation(m, "c", kappa=1e-3)
    out = vd()
    assert set(out) == {"chi_advection", "variance", "chi_diffusion"}
    assert out["variance"] > 0
    # upwind-biased WENO dissipates variance (χ_adv > 0)
    assert out["chi_advection"] > 0
    assert out["chi_diffusion"] > 0


def test_netcdf_writer(tmp_path):
    from oceananigans_tpu.simulation.netcdf_writer import NetCDFWriter
    from scipy.io import netcdf_file
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=4)
    path = str(tmp_path / "out.nc")
    w = NetCDFWriter(sim.model, outputs={"u": "u", "c": "c"}, filename=path,
                     schedule=IterationInterval(2))
    sim.add_output_writer(w)
    sim.run()
    w.close()
    with netcdf_file(path, "r") as f:
        assert f.variables["u"].shape[0] == 3  # iterations 0, 2, 4
        assert f.variables["u"].shape[1:] == (8, 8, 4)
        t = np.asarray(f.variables["time"][:])
        assert np.allclose(t, [0.0, 0.02, 0.04])


def test_hdf5_writer(tmp_path):
    """HDF5Writer (JLD2 analogue, reference: jld2_writer.jl): timeseries
    layout, grid metadata, file splitting."""
    import h5py
    from oceananigans_tpu.simulation.hdf5_writer import HDF5Writer
    from oceananigans_tpu.utils.schedules import IterationInterval

    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=6)
    path = str(tmp_path / "out.h5")
    w = HDF5Writer(sim.model, outputs={"u": "u", "mean_c": lambda m:
                                       np.asarray(m.field("c").interior).mean()},
                   filename=path, schedule=IterationInterval(2))
    sim.output_writers["h5"] = w
    sim.run()
    with h5py.File(path, "r") as f:
        assert f["grid"].attrs["Nx"] == 8
        assert "x_faces" in f["grid"]
        its = sorted(int(k) for k in f["timeseries/u"].keys())
        assert its == [0, 2, 4, 6]  # iteration-0 init output + schedule
        u = f["timeseries/u/4"][...]
        assert u.shape[0] == 9 or u.shape == (9, 8, 4) or u.shape == (8, 8, 4)
        assert "timeseries/mean_c/6" in f
        t6 = float(f["timeseries/t/6"][...])
        assert abs(t6 - 0.06) < 1e-9


def test_stop_time_not_representable_in_f32_clock():
    """A stop_time that is not exactly representable by the float32 model
    clock must still terminate the run (regression: Δt used to collapse to
    1e-12 and 1/Δt in the projection produced NaN)."""
    import jax.numpy as jnp
    from oceananigans_tpu.defaults import defaults
    saved = defaults.FloatType
    defaults.FloatType = jnp.float32
    try:
        grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1),
                               dtype=jnp.float32)
        m = NonhydrostaticModel(grid=grid)
        m.set(u=lambda x, y, z: 0.01 * jnp.sin(2 * jnp.pi * x))
        stop = 0.3 * 2 * np.pi / 1.4e-3 * 1e-3   # awkward f64 value
        sim = Simulation(m, dt=0.05, stop_time=stop)
        sim.run()
        assert sim.model.iteration < 1000
        u = np.asarray(m.field("u").interior)
        assert np.isfinite(u).all()
    finally:
        defaults.FloatType = saved


def test_windowed_output_and_field_view(tmp_path):
    """Windowed (sliced) outputs (reference: the writers' Field `indices`
    kwarg): FieldWriter(indices=...) writes only the surface slice;
    Field.view gives the same window interactively."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation import Simulation
    from oceananigans_tpu.simulation.output_writers import FieldWriter

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    model = NonhydrostaticModel(grid=grid, tracers=("c",))
    model.set(c=lambda x, y, z: z)
    sim = Simulation(model, dt=1e-3, stop_iteration=2)
    w = FieldWriter(model, {"c": "c"}, str(tmp_path / "out"),
                    indices=(slice(None), slice(None), -1))
    sim.output_writers["fields"] = w
    sim.run()
    import glob
    f = sorted(glob.glob(str(tmp_path / "out" / "c_*.npy")))[-1]
    arr = np.load(f)
    assert arr.shape == (8, 8)               # surface slice only
    v = model.field("c").view((slice(None), slice(None), -1))
    assert np.allclose(arr, np.asarray(v))


def test_field_time_series_traced_matches_host(tmp_path):
    from oceananigans_tpu.simulation.output_readers import FieldTimeSeries
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=6)
    path = str(tmp_path / "series_tr")
    w = FieldWriter(sim.model, outputs={"u": "u"}, path=path,
                    schedule=IterationInterval(2))
    sim.add_output_writer(w)
    sim.run()
    fts = FieldTimeSeries(path, "u")
    import jax
    f = jax.jit(fts.traced)
    for t in (-1.0, 0.0, 0.013, 0.03, 0.047, 0.06, 99.0):
        a = np.asarray(f(jnp.asarray(t)))
        b = fts.at_time(t)
        assert np.abs(a - b).max() < 1e-6, t


def test_field_time_series_forcing_drives_tracer(tmp_path):
    """A saved series used as tracer forcing inside the jitted step
    (reference: FieldTimeSeries as forcing via
    update_model_field_time_series!)."""
    from oceananigans_tpu.forcings import FieldTimeSeriesForcing
    from oceananigans_tpu.simulation.output_readers import FieldTimeSeries
    sim = Simulation(tiny_model(), dt=0.01, stop_iteration=4)
    path = str(tmp_path / "series_f")
    w = FieldWriter(sim.model, outputs={"c": "c"}, path=path,
                    schedule=IterationInterval(1))
    # constant-in-time source of 1.0 everywhere: overwrite snapshots below
    sim.add_output_writer(w)
    sim.run()
    fts = FieldTimeSeries(path, "c")
    fts._data = np.ones_like(fts._data)
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1))
    m = NonhydrostaticModel(grid=grid, tracers=("c",),
                            forcing={"c": FieldTimeSeriesForcing(fts)})
    for _ in range(10):
        m.time_step(0.01)
    c = np.asarray(m.field("c").interior)
    # dc/dt = 1 -> c = t = 0.1 (no advection: velocities are zero)
    assert np.abs(c - 0.1).max() < 1e-6


def test_calendar_datetime_clock():
    """Calendar clocks (reference: clock.jl Clock{DateTime} +
    validation/dateclocks): a model built with reference_datetime exposes
    model.datetime, Simulation accepts datetime stop_time and timedelta dt,
    and SpecifiedTimes fires on datetimes."""
    import datetime as dtm

    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation
    from oceananigans_tpu.utils.schedules import SpecifiedTimes, TimeInterval

    grid = RectilinearGrid(size=(8, 8), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    t0 = dtm.datetime(2020, 1, 1)
    model = NonhydrostaticModel(grid=grid, reference_datetime=t0)
    assert model.datetime == np.datetime64("2020-01-01T00:00:00", "ns")

    sim = Simulation(model, dt=dtm.timedelta(minutes=1),
                     stop_time=dtm.datetime(2020, 1, 1, 1, 0))
    hits = []
    sim.add_callback(lambda s: hits.append(np.datetime64(s.model.datetime)),
                     SpecifiedTimes(dtm.datetime(2020, 1, 1, 0, 30)))
    ticks = []
    sim.add_callback(lambda s: ticks.append(s.model.time),
                     TimeInterval(dtm.timedelta(minutes=15)))
    sim.run()
    assert abs(float(model.time) - 3600.0) < 1e-3
    assert model.datetime == np.datetime64("2020-01-01T01:00:00", "ns")
    assert len(hits) == 1
    assert hits[0] == np.datetime64("2020-01-01T00:30:00", "ns")
    assert len(ticks) >= 4


def test_datetime_requires_reference():
    import datetime as dtm

    import pytest as _pytest

    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation

    grid = RectilinearGrid(size=(4, 4), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    model = NonhydrostaticModel(grid=grid)
    with _pytest.raises(ValueError, match="reference_datetime"):
        Simulation(model, dt=1.0, stop_time=dtm.datetime(2020, 1, 2))


def test_profiling_helpers(tmp_path):
    """utils/profiling: wall-clock timing and jax.profiler trace capture
    (SURVEY §5 tracing — the reference has only BenchmarkTools wall clocks)."""
    import numpy as np

    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.utils.profiling import profile_step, time_step

    grid = RectilinearGrid(size=(16, 16), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    m = NonhydrostaticModel(grid=grid)
    rng = np.random.default_rng(0)
    m.set(u=0.1 * rng.standard_normal((16, 16)))
    t = time_step(m, steps=3, warmup=1)
    assert t > 0
    d = profile_step(m, steps=2, logdir=str(tmp_path / "trace"))
    import os
    assert any(os.scandir(d))


def test_field_time_series_boundary_condition(tmp_path):
    """A FieldTimeSeries drives a (time-varying, spatially-varying) surface
    flux BC, interpolated in time inside the jitted step (reference:
    validation/field_time_series_boundary_conditions — FieldTimeSeries as
    bc.condition refreshed by update_model_field_time_series!). With a flux
    linear in t the interpolation is exact, so the run must match the same
    model driven by the analytic callable BC bitwise-closely."""
    import json

    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FieldTimeSeriesBoundaryCondition,
        FluxBoundaryCondition)
    from oceananigans_tpu.models.hydrostatic import \
        HydrostaticFreeSurfaceModel
    from oceananigans_tpu.simulation.output_readers import FieldTimeSeries

    grid = RectilinearGrid(size=(8, 8, 4), extent=(1e3, 1e3, 50.0),
                           topology=("periodic", "periodic", "bounded"))
    xf = np.asarray(grid.xnodes("f"))
    yc = np.asarray(grid.ynodes("c"))
    X, Y = np.meshgrid(xf, yc, indexing="ij")
    amp = 1e-4 * (1.0 + 0.5 * np.sin(2 * np.pi * X / 1e3)
                  * np.cos(2 * np.pi * Y / 1e3))
    T = 600.0

    def tau(x, y, t):
        a = 1e-4 * (1.0 + 0.5 * jnp.sin(2 * jnp.pi * x / 1e3)
                    * jnp.cos(2 * jnp.pi * y / 1e3))
        return a * (1.0 + t / T)

    # synthesize the series on disk: snapshots of the SAME flux at coarse
    # times (linear in t -> linear interpolation reproduces it exactly)
    path = str(tmp_path / "taus")
    import os
    os.makedirs(path)
    times = [0.0, 300.0, 600.0]
    for i, t in enumerate(times):
        np.save(os.path.join(path, f"tau_{i}.npy"),
                amp * (1.0 + t / T))
    json.dump({"outputs": ["tau"], "times": times,
               "iterations": [0, 1, 2]},
              open(os.path.join(path, "series.json"), "w"))
    fts = FieldTimeSeries(path, "tau")

    def run(bc):
        m = HydrostaticFreeSurfaceModel(
            grid=grid, tracers=(),
            boundary_conditions={"u": FieldBoundaryConditions(top=bc)})
        for _ in range(12):
            m.time_step(50.0)
        return np.asarray(m.field("u").interior)

    u_fts = run(FieldTimeSeriesBoundaryCondition(fts))
    u_fun = run(FluxBoundaryCondition(tau))
    assert np.isfinite(u_fts).all()
    assert np.abs(u_fts).max() > 0
    assert np.allclose(u_fts, u_fun, rtol=1e-12, atol=1e-15), \
        np.abs(u_fts - u_fun).max()


def test_registered_diagnostics_run_in_loop():
    """Round-5 review regression: entries in ``sim.diagnostics`` actuate in
    the run loop (reference: run.jl time_step! runs simulation.diagnostics)
    — previously the dict was registered but never consulted."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation
    from oceananigans_tpu.simulation.diagnostics import AdvectiveCFL

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None)
    model.set(u=0.1)
    sim = Simulation(model, dt=0.01, stop_iteration=5)

    seen = []

    class Recorder:
        def __call__(self, s):
            seen.append((s.model.iteration, AdvectiveCFL(s.dt)(s)))

    sim.diagnostics["cfl"] = Recorder()
    sim.run()
    assert len(seen) == 5
    assert all(np.isfinite(c) and c > 0 for _, c in seen)


def test_tendency_and_state_callsites():
    """Callback callsites (reference: src/Oceananigans.jl:202-204 —
    TendencyCallsite mutates Gⁿ before the update, UpdateStateCallsite runs
    after the state update). Here they are TRACED hooks inside the compiled
    step (see simulation/callsites.py)."""
    import jax.numpy as jnp
    from oceananigans_tpu import (RectilinearGrid, TendencyCallsite,
                                  UpdateStateCallsite)
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("c",))
    sim = Simulation(model, dt=0.1, stop_iteration=3)

    def accelerate(grid, fields, G, time):
        G = dict(G)
        G["u"] = G["u"] + 0.5          # constant body force via the hook
        return G

    def clamp_c(grid, fields, time):
        return {"c": jnp.clip(fields["c"], 0.0, 1.0)}

    sim.add_callback(accelerate, callsite=TendencyCallsite())
    sim.add_callback(clamp_c, callsite=UpdateStateCallsite())
    model.set(c=2.0)                   # above the clamp
    sim.run()
    u = np.asarray(model.field("u").interior)
    # RK3 stage weights sum to 1: du = 0.5 * t = 0.5 * 0.3
    np.testing.assert_allclose(u, 0.15, rtol=1e-5)
    c = np.asarray(model.field("c").interior)
    assert c.max() <= 1.0 + 1e-6


def test_tendency_callsite_hydrostatic():
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid, TendencyCallsite
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
    from oceananigans_tpu.simulation.simulation import Simulation

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = HydrostaticFreeSurfaceModel(grid=grid, momentum_advection=None,
                                        tracers=())
    sim = Simulation(model, dt=0.1, stop_iteration=2)

    def nudge(grid, fields, G, time):
        G = dict(G)
        G["v"] = G["v"] + 1.0
        return G

    sim.add_callback(nudge, callsite=TendencyCallsite)
    sim.run()
    v = np.asarray(model.field("v").interior)
    np.testing.assert_allclose(v, 0.2, rtol=2e-2)


def test_auxiliary_fields_on_models():
    """model.auxiliary_fields (reference: auxiliary_fields model kwarg —
    e.g. test_implicit_diffusion_diagnostic.jl carries c⁻/Δtc² aux fields
    updated from a callback): reachable via model.field, mutable host-side,
    and usable as writer outputs."""
    from oceananigans_tpu import RectilinearGrid, CenterField
    from oceananigans_tpu.models import (NonhydrostaticModel,
                                         HydrostaticFreeSurfaceModel)
    from oceananigans_tpu.simulation.simulation import Simulation, Callback
    from oceananigans_tpu.utils.schedules import IterationInterval

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    c_prev = CenterField(grid)
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("c",),
                                auxiliary_fields={"c_prev": c_prev})
    assert model.field("c_prev") is c_prev
    model.set(c=1.0)

    deltas = []

    def track(sim):
        c_now = np.asarray(sim.model.field("c").interior)
        deltas.append(np.abs(c_now
                             - np.asarray(c_prev.interior)).max())
        c_prev.set(c_now)

    sim = Simulation(model, dt=0.01, stop_iteration=3)
    sim.callbacks["track"] = Callback(track, IterationInterval(1))
    sim.run()
    assert len(deltas) == 3
    # after the first callback c_prev tracks c, so later deltas are tiny
    assert deltas[0] == 1.0 and deltas[1] < 1e-6

    hmodel = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=None,
        auxiliary_fields={"q": CenterField(grid).set(3.0)})
    np.testing.assert_allclose(np.asarray(hmodel.field("q").interior), 3.0)


def test_callback_initialize_and_finalize_hooks():
    """Port of test_simulations.jl InitializedFinalized: a callback object's
    ``initialize(sim)`` runs at simulation start and ``finalize(sim)`` when
    the run stops."""
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation, Callback
    from oceananigans_tpu.utils.schedules import IterationInterval

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None)

    class InFi:
        initialized = False
        finalized = False
        calls = 0

        def __call__(self, sim):
            self.calls += 1

        def initialize(self, sim):
            self.initialized = True

        def finalize(self, sim):
            self.finalized = True

    infi = InFi()
    sim = Simulation(model, dt=0.01, stop_iteration=2)
    sim.callbacks["infi"] = Callback(infi, IterationInterval(1))
    assert not infi.initialized
    sim.run()
    assert infi.initialized and infi.finalized and infi.calls == 2
