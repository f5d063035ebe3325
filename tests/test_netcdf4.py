"""NetCDF4 (HDF5/h5py) writer round trip (VERDICT r3 item 8): write with
NetCDF4Writer, read back with FieldTimeSeries — times, coordinates,
attributes and data intact; append-on-pickup continues the time axis.
Reference: ext/OceananigansNCDatasetsExt.jl:1-80 (attributes, unlimited
time dimension, overwrite_existing=false pickup)."""

import os
import numpy as np
import jax.numpy as jnp
import pytest

h5py = pytest.importorskip("h5py")

from oceananigans_tpu import (NetCDF4Writer, NetCDFOutputWriter,
                              FieldTimeSeries, RectilinearGrid, written_names)
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.simulation.simulation import Simulation
from oceananigans_tpu.utils.schedules import IterationInterval


def _model(n=8):
    grid = RectilinearGrid(size=(n, n, n), extent=(1.0, 2.0, 3.0),
                           topology=("periodic", "periodic", "bounded"),
                           dtype=jnp.float64)
    m = NonhydrostaticModel(grid=grid, advection=WENO(5), tracers=("T",))
    rng = np.random.default_rng(7)
    m.set(u=0.1 * rng.standard_normal((n, n, n)),
          T=lambda x, y, z: 20.0 + z)
    return m


def test_netcdf4_round_trip(tmp_path):
    m = _model()
    path = str(tmp_path / "out.nc")
    sim = Simulation(m, dt=1e-3, stop_iteration=6)
    w = NetCDF4Writer(m, outputs={"u": "u", "T": "T"}, filename=path,
                      schedule=IterationInterval(2),
                      global_attributes={"experiment": "round-trip"})
    sim.output_writers["nc"] = w
    sim.run()
    w.close()

    assert written_names(path) == ["u", "T"]
    fts = FieldTimeSeries(path, "T")
    # writes at iterations 0, 2, 4, 6
    assert np.allclose(fts.times, [0.0, 2e-3, 4e-3, 6e-3])
    assert len(fts) == 4
    # coordinates: cell centers of the grid
    xc, yc, zc = fts.coordinates
    assert np.allclose(xc, np.asarray(m.grid.nodes1d(0, "c")))
    assert np.allclose(zc, np.asarray(m.grid.nodes1d(2, "c")))
    # attributes survive
    assert fts.attributes["units"] == "°C"
    # final snapshot equals the live model state (f32 storage)
    T_now = np.asarray(m.field("T").interior)
    assert np.allclose(fts[-1], T_now, atol=1e-5)
    # file-level provenance
    assert fts.grid_meta["experiment"] == "round-trip"


@pytest.mark.slow
def test_netcdf4_staggered_dims_and_ondisk(tmp_path):
    m = _model()
    path = str(tmp_path / "stag.nc")
    sim = Simulation(m, dt=1e-3, stop_iteration=2)
    w = NetCDF4Writer(m, outputs={"u": "u", "w": "w"}, filename=path)
    sim.output_writers["nc"] = w
    sim.run()
    w.close()
    with h5py.File(path, "r") as f:
        # u is x-face located -> its x dimension scale holds face nodes
        xdim = f["u"].dims[1][0]
        assert np.allclose(np.asarray(xdim[:]),
                           np.asarray(m.grid.nodes1d(0, "f"))[:xdim.shape[0]])
    fts = FieldTimeSeries(path, "u", backend="on_disk")
    a = fts[0]
    assert a.shape == np.asarray(m.field("u").interior).shape
    assert np.isfinite(a).all()


def test_netcdf4_append_on_pickup(tmp_path):
    m = _model()
    path = str(tmp_path / "app.nc")
    sim = Simulation(m, dt=1e-3, stop_iteration=3)
    w = NetCDF4Writer(m, outputs={"u": "u"}, filename=path)
    sim.output_writers["nc"] = w
    sim.run()
    w.close()
    # pickup: reopen WITHOUT overwrite, run further, time axis continues
    sim2 = Simulation(m, dt=1e-3, stop_iteration=6)
    w2 = NetCDF4Writer(m, outputs={"u": "u"}, filename=path,
                       overwrite_existing=False)
    sim2.output_writers["nc"] = w2
    sim2.run()
    w2.close()
    fts = FieldTimeSeries(path, "u")
    # run 1 wrote iterations 0..3, run 2 appended 3..6
    assert len(fts) == 8
    assert np.all(np.diff(fts.times) >= 0)
    assert np.allclose(fts.times[-1], 6e-3)


def test_netcdf_output_writer_alias():
    assert NetCDFOutputWriter is NetCDF4Writer


def test_netcdf4_file_splitting():
    """file_splitting=FileSizeLimit (reference: output_writer_utils.jl +
    NetCDFWriter file_splitting): when the limit actuates after a write,
    output continues into <stem>_part<N>.nc."""
    h5py = pytest.importorskip("h5py")
    import tempfile
    from oceananigans_tpu import RectilinearGrid, NetCDF4Writer, FileSizeLimit
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation

    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None)
    model.set(u=0.01)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "split.nc")
        sim = Simulation(model, dt=0.01, stop_iteration=6)
        w = NetCDF4Writer(model, {"u": "u"}, path,
                          file_splitting=FileSizeLimit(20_000))
        sim.add_output_writer(w)
        sim.run()
        w.close()
        parts = sorted(f for f in os.listdir(d) if f.endswith(".nc"))
        assert len(parts) >= 2, parts
        assert any("part1" in p for p in parts)
        total = 0
        for p in parts:
            with h5py.File(os.path.join(d, p), "r") as f:
                total += f["time"].shape[0]
                assert f["u"].shape[0] == f["time"].shape[0]
        assert total == 7          # forced t=0 write + 6 steps
