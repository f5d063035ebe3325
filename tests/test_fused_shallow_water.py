"""Fused shallow-water kernel parity: the Pallas x-tiled slab kernel
(kernels/fused_shallow_water.py) matches the XLA path exactly."""

import pytest
import numpy as np
import jax.numpy as jnp

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models.shallow_water import ShallowWaterModel

N = (32, 32)


def _build(rng, fused):
    grid = RectilinearGrid(size=N, extent=(10.0, 10.0),
                           topology=("periodic", "periodic", "flat"))
    hB = 0.05 * rng.standard_normal(N)
    m = ShallowWaterModel(grid=grid, advection=WENO(5), coriolis=FPlane(f=0.3),
                          bathymetry=hB, tracers=("c",),
                          gravitational_acceleration=9.81, fused=fused)
    return m


def test_fused_sw_matches_xla(rng):
    h0 = 1.0 + 0.05 * rng.standard_normal(N)
    uh0 = 0.1 * rng.standard_normal(N)
    vh0 = 0.1 * rng.standard_normal(N)
    c0 = rng.random(N)
    seeds = dict(h=h0, uh=uh0, vh=vh0, c=c0)

    rngs = np.random.default_rng(0)
    ma = _build(rngs, True)
    rngs = np.random.default_rng(0)
    mb = _build(rngs, False)
    assert ma._fused_update is not None and mb._fused_update is None
    ma.set(**seeds)
    mb.set(**seeds)
    for _ in range(3):
        ma.time_step(1e-3)
        mb.time_step(1e-3)
    for n in ("uh", "vh", "h", "c"):
        a = np.asarray(ma.field(n).interior)
        b = np.asarray(mb.field(n).interior)
        assert np.abs(a - b).max() < 1e-9, n


def test_fused_sw_rejects_ineligible():
    import pytest

    grid = RectilinearGrid(size=(30, 32), extent=(1.0, 1.0),
                           topology=("periodic", "periodic", "flat"))
    with pytest.raises(ValueError):
        ShallowWaterModel(grid=grid, advection=WENO(5), fused=True)
    grid2 = RectilinearGrid(size=(32, 32), extent=(1.0, 1.0),
                            topology=("bounded", "periodic", "flat"))
    with pytest.raises(ValueError):
        ShallowWaterModel(grid=grid2, advection=WENO(5), fused=True)


@pytest.mark.slow
def test_sharded_fused_sw_matches_serial(rng):
    """Serial vs 8-device sharded fused shallow water (SURVEY §4.5
    equivalence strategy on the virtual CPU mesh)."""
    from oceananigans_tpu.parallel.distributed import Distributed, Partition

    h0 = 1.0 + 0.05 * rng.standard_normal(N)
    uh0 = 0.1 * rng.standard_normal(N)
    vh0 = 0.1 * rng.standard_normal(N)
    seeds = dict(h=h0, uh=uh0, vh=vh0)

    def build(arch):
        grid = RectilinearGrid(size=N, extent=(10.0, 10.0),
                               topology=("periodic", "periodic", "flat"))
        m = ShallowWaterModel(grid=grid, advection=WENO(5),
                              coriolis=FPlane(f=0.3),
                              gravitational_acceleration=9.81,
                              fused=True, architecture=arch)
        m.set(**seeds)
        return m

    arch = Distributed(Partition(2, 4))
    ma = build(arch)
    ma.state = arch.shard(ma.state)
    mb = build(None)
    for _ in range(3):
        ma.time_step(1e-3)
        mb.time_step(1e-3)
    for n in ("uh", "vh", "h"):
        a = np.asarray(ma.field(n).interior)
        b = np.asarray(mb.field(n).interior)
        assert np.abs(a - b).max() < 1e-9, n
