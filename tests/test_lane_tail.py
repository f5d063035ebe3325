"""Lane-tail layout tests (grids/base.py::AbstractGrid.lane_tail).

The TPU stores f32 arrays in (8, 128) tiles, so the padded minor (z) extent is
physically tile-padded anyway; `lane_align` makes that padding visible so
Mosaic DMA kernels can address tile-aligned slices. These tests force the
visible tail on CPU and check (a) it is bit-isolated from the physics (NaN
poison never reaches the interior), (b) results match the untailed layout."""

import numpy as np
import pytest

from oceananigans_tpu.defaults import defaults
from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.models import NonhydrostaticModel

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)


@pytest.fixture
def lane_aligned():
    defaults.lane_align = True
    yield
    defaults.lane_align = None


def _model():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    m = NonhydrostaticModel(grid=grid, advection=WENO(5),
                            buoyancy=BuoyancyTracer(), tracers=("b",))
    m.set(b=lambda x, y, z: np.sin(2 * np.pi * x) * np.cos(np.pi * z), u=0.1)
    return m


def test_lane_tail_shape(lane_aligned):
    m = _model()
    assert m.grid.padded_shape[2] % 128 == 0
    assert m.grid.lane_tail == m.grid.padded_shape[2] - 8 - 2 * m.grid.H[2]


def test_lane_tail_nan_isolated(lane_aligned):
    m = _model()
    tail = m.grid.lane_tail
    f = m.state["fields"]
    for k in f:
        f[k] = f[k].at[:, :, -tail:].set(np.nan)
    for _ in range(3):
        m.time_step(1e-3)
    assert np.isfinite(np.asarray(m.field("b").interior)).all()


def test_lane_tail_matches_untailed(lane_aligned):
    m = _model()
    for _ in range(3):
        m.time_step(1e-3)
    b1 = np.asarray(m.field("b").interior)

    defaults.lane_align = False
    m2 = _model()
    for _ in range(3):
        m2.time_step(1e-3)
    b2 = np.asarray(m2.field("b").interior)
    # identical math; tiny fusion-order differences only
    assert np.abs(b1 - b2).max() < 1e-13


def test_pallas_fill_matches_xla():
    """The in-place Pallas DMA fill (kernels/pallas_fill.py, interpret mode on
    CPU) must reproduce the XLA concat fill exactly for every supported
    location/BC combination."""
    import jax.numpy as jnp
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, GradientBoundaryCondition,
        ValueBoundaryCondition, regularize_field_boundary_conditions)
    from oceananigans_tpu.boundary_conditions.fill_halos import (
        fill_halo_axes)
    from oceananigans_tpu.kernels.pallas_fill import get_pallas_fill

    defaults.lane_align = True
    try:
        grid = RectilinearGrid(size=(8, 16, 8), extent=(1, 1, 1), halo=(3, 8, 3))
        rng = np.random.default_rng(3)
        cases = [
            (("c", "c", "c"), None),
            (("f", "c", "c"), None),
            (("c", "c", "f"), None),
            (("c", "c", "c"),
             FieldBoundaryConditions(top=ValueBoundaryCondition(1.5),
                                     bottom=GradientBoundaryCondition(-0.25))),
        ]
        for loc, bcs_in in cases:
            bcs = regularize_field_boundary_conditions(bcs_in, grid, loc)
            fast = get_pallas_fill(grid, loc, bcs, interpret=True)
            assert fast is not None, (loc, "kernel unsupported?")
            a = jnp.asarray(rng.standard_normal(grid.padded_shape))
            want = fill_halo_axes(a, grid, loc, bcs, 0.0, (0, 1, 2))
            got = fast(a)
            tail = grid.lane_tail
            err = np.abs(np.asarray(got)[:, :, :-tail]
                         - np.asarray(want)[:, :, :-tail]).max()
            # pure-copy fills match bitwise; Value/Gradient extrapolation
            # differs by association order only (ULP-level)
            tol = 0.0 if bcs_in is None else 1e-13
            assert err <= tol, (loc, err)
    finally:
        defaults.lane_align = None
