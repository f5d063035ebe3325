"""Conditional/immersed reductions, field scans, and vector rotation
(reference analogues: test/test_conditional_reductions.jl,
test/test_field_scans.jl, test/test_vector_rotation_operators.jl).

The reference's contract: reductions over immersed fields exclude solid
cells automatically; `condition=` restricts any reduction, with `mean`
normalized by the conditional length; scans support `reverse=`."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid, conditional_length
from oceananigans_tpu.abstract_operations import (Accumulation, Average,
                                                  ConditionalOperation,
                                                  CumulativeIntegral,
                                                  Integral, Reduction)
from oceananigans_tpu.fields import CenterField
from oceananigans_tpu.grids import RotatedLatitudeLongitudeGrid
from oceananigans_tpu.grids.orthogonal_spherical_shell import (
    rotate_from_geographic, rotate_to_geographic)
from oceananigans_tpu.immersed import GridFittedBoundary, ImmersedBoundaryGrid


def _grids():
    grid = RectilinearGrid(size=(6, 2, 2), extent=(1.0, 1.0, 1.0))
    ibg = ImmersedBoundaryGrid(grid, GridFittedBoundary(
        lambda x, y, z: x < 0.5 + 0 * y + 0 * z))
    return grid, ibg


def _poisoned(grid):
    """Interior array = 2 everywhere, garbage in the x<0.5 half."""
    c = np.full(grid.N, 2.0)
    c[0, :, :] = 1e6
    c[1, :, :] = -1e4
    c[2, :, :] = -12.5
    return c


def test_immersed_reductions_exclude_solid():
    grid, ibg = _grids()
    fful = CenterField(grid)
    fful.set(2.0)
    fimm = CenterField(ibg)
    fimm.set(_poisoned(grid))

    n = int(np.prod(grid.N))
    assert int(conditional_length(fimm)) == n // 2

    assert np.isclose(float(fful.norm()), np.sqrt(2) * float(fimm.norm()))
    assert np.isclose(float(fful.mean()), float(fimm.mean()))
    assert np.isclose(float(fful.max()), float(fimm.max()))
    assert np.isclose(float(fful.min()), float(fimm.min()))
    assert np.isclose(float(fful.sum()), 2 * float(fimm.sum()))
    assert np.isclose(float(fful.prod()),
                      float(fimm.prod()) * 2.0 ** (n // 2))


@pytest.mark.parametrize("op", ["mean", "maximum", "minimum"])
def test_immersed_dimwise_reductions(op):
    grid, ibg = _grids()
    fful = CenterField(grid)
    fful.set(2.0)
    fimm = CenterField(ibg)
    fimm.set(_poisoned(grid))
    rful = np.asarray(Reduction(op, fful, dims=0).compute())
    rimm = np.asarray(Reduction(op, fimm, dims=0).compute())
    assert rful.shape == rimm.shape == (1, 2, 2)
    assert np.allclose(rful, rimm)


def test_condition_kwarg_matches_immersed():
    grid, _ = _grids()
    fcon = CenterField(grid)
    fcon.set(_poisoned(grid))
    cond = lambda x, y, z: x > 0.5 + 0 * y + 0 * z
    n = int(np.prod(grid.N))

    assert int(conditional_length(fcon, condition=cond)) == n // 2
    assert np.isclose(float(fcon.mean(condition=cond)), 2.0)
    assert np.isclose(float(fcon.max(condition=cond)), 2.0)
    assert np.isclose(float(fcon.min(condition=cond)), 2.0)
    assert np.isclose(float(fcon.sum(condition=cond)), 2.0 * (n // 2))
    assert np.isclose(float(fcon.norm(condition=cond)),
                      2.0 * np.sqrt(n // 2))
    # dim-wise with keepdims shape
    r = np.asarray(Reduction("sum", fcon, dims=0, condition=cond).compute())
    assert r.shape == (1, 2, 2)
    assert np.allclose(r, 2.0 * 3)


def test_conditional_average_normalizes_by_conditional_volume():
    grid, _ = _grids()
    c = CenterField(grid)
    c.set(_poisoned(grid))
    cond = lambda x, y, z: x > 0.5 + 0 * y + 0 * z
    # Average with condition: mean over the clean half only
    a = float(np.asarray(Average(c, condition=cond).compute()).squeeze())
    assert np.isclose(a, 2.0)
    # mean over a ConditionalOperation uses ITS condition for normalization
    op = ConditionalOperation(c, cond, mask_value=0.0)
    a2 = float(np.asarray(Average(op).compute()).squeeze())
    assert np.isclose(a2, 2.0)
    # Integral with condition: half-domain volume times 2
    i = float(np.asarray(Integral(c, condition=cond).compute()).squeeze())
    assert np.isclose(i, 2.0 * 0.5)


def test_average_over_immersed_grid_is_fluid_only():
    grid, ibg = _grids()
    c = CenterField(ibg)
    c.set(_poisoned(grid))
    a = float(np.asarray(Average(c).compute()).squeeze())
    assert np.isclose(a, 2.0)


def test_cumulative_integral_on_stretched_z():
    # z faces stretched: CumulativeIntegral(1, dims=2) returns cumulative
    # thickness; reverse=True integrates downward from the top
    zf = -np.array([1.0, 0.55, 0.3, 0.15, 0.05, 0.0])
    grid = RectilinearGrid(size=(2, 2, 5), x=(0, 1), y=(0, 1), z=zf)
    c = CenterField(grid)
    c.set(1.0)
    dz = np.diff(zf)
    out = np.asarray(CumulativeIntegral(c, dims=2).compute())
    assert out.shape == (2, 2, 5)
    assert np.allclose(out[0, 0], np.cumsum(dz), rtol=1e-6)
    rev = np.asarray(CumulativeIntegral(c, dims=2, reverse=True).compute())
    assert np.allclose(rev[0, 0], np.cumsum(dz[::-1])[::-1], rtol=1e-6)


def test_accumulation_reverse_and_cummax():
    grid = RectilinearGrid(size=(2, 2, 6), extent=(1, 1, 1))
    c = CenterField(grid)
    vals = np.arange(6.0)
    c.set(np.broadcast_to(vals, (2, 2, 6)).copy())
    fwd = np.asarray(Accumulation("cumsum", c, dims=2).compute())
    assert np.allclose(fwd[0, 0], np.cumsum(vals))
    rev = np.asarray(Accumulation("cumsum", c, dims=2, reverse=True).compute())
    assert np.allclose(rev[0, 0], np.cumsum(vals[::-1])[::-1])
    mx = np.asarray(Accumulation("cummax", c, dims=2).compute())
    assert np.allclose(mx[0, 0], np.maximum.accumulate(vals))


def test_masked_accumulation_uses_neutral_fill():
    grid, ibg = _grids()
    c = CenterField(ibg)
    c.set(_poisoned(grid))
    # cumsum along x over the immersed field: solid cells contribute 0
    out = np.asarray(Accumulation("cumsum", c, dims=0).compute())
    assert np.allclose(out[-1, 0, 0], 2.0 * 3)


def test_reduced_field_reductions_on_immersed_grid():
    """η-like reduced fields (interior (N,M,1)) on an immersed grid must see
    a column mask of their own shape, not a broadcast 3D fluid mask — the
    round-3 regression silently multiplied eta.sum() by the number of fluid
    cells per column. A column participates iff any of its cells is fluid."""
    from oceananigans_tpu.fields.field import Field
    from oceananigans_tpu.grids.topology import LOC_CCC
    from oceananigans_tpu.immersed import GridFittedBottom

    grid = RectilinearGrid(size=(6, 2, 4), extent=(1.0, 1.0, 1.0))
    # first two x-columns fully solid (bottom at z=0), the rest fully fluid
    ibg = ImmersedBoundaryGrid(grid, GridFittedBottom(
        lambda x, y: jnp.where(x < 1 / 3, 0.0, -1.0)))
    eta3 = CenterField(ibg)
    eta3.set(2.0)
    eta = Field(ibg, LOC_CCC, None, eta3.data[:, :, :1], _regularize=False)
    assert eta.interior.shape == (6, 2, 1)
    # 4 of 6 x-columns are wet, each value 2, Ny = 2
    assert np.isclose(float(eta.sum()), 2.0 * 4 * 2)
    assert np.isclose(float(eta.mean()), 2.0)
    assert np.isclose(float(eta.max()), 2.0)
    # nonzero conditional mean on a reduced field over an immersed grid
    cond = lambda x, y, z: x > 0.5 + 0 * y + 0 * z
    assert float(eta.mean(condition=cond)) > 0.0
    assert np.isclose(float(eta.mean(condition=cond)), 2.0)
    assert np.isclose(float(eta.sum(condition=cond)), 2.0 * 3 * 2)


def test_vector_rotation_roundtrip_preserves_magnitude():
    g = RotatedLatitudeLongitudeGrid(size=(12, 12, 2), longitude=(-30, 30),
                                     latitude=(-25, 25), z=(-10, 0),
                                     north_pole=(70.0, 30.0))
    shape = g.padded_shape
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(shape))
    v = jnp.asarray(rng.standard_normal(shape))
    ue, vn = rotate_to_geographic(g, u, v)
    ub, vb = rotate_from_geographic(g, ue, vn)
    ii = g.interior_slices
    assert np.allclose(np.asarray(ub)[ii], np.asarray(u)[ii], atol=1e-10)
    assert np.allclose(np.asarray(vb)[ii], np.asarray(v)[ii], atol=1e-10)
    # the rotation is orthonormal: pointwise speed is preserved
    s0 = np.asarray(u ** 2 + v ** 2)[ii]
    s1 = np.asarray(ue ** 2 + vn ** 2)[ii]
    assert np.allclose(s0, s1, rtol=1e-10)
