"""Field algebra / broadcasting / computed fields (reference analogues:
test/test_broadcasting.jl, test/test_computed_field.jl,
test/test_field_scans.jl). The lazy-operation layer must infer locations,
interpolate mixed-staggering operands, and cache computed diagnostics by
time stamp."""

import numpy as np
import jax.numpy as jnp

from oceananigans_tpu import (Average, CenterField, RectilinearGrid,
                              XFaceField, ZFaceField)
from oceananigans_tpu.abstract_operations import (ComputedField,
                                                  UnaryOperation, partial_x,
                                                  partial_z)


def _grid():
    return RectilinearGrid(size=(8, 8, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"),
                           dtype=jnp.float64)


def test_scalar_broadcasting_both_sides():
    g = _grid()
    c = CenterField(g)
    c.set(lambda x, y, z: x)
    ci = np.asarray(c.interior)
    assert np.allclose(np.asarray((c + 1).compute().interior), ci + 1)
    assert np.allclose(np.asarray((1 + c).compute().interior), ci + 1)
    assert np.allclose(np.asarray((2 * c).compute().interior), 2 * ci)
    assert np.allclose(np.asarray((c / 2).compute().interior), ci / 2)
    assert np.allclose(np.asarray((1 - c).compute().interior), 1 - ci)
    assert np.allclose(np.asarray((c ** 2).compute().interior), ci ** 2)
    assert np.allclose(np.asarray((-c).compute().interior), -ci)
    assert np.allclose(np.asarray(abs(c - 0.5).compute().interior),
                       np.abs(ci - 0.5))


def test_mixed_location_product_interpolates():
    """u (fcc) × c (ccc) lives at ccc: the face values are averaged onto
    centers before multiplying. Compare against the hand-computed 2-point
    mean of u's own padded data (periodic-consistent, so the wrap halos
    are exercised too)."""
    g = _grid()
    c = CenterField(g)
    u = XFaceField(g)
    c.set(lambda x, y, z: 3.0)
    u.set(lambda x, y, z: np.sin(2 * np.pi * x))
    prod = (c * u).compute()
    assert tuple(prod.loc) == ("c", "c", "c")
    h = g.H
    up = np.asarray(u.data)
    nx, ny, nz = g.N
    mean = 0.5 * (up[h[0]:h[0] + nx] + up[h[0] + 1:h[0] + 1 + nx])
    expect = 3.0 * mean[:, h[1]:h[1] + ny, h[2]:h[2] + nz]
    assert np.allclose(np.asarray(prod.interior), expect, atol=1e-12)


def test_nested_expression_tree():
    g = _grid()
    c = CenterField(g)
    u = XFaceField(g)
    c.set(lambda x, y, z: x)
    u.set(lambda x, y, z: 1.0)
    ci = np.asarray(c.interior)
    r = (2 * (c * u) + 1 - c).compute()
    assert np.allclose(np.asarray(r.interior), 2 * ci + 1 - ci)


def test_derivative_locations_and_values():
    g = _grid()
    c = CenterField(g)
    c.set(lambda x, y, z: x)
    dcdx = partial_x(c)
    assert tuple(dcdx.loc)[0] == "f"
    # interior faces see exactly slope 1 (periodic wrap faces see the jump)
    vals = np.asarray(dcdx.compute().interior)[1:-1]
    assert np.allclose(vals, 1.0, atol=1e-12)
    w = ZFaceField(g)
    w.set(lambda x, y, z: z)
    dwdz = partial_z(w)
    assert tuple(dwdz.loc)[2] == "c"
    # away from the bounded-z boundary slots the slope is exactly 1
    vals = np.asarray(dwdz.compute().interior)[:, :, 1:]
    assert np.allclose(vals, 1.0, atol=1e-12)


def test_reduction_of_expression():
    """Average of an expression equals the hand-computed volume mean."""
    g = _grid()
    c = CenterField(g)
    c.set(lambda x, y, z: x)
    ci = np.asarray(c.interior)
    got = float(np.asarray(Average(c * c).compute()).squeeze())
    assert np.isclose(got, (ci ** 2).mean(), atol=1e-12)


def test_computed_field_caches_by_time():
    """ComputedField re-evaluates only when the time stamp changes
    (reference: computed_field.jl status caching)."""
    g = _grid()
    c = CenterField(g)
    c.set(lambda x, y, z: 1.0)
    calls = []

    class CountingOp(UnaryOperation):
        def materialize(self):
            calls.append(1)
            return super().materialize()

    op = CountingOp(jnp.negative, c)
    f = ComputedField(op)
    f.compute(0.0)
    f.compute(0.0)          # cached — no new evaluation
    assert len(calls) == 1
    f.compute(1.0)          # new time — re-evaluates
    assert len(calls) == 2
    f.compute()             # no stamp — always re-evaluates
    assert len(calls) == 3
    assert np.allclose(np.asarray(f.interior), -1.0)


def test_algebra_is_lazy_until_compute():
    """Building an expression performs no array work: mutating the operand
    afterwards changes the computed result (the tree holds references)."""
    g = _grid()
    c = CenterField(g)
    c.set(lambda x, y, z: 1.0)
    expr = 2 * c
    c.set(lambda x, y, z: 3.0)       # mutate AFTER building the tree
    assert np.allclose(np.asarray(expr.compute().interior), 6.0)


def test_integral_on_face_field_is_trapezoidal():
    """Round-5 review regression: reductions over a FACE-located bounded
    direction include all N+1 points with trapezoid (half-weight end) areas
    — Integral(x dV) over the unit cube on x-face data is exactly 1/2
    (reference: Field reductions via AbstractOperations/metric_field_reductions.jl)."""
    from oceananigans_tpu import RectilinearGrid, Field, Integral, Average
    from oceananigans_tpu.fields.field import set_on_padded
    from oceananigans_tpu.grids.topology import LOC_FCC
    grid = RectilinearGrid(size=(8, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("bounded", "periodic", "bounded"))
    # bypass .set(): the default x-face BC (reference-consistent
    # impenetrability) pins the x=Lx face to 0, which is not what this
    # quadrature test measures
    data = set_on_padded(grid, LOC_FCC, lambda x, y, z: x)
    f = Field(grid, LOC_FCC, None, data)
    total = float(np.asarray(Integral(f).interior).squeeze())
    np.testing.assert_allclose(total, 0.5, rtol=1e-12)
    avg = float(np.asarray(Average(f).interior).squeeze())
    np.testing.assert_allclose(avg, 0.5, rtol=1e-12)


def test_face_field_reduction_mask_covers_all_faces():
    """Round-5 review regression: the fluid-mask used by conditional/masked
    reductions is sliced with face-aware interior slices, so the x=Lx face
    row participates (it was silently dropped before)."""
    from oceananigans_tpu import RectilinearGrid, Field
    from oceananigans_tpu.fields.field import set_on_padded
    from oceananigans_tpu.grids.topology import LOC_FCC
    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("bounded", "periodic", "bounded"))
    data = set_on_padded(grid, LOC_FCC, lambda x, y, z: x)
    f = Field(grid, LOC_FCC, None, data)
    interior = np.asarray(f.interior)
    assert interior.shape[0] == 5          # N+1 x-face points
    np.testing.assert_allclose(interior[-1, 0, 0], 1.0, rtol=1e-12)
    # plain max reduction must see the boundary face value 1.0
    np.testing.assert_allclose(float(f.max()), 1.0, rtol=1e-12)


def test_function_field_and_constant_fields():
    """FunctionField/ConstantField/ZeroField (reference: function_field.jl,
    constant_field.jl) — SURVEY §2.5 lazy analytic fields."""
    from oceananigans_tpu import (RectilinearGrid, FunctionField,
                                  ConstantField, ZeroField, OneField)
    from oceananigans_tpu.grids.topology import LOC_FCC
    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    ff = FunctionField(LOC_FCC, lambda x, y, z, t: x + t, grid, time=0.0)
    H = grid.H[0]
    x_face = np.asarray(grid.coord_padded(0, "f"))[H:H + 4]
    got = np.asarray(ff.data)[H:H + 4, H + 1, H + 1]
    np.testing.assert_allclose(got, x_face, rtol=1e-6)
    ff.at_time(2.0)
    got2 = np.asarray(ff.data)[H:H + 4, H + 1, H + 1]
    np.testing.assert_allclose(got2, x_face + 2.0, rtol=1e-6)

    # FunctionField participates in abstract operations like any Field
    from oceananigans_tpu import Average
    avg = float(np.asarray(Average(ff).interior).squeeze())
    np.testing.assert_allclose(avg, np.mean(x_face) + 2.0, rtol=1e-6)

    c = ConstantField(0.3)
    assert float(c) == 0.3
    from oceananigans_tpu.models import NonhydrostaticModel
    model = NonhydrostaticModel(grid=grid, advection=None)
    model.set(u=c, v=ZeroField(), w=ZeroField())
    u = np.asarray(model.field("u").interior)
    np.testing.assert_allclose(u, 0.3, rtol=1e-6)
    one = OneField().on_grid(grid)
    np.testing.assert_allclose(np.asarray(one.interior), 1.0)


def test_grid_metric_operation_and_interpolate():
    """GridMetricOperation (reference: grid_metrics.jl) and the public
    fractional-index interpolate (reference: interpolate.jl:265-281)."""
    from oceananigans_tpu import (RectilinearGrid, CenterField,
                                  GridMetricOperation, interpolate)
    from oceananigans_tpu.grids.topology import LOC_CCC
    grid = RectilinearGrid(size=(8, 4, 4), extent=(2.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    vol = GridMetricOperation(LOC_CCC, "volume", grid)
    v = np.asarray(vol.interior)
    np.testing.assert_allclose(v.sum(), 2.0, rtol=1e-6)   # total volume
    np.testing.assert_allclose(v, 2.0 / 8 * (1.0 / 4) ** 2, rtol=1e-6)
    with np.testing.assert_raises(ValueError):
        GridMetricOperation(LOC_CCC, "nope", grid)

    c = CenterField(grid).set(lambda x, y, z: 2 * x)
    got = float(interpolate(c, 0.8, 0.5, -0.5))
    np.testing.assert_allclose(got, 1.6, rtol=1e-5)
    many = np.asarray(interpolate(c, np.array([0.4, 1.2]),
                                  np.array([0.5, 0.5]),
                                  np.array([-0.5, -0.5])))
    np.testing.assert_allclose(many, [0.8, 2.4], rtol=1e-5)
