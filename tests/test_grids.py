"""Grid construction and metric tests (reference analogue: test/test_grids.jl)."""

import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.grids.topology import PERIODIC, BOUNDED, FLAT


def test_regular_grid_basic():
    g = RectilinearGrid(size=(4, 6, 8), extent=(1.0, 2.0, 3.0))
    assert g.N == (4, 6, 8)
    assert g.H == (3, 3, 3)
    assert g.topology == (PERIODIC, PERIODIC, BOUNDED)
    assert g.padded_shape == (10, 12, 14)
    assert np.isclose(g.dx(("c", "c", "c")), 0.25)
    assert np.isclose(g.dy(("c", "c", "c")), 2.0 / 6)
    assert np.isclose(g.dz(("c", "c", "c")), 3.0 / 8)
    # extent z in (-Lz, 0)
    zf = g.znodes("f")
    assert np.isclose(zf[0], -3.0)
    assert np.isclose(zf[-1], 0.0)
    assert len(zf) == 9  # bounded faces: N+1
    assert len(g.znodes("c")) == 8
    # periodic x faces: N values
    assert len(g.xnodes("f")) == 4
    xc = g.xnodes("c")
    assert np.allclose(xc, 0.25 * (np.arange(4) + 0.5))


def test_flat_2d_grid():
    g = RectilinearGrid(size=(16, 16), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                        topology=(PERIODIC, PERIODIC, FLAT))
    assert g.N == (16, 16, 1)
    assert g.H[2] == 0
    assert g.padded_shape == (22, 22, 1)
    assert g.dz(("c", "c", "c")) == 1.0


def test_stretched_grid():
    faces = np.array([0.0, 0.1, 0.3, 0.6, 1.0])
    g = RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1), z=faces,
                        topology=(PERIODIC, PERIODIC, BOUNDED), halo=2)
    dz = g.dz(("c", "c", "c"))
    assert dz.shape == (1, 1, 8)
    # interior cell widths
    assert np.allclose(dz[0, 0, 2:6], np.diff(faces))
    # halo extrapolation with uniform end spacing
    assert np.allclose(dz[0, 0, :2], 0.1)
    assert np.allclose(dz[0, 0, 6:], 0.4)
    zc = g.znodes("c")
    assert np.allclose(zc, 0.5 * (faces[:-1] + faces[1:]))
    assert not g.all_regular
    assert g.stretched_axes == (2,)


def test_stretched_grid_from_function():
    g = RectilinearGrid(size=(4, 4, 8), x=(0, 1), y=(0, 1),
                        z=lambda k: -(1 - (k / 8) ** 2) * 100)
    zf = g.znodes("f")
    assert np.isclose(zf[0], -100.0)
    assert np.isclose(zf[-1], 0.0)


def test_grid_hashable_and_equal():
    g1 = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    g2 = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    g3 = RectilinearGrid(size=(4, 4, 8), extent=(1, 1, 1))
    assert g1 == g2
    assert hash(g1) == hash(g2)
    assert g1 != g3
    d = {g1: "a"}
    assert d[g2] == "a"


def test_with_halo():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    g5 = g.with_halo((5, 5, 5))
    assert g5.H == (5, 5, 5)
    assert g5.N == g.N
    assert np.allclose(g5.znodes("c"), g.znodes("c"))
    faces = np.linspace(0, 1, 9) ** 2
    gs = RectilinearGrid(size=(8, 8, 8), x=(0, 1), y=(0, 1), z=faces)
    gs4 = gs.with_halo((4, 4, 4))
    assert np.allclose(gs4.znodes("f"), gs.znodes("f"))


def test_areas_volumes_consistency():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 2.0, 4.0))
    ccc = ("c", "c", "c")
    assert np.isclose(g.V(ccc), 0.25 * 0.5 * 1.0)
    assert np.isclose(g.Ax(ccc), 0.5 * 1.0)
    assert np.isclose(g.Az(ccc), 0.25 * 0.5)


def test_size_topology_errors():
    with pytest.raises(ValueError):
        RectilinearGrid(size=(4, 4), extent=(1, 1, 1))
    with pytest.raises(ValueError):
        RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1))  # missing z


def test_conservative_regridding():
    """regrid (reference: src/Fields/regridding_fields.jl) conserves the
    integral and reproduces means exactly for piecewise-constant data."""
    import jax.numpy as jnp
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.fields.regridding import regrid

    src = RectilinearGrid(size=(4, 4, 32), extent=(1.0, 1.0, 1.0))
    # stretched destination with half the resolution
    zf = -1.0 + np.linspace(0, 1, 17) ** 1.4
    dst = RectilinearGrid(size=(4, 4, 16), x=(0, 1), y=(0, 1), z=zf)

    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.standard_normal((4, 4, 32)))
    out = regrid(c, src, dst, axes=(2,))
    assert out.shape == (4, 4, 16)

    # integral conservation: Σ c·Δz_src == Σ out·Δz_dst
    dz_src = 1.0 / 32
    dz_dst = np.diff(zf)
    lhs = np.asarray(c).sum(axis=2) * dz_src
    rhs = (np.asarray(out) * dz_dst[None, None, :]).sum(axis=2)
    assert np.allclose(lhs, rhs, atol=1e-12)

    # constant fields map to the same constant
    ones = regrid(jnp.ones((4, 4, 32)), src, dst, axes=(2,))
    assert np.allclose(np.asarray(ones), 1.0, atol=1e-12)

    # horizontal (periodic) regridding composes
    dst_x = RectilinearGrid(size=(8, 4, 32), extent=(1.0, 1.0, 1.0))
    up = regrid(c, src, dst_x, axes=(0,))
    assert up.shape == (8, 4, 32)
    assert np.allclose(np.asarray(up).mean(axis=0), np.asarray(c).mean(axis=0),
                       atol=1e-12)


def test_exponential_discretization_matches_reference_docstring():
    """Check values from the reference docstring (coordinate_utils.jl:54-92):
    ExponentialDiscretization(10, -1000, 100) right-biased faces."""
    from oceananigans_tpu.grids import ExponentialDiscretization

    x = ExponentialDiscretization(10, -1000, 100)
    want = [-1000.0, -564.247649441104, -299.95048878528615,
            -139.64615757253702, -42.41666580727582, 16.55600197663209,
            52.324733072619736, 74.0195651413529, 87.17814594835643,
            95.15922864611028, 100.0]
    assert np.allclose(x.faces, want, atol=1e-9)
    left = ExponentialDiscretization(10, -1000, 100, bias="left")
    assert np.isclose(left.faces[1], -995.1592286461103)
    # usable directly as a grid coordinate spec
    g = RectilinearGrid(size=(4, 4, 10), x=(0, 1), y=(0, 1),
                        z=ExponentialDiscretization(10, -1000, 100))
    assert np.isclose(g.nodes1d(2, "f")[0], -1000.0)
    assert np.isclose(g.nodes1d(2, "f")[-1], 100.0)


def test_reference_to_stretched_discretization():
    from oceananigans_tpu.grids import (PowerLawStretching,
                                        ReferenceToStretchedDiscretization)

    z = ReferenceToStretchedDiscretization(
        extent=1000.0, bias="right", bias_edge=0.0, constant_spacing=10.0,
        constant_spacing_extent=50.0, stretching=PowerLawStretching(1.05))
    f = z.faces
    assert f[-1] == 0.0
    assert abs(f[0]) >= 1000.0
    d = np.diff(f)
    # constant 10 m near the surface (right side), growing downward
    assert np.allclose(d[-5:], 10.0)
    assert d[0] > d[-1]
    assert np.all(d > 0)


def test_grid_reconstruction_roundtrip():
    """Port of test_grid_reconstruction.jl: constructor_arguments →
    reconstruct_grid round-trips regular, stretched, and lat-lon grids with
    identical metrics."""
    from oceananigans_tpu.grids.reconstruction import (constructor_arguments,
                                                       reconstruct_grid)
    from oceananigans_tpu import LatitudeLongitudeGrid

    g1 = RectilinearGrid(size=(4, 6, 8), extent=(2 * np.pi, 3 * np.pi,
                                                 4 * np.pi),
                         topology=("periodic", "bounded", "bounded"),
                         halo=(2, 3, 2))
    zf = -np.cos(np.linspace(0, np.pi / 2, 9))  # stretched z faces
    g2 = RectilinearGrid(size=(4, 4, 8), x=(0, 1), y=(0, 1), z=zf,
                         topology=("periodic", "periodic", "bounded"))
    g3 = LatitudeLongitudeGrid(size=(8, 6, 4), longitude=(-10, 10),
                               latitude=(20, 50), z=(-100, 0))
    for g in (g1, g2, g3):
        import json
        spec = json.loads(json.dumps(constructor_arguments(g)))  # JSON-able
        r = reconstruct_grid(spec)
        assert type(r) is type(g)
        assert r.N == g.N and r.H == g.H
        assert tuple(r.topology) == tuple(g.topology)
        for axis in range(3):
            if g.is_flat(axis):
                continue
            np.testing.assert_allclose(
                np.asarray(g.coord_padded(axis, "f")),
                np.asarray(r.coord_padded(axis, "f")), rtol=1e-12)
        loc = ("c", "c", "c")
        np.testing.assert_allclose(np.asarray(g.V(loc)).ravel(),
                                   np.asarray(r.V(loc)).ravel(), rtol=1e-12)


def test_checkpoint_records_grid_spec(tmp_path):
    """The Checkpointer records the grid spec; checkpoint_grid rebuilds it
    (reference: checkpointer grid serialization + reconstruct_grid)."""
    from oceananigans_tpu import checkpoint_grid, Checkpointer
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.simulation.simulation import Simulation
    from oceananigans_tpu.utils.schedules import IterationInterval

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 2.0, 3.0),
                           topology=("periodic", "periodic", "bounded"))
    model = NonhydrostaticModel(grid=grid, advection=None)
    sim = Simulation(model, dt=0.01, stop_iteration=2)
    cp = Checkpointer(model, IterationInterval(2), dir=str(tmp_path))
    sim.add_output_writer(cp)
    sim.run()
    path = cp.path(2)
    import os
    assert os.path.exists(path)
    r = checkpoint_grid(path)
    assert r is not None and r.N == model.grid.N
    np.testing.assert_allclose(
        np.asarray(r.coord_padded(2, "f")),
        np.asarray(model.grid.coord_padded(2, "f")), rtol=1e-12)
