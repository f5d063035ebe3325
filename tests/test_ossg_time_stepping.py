"""OSSG time-stepping equivalence (reference analogue:
test_orthogonal_spherical_shell_time_stepping.jl — a lat-lon model and a
rotated-pole model stepped side by side must produce the same dynamics).

The reference asserts bit-equality between a LatitudeLongitudeGrid model
and a RotatedLatitudeLongitudeGrid model whose rotation maps the patch
onto itself. Here the two grid families discretize metrics differently
(analytic latitude-circle arcs vs great-circle chords), so the mirrors
are tolerance-based and split into the two invariances the reference test
actually exercises:

1. rotation invariance — two rotated shells with the SAME grid-coordinate
   extents but different physical poles have identical intrinsic metrics,
   so identical intrinsic initial conditions must evolve identically;
2. cross-family agreement — an unrotated shell (north_pole at the true
   pole) physically coincides with the analytic LatitudeLongitudeGrid, so
   the same initial state must evolve to the same fields up to the
   O(Δλ²) metric-discretization difference.
"""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.grids import (LatitudeLongitudeGrid,
                                    RotatedLatitudeLongitudeGrid)
from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                     SplitExplicitFreeSurface)


def _build(grid):
    from oceananigans_tpu.advection import VectorInvariant
    from oceananigans_tpu.closures import ScalarDiffusivity
    return HydrostaticFreeSurfaceModel(
        grid=grid,
        free_surface=SplitExplicitFreeSurface(substeps=20),
        momentum_advection=VectorInvariant(),
        closure=ScalarDiffusivity(nu=2e-4, kappa=2e-4))


def _initial_state(n, rng):
    """(eta, u, v) interior arrays: a Gaussian surface bump + small noise
    (the reference's ηᵢ + ϵᵢ, test_orthogonal_spherical_shell_time_stepping
    .jl:16-34), expressed in grid indices so the same intrinsic state can
    be loaded onto grids with different physical placements."""
    i = np.arange(n) - (n - 1) / 2
    X, Y = np.meshgrid(i, i, indexing="ij")
    eta = 1.0 * np.exp(-(X**2 + Y**2) / (2 * (n / 8) ** 2))
    u = 1e-6 * rng.standard_normal((n, n, 2))
    v = 1e-6 * rng.standard_normal((n, n, 2))
    return eta[:, :, None], u, v


def _run(model, eta, u, v, steps, dt):
    # intrinsic_velocities=True: the same grid-aligned state on every grid
    # (the reference test's set!(m2, ..., intrinsic_velocities=true))
    model.set(eta=jnp.asarray(eta), u=jnp.asarray(u), v=jnp.asarray(v),
              intrinsic_velocities=True)
    for _ in range(steps):
        model.time_step(dt)
    return {name: np.asarray(model.field(name).interior)
            for name in ("eta", "u", "v")}


def test_rotated_pole_dynamics_are_rotation_invariant():
    # two shells, same grid-coordinate extents, poles 90° apart: intrinsic
    # metrics are rotation-invariant, so the runs must agree to rounding
    n = 24
    kw = dict(size=(n, n, 2), longitude=(-60, 60), latitude=(-60, 60),
              z=(-1000.0, 0.0), dtype=jnp.float64)
    g1 = RotatedLatitudeLongitudeGrid(north_pole=(0.0, 0.0), **kw)
    g2 = RotatedLatitudeLongitudeGrid(north_pole=(90.0, 45.0), **kw)

    rng = np.random.default_rng(123)
    eta, u, v = _initial_state(n, rng)
    dt = 180.0
    f1 = _run(_build(g1), eta, u, v, 50, dt)
    f2 = _run(_build(g2), eta, u, v, 50, dt)

    for name in ("eta", "u", "v"):
        assert np.all(np.isfinite(f1[name])), name
        scale = max(np.abs(f1[name]).max(), 1e-30)
        err = np.abs(f1[name] - f2[name]).max() / scale
        assert err < 1e-9, (name, err)


def test_unrotated_shell_matches_analytic_latlon_dynamics():
    # north_pole=(0, 90) leaves the grid physically a lat-lon patch; the
    # only difference from LatitudeLongitudeGrid is great-circle-chord vs
    # analytic-arc metrics, an O(Δλ²) relative difference
    n = 24
    kw = dict(size=(n, n, 2), longitude=(-60, 60), latitude=(-60, 60),
              z=(-1000.0, 0.0))
    g1 = LatitudeLongitudeGrid(topology=("bounded", "bounded", "bounded"),
                               dtype=jnp.float64, **kw)
    g2 = RotatedLatitudeLongitudeGrid(north_pole=(0.0, 90.0),
                                      dtype=jnp.float64, **kw)

    # metric agreement first (isolates a grid bug from a dynamics bug)
    def interior_metric(g, which):
        m = np.broadcast_to(np.asarray(getattr(g, which)(("c", "c", "c"))),
                            g.padded_shape)
        return m[g.interior_slices]

    assert np.allclose(interior_metric(g1, "dx"), interior_metric(g2, "dx"),
                       rtol=5e-3)
    assert np.allclose(interior_metric(g1, "dy"), interior_metric(g2, "dy"),
                       rtol=5e-3)

    rng = np.random.default_rng(123)
    eta, u, v = _initial_state(n, rng)
    dt = 180.0
    f1 = _run(_build(g1), eta, u, v, 30, dt)
    f2 = _run(_build(g2), eta, u, v, 30, dt)

    # the gravity-wave evolution must agree to the metric tolerance
    scale = np.abs(f1["eta"]).max()
    assert np.abs(f1["eta"] - f2["eta"]).max() / scale < 2e-2
    corr = np.corrcoef(f1["eta"].ravel(), f2["eta"].ravel())[0, 1]
    assert corr > 0.999


def test_set_rotates_extrinsic_velocities_by_default():
    """On OSSG-family grids set(u, v) takes geographic (east/north)
    components by default and rotates them into the grid's intrinsic frame
    (reference: set_velocities!/set_from_extrinsic_velocities!,
    set_hydrostatic_free_surface_model.jl:92-116)."""
    from oceananigans_tpu.grids.orthogonal_spherical_shell import (
        rotate_to_geographic)

    # north_pole=(0, 45): strongly rotated but the geographic poles (where
    # east/north are singular) stay outside the domain
    n = 16
    g = RotatedLatitudeLongitudeGrid(
        size=(n, n, 2), longitude=(-30, 30), latitude=(-30, 30),
        z=(-100.0, 0.0), north_pole=(0.0, 45.0), dtype=jnp.float64)
    model = _build(g)
    model.set(u=1.0, v=0.0)   # 1 m/s geographic EASTWARD everywhere

    # recover east/north at centers from the stored intrinsic components
    # (the model inflates halos, so use ITS grid, not the constructor's)
    from oceananigans_tpu.operators.operators import ix_c, iy_c
    g = model.grid
    ui = model.state["fields"]["u"]
    vi = model.state["fields"]["v"]
    ue, vn = rotate_to_geographic(g, ix_c(g, ui), iy_c(g, vi))
    ii = tuple(slice(s.start + 2, s.stop - 2) for s in g.interior_slices[:2])
    ue = np.asarray(ue)[ii]
    vn = np.asarray(vn)[ii]
    # center->face->center double interpolation of a spatially rotating
    # vector leaves an O(Δθ²) residual (~2e-3 at this resolution)
    assert np.allclose(ue, 1.0, atol=5e-3)
    assert np.allclose(vn, 0.0, atol=5e-3)

    # the intrinsic components themselves must NOT be (1, 0): this grid's
    # x-direction is far from geographic east
    u_int = np.asarray(ix_c(g, ui))[ii]
    assert np.abs(u_int - 1.0).max() > 0.1

    # and intrinsic_velocities=True stores the components verbatim
    # (away from the zeroed no-penetration wall faces)
    model.set(u=1.0, v=0.0, intrinsic_velocities=True)
    u_int = np.asarray(model.state["fields"]["u"])[ii]
    assert np.allclose(u_int, 1.0, atol=1e-12)
