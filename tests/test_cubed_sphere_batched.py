"""Panel-batched cubed-sphere step == per-panel loop.

The batched path (grids/cubed_sphere.py ConcatPanelsGrid +
models/cubed_sphere_hydrostatic.py batch_panels=True, the default) runs the
shared tendency/implicit/turbulence/free-surface stages ONCE over the
x-concatenation of the six panels instead of six launch-bound per-panel
copies. These tests pin the contract that both evaluations produce the same
trajectory (the reference analogue: one kernel launch per region per stage vs
a fused launch — src/MultiRegion/multi_region_models.jl — must not change the
math). Per-config tolerances are f64 roundoff: the two paths constant-fold
metric tables differently, nothing more.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.immersed import PartialCellBottom
from oceananigans_tpu.models import CubedSphereHydrostaticModel

GRID = ConformalCubedSphereGrid((8, 8, 6), z=(-2000.0, 0.0), radius=6.371e6,
                                dtype=jnp.float64)

BOTTOM = (lambda lam, phi:
          -2000.0 + 700.0 * np.exp(-((lam + 0.5) ** 2 + phi ** 2) / 0.4))


def _build(batch, grid=GRID, **kw):
    m = CubedSphereHydrostaticModel(grid, tracers=("b",),
                                    rotation_rate=7.292e-5,
                                    batch_panels=batch, **kw)
    m.set(b=lambda lam, phi, z: 2e-5 * z
          + 1e-4 * np.exp(-(lam ** 2 + phi ** 2) / 0.2))
    m.set_geographic(u_east=lambda lam, phi: 2.0 * np.cos(phi))
    return m


def _compare(kw, names=("u", "v", "b", "eta"), steps=2, dt=200.0,
             tol=1e-13):
    m1 = _build(False, **kw)
    m2 = _build(True, **kw)
    for _ in range(steps):
        m1.time_step(dt)
        m2.time_step(dt)
    H = m1.grid.H[0]
    N = m1.grid.N[0]
    for n in names:
        # interiors only: the stored state's halos are a stale cache
        # (refreshed at the next step's opening fill), and the two paths
        # leave different garbage there by design
        a = np.asarray(m1.state[n])[:, H:H + N, H:H + N]
        b = np.asarray(m2.state[n])[:, H:H + N, H:H + N]
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() <= tol * max(scale, 1.0), \
            (n, np.abs(a - b).max())


def test_batched_explicit_matches_per_panel():
    _compare({"free_surface": "explicit"})


def test_batched_implicit_matches_per_panel():
    _compare({"free_surface": "implicit"})


def test_batched_zstar_matches_per_panel():
    _compare({"free_surface": "explicit", "vertical_coordinate": "zstar",
              "bottom_height": BOTTOM,
              "timestepper": "QuasiAdamsBashforth2"})


def test_batched_partial_cell_matches_per_panel():
    _compare({"free_surface": "explicit",
              "bottom_height": PartialCellBottom(BOTTOM)})


@pytest.mark.slow
def test_batched_full_capability_matches_per_panel():
    """WENO-VI + WENO tracers + CATKE + GM triads + split-explicit +
    GridFittedBottom — the full-capability configuration of
    tests/test_parallel.py::test_sharded_cubed_sphere_full_capability...,
    batched vs looped."""
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.advection.vector_invariant import (
        WENOVectorInvariant)
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.closures import (
        CATKEVerticalDiffusivity, ClosureTuple,
        TriadIsopycnalSkewSymmetricDiffusivity)
    grid = ConformalCubedSphereGrid((8, 8, 6), z=(-2000.0, 0.0),
                                    radius=6.371e6, halo=4,
                                    dtype=jnp.float64)
    _compare({
        "grid": grid,
        "momentum_advection": WENOVectorInvariant(order=5),
        "tracer_advection": WENO(5),
        "closure": ClosureTuple(
            CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
            TriadIsopycnalSkewSymmetricDiffusivity(
                kappa_skew=500.0, kappa_symmetric=500.0,
                buoyancy=BuoyancyTracer())),
        "bottom_height": lambda lam, phi: -2000.0 + 900.0
        * np.exp(-((lam - 1.0) ** 2 + (phi - 0.4) ** 2) / 0.3),
        "free_surface": "split_explicit", "substeps": 8,
    }, names=("u", "v", "b", "e", "eta"), dt=300.0, tol=5e-10)
