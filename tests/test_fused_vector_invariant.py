"""Fused VI tendency megakernel vs the XLA path (serial equivalence).

The Pallas kernel (kernels/fused_vector_invariant.py) must reproduce the
XLA-evaluated hydrostatic tendencies exactly (same operator code, same
coefficients) on every eligible configuration; the tests run the kernel in
the Pallas interpreter on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import LatitudeLongitudeGrid, RectilinearGrid
from oceananigans_tpu.advection import WENOVectorInvariant
from oceananigans_tpu.advection.schemes import Centered, WENO
from oceananigans_tpu.advection.vector_invariant import (ENERGY, ENSTROPHY,
                                                         VectorInvariant)
from oceananigans_tpu.buoyancy import BuoyancyTracer, SeawaterBuoyancy
from oceananigans_tpu.coriolis import (FPlane, HydrostaticSphericalCoriolis)
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from oceananigans_tpu.models.free_surfaces import SplitExplicitFreeSurface

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)


def _tol(fused):
    return ({"rtol": 1e-9, "atol": 1e-11} if fused is True
            else {"rtol": 2e-5, "atol": 1e-8})


def _models(grid, fused=True, **kw):
    rng = np.random.default_rng(7)
    n = grid.N

    def build(f):
        m = HydrostaticFreeSurfaceModel(grid=grid, fused_tendencies=f,
                                        **kw)
        m.set(u=0.05 * rng.standard_normal(n),
              v=0.05 * rng.standard_normal(n),
              **({"T": lambda x, y, z: 10 + 1e-3 * z + 1e-2 * y
                  + 0.1 * jnp.sin(x)} if "T" in m.tracer_names else {}))
        rng2 = np.random.default_rng(7)  # same ICs for both models
        rng.bit_generator.state = rng2.bit_generator.state
        return m

    return build(False), build(fused)


def _compare_steps(m_ref, m_fused, dt, steps=2, rtol=1e-9, atol=1e-11):
    """Unpacked kernels match the XLA path to f32 round-off (identical op
    graph); the packed (y,z)-flattened variant reshapes the graph, so XLA
    fuses FMAs differently — ulp-level input diffs amplified through the
    WENO smoothness ratios justify the looser packed tolerance."""
    assert m_fused._fused_vi is not None, "fused path did not engage"
    assert m_ref._fused_vi is None
    for _ in range(steps):
        m_ref.time_step(dt)
        m_fused.time_step(dt)
    for name in m_ref.prognostic_names:
        a = np.asarray(m_ref.field(name).interior)
        b = np.asarray(m_fused.field(name).interior)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                   err_msg=f"field {name}")


@pytest.mark.parametrize("fused", [True, "packed"])
def test_fused_vi_latlon_weno(fused):
    """Flagship-like config: lat-lon + WENO-VI + spherical Coriolis +
    seawater buoyancy + split-explicit (bounded x: exercises the tiled-axis
    order cascade via index_offset)."""
    grid = LatitudeLongitudeGrid(size=(16, 12, 8), longitude=(0, 30),
                                 latitude=(15, 45), z=(-500.0, 0.0))
    m_ref, m_fused = _models(
        grid, fused=fused, momentum_advection=WENOVectorInvariant(),
        coriolis=HydrostaticSphericalCoriolis(),
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("T",), buoyancy=None)
    _compare_steps(m_ref, m_fused, 60.0, **_tol(fused))


@pytest.mark.parametrize("fused", [True, "packed"])
def test_fused_vi_periodic_x_multi_tile(fused):
    """Periodic x with several x-tiles (periodic wrap comes from the halo
    fill; tiles only see the padded array)."""
    grid = LatitudeLongitudeGrid(size=(64, 8, 6), longitude=(0, 360),
                                 latitude=(10, 40), z=(-200.0, 0.0))
    m_ref, m_fused = _models(
        grid, fused=fused, momentum_advection=WENOVectorInvariant(order=5),
        coriolis=HydrostaticSphericalCoriolis(), tracers=("T", "b"), buoyancy=BuoyancyTracer(),
        free_surface=SplitExplicitFreeSurface(substeps=6))
    _compare_steps(m_ref, m_fused, 30.0, **_tol(fused))


@pytest.mark.parametrize("fused", [True, "packed"])
def test_fused_vi_rectilinear_conserving(fused):
    """Regular rectilinear grid + energy/enstrophy-conserving VI + f-plane +
    WENO tracers (no buoyancy → no pHY input)."""
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1e5, 1e5, 500.0),
                           topology=("periodic", "bounded", "bounded"))
    m_ref, m_fused = _models(
        grid, fused=fused,
        momentum_advection=VectorInvariant(vorticity_scheme=ENSTROPHY,
                                           vertical_advection_scheme=ENERGY),
        tracer_advection=WENO(5), tracers=("T",), coriolis=FPlane(1e-4),
        free_surface=SplitExplicitFreeSurface(substeps=6))
    _compare_steps(m_ref, m_fused, 20.0, **_tol(fused))


@pytest.mark.parametrize("fused", [True, "packed"])
def test_fused_vi_stretched_z(fused):
    """Stretched z exercises the nonuniform ENO coefficient path with
    ZPAD-extended coefficient arrays inside the kernel."""
    zf = -500.0 * (np.linspace(1, 0, 9) ** 1.5)
    grid = LatitudeLongitudeGrid(size=(16, 8, 8), longitude=(0, 20),
                                 latitude=(-30, 10), z=zf)
    m_ref, m_fused = _models(
        grid, fused=fused, momentum_advection=WENOVectorInvariant(order=5),
        coriolis=HydrostaticSphericalCoriolis(), tracers=("T",),
        buoyancy=BuoyancyTracer(),
        free_surface=SplitExplicitFreeSurface(substeps=6))
    _compare_steps(m_ref, m_fused, 30.0, **_tol(fused))


def test_packed_flat_shift_equals_unpacked():
    """operators.shifts.packed_mode: shifts of a (y,z)-flattened (x, rows,
    128) view must equal unpacked-axis shifts wherever the read stays inside
    the (y,z) plane (cross-column/tail reads land in halo slots only)."""
    from oceananigans_tpu.operators import shifts

    rng = np.random.default_rng(0)
    NX, NY, ZP = 5, 12, 11  # ZP deliberately not a divisor of 128
    a = jnp.asarray(rng.standard_normal((NX, NY, ZP)), jnp.float32)
    FLAT = NY * ZP
    S = -(-FLAT // 128)
    ap = jnp.pad(a.reshape(NX, FLAT),
                 [(0, 0), (0, S * 128 - FLAT)]).reshape(NX, S, 128)

    def unpack(x):
        return x.reshape(NX, S * 128)[:, :FLAT].reshape(NX, NY, ZP)

    for axis in (1, 2):
        for s in (-3, -2, -1, 1, 2, 3):
            ref = shifts.shift(a, s, axis)
            with shifts.packed_mode(ZP):
                got = unpack(shifts.shift(ap, s, axis))
            idx = [slice(None)] * 3
            n = NY if axis == 1 else ZP
            idx[axis] = slice(max(0, -s), n - max(0, s))
            idx = tuple(idx)
            np.testing.assert_array_equal(
                np.asarray(got[idx]), np.asarray(ref[idx]),
                err_msg=f"axis={axis} s={s}")


def test_fused_vi_ineligible_falls_back():
    """Immersed/z-star/prescribed configs silently use the XLA path."""
    grid = LatitudeLongitudeGrid(size=(16, 8, 6), longitude=(0, 20),
                                 latitude=(10, 30), z=(-100.0, 0.0))
    m = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=WENOVectorInvariant(order=5),
        vertical_coordinate="zstar")
    assert m._fused_vi is None
    m2 = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=Centered(2))
    assert m2._fused_vi is None
