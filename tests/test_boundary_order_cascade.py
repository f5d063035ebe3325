"""Near-boundary advection order reduction (reference:
src/Advection/topologically_conditional_interpolation.jl): in a Bounded
direction, reconstruction at faces/centers inside the scheme's boundary
buffer cascades to the buffer scheme — WENO5 → WENO3 → UpwindBiased(1),
Centered(4) → Centered(2), with the reference's index conditions
(high order at faces i ∈ [R+1, N+1−R], centers i ∈ [R, N+1−R])."""

import numpy as np
import jax.numpy as jnp

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection.schemes import WENO, Centered, UpwindBiased


def _grid():
    return RectilinearGrid(size=(16, 4, 4), extent=(1, 1, 1),
                           topology=("bounded", "periodic", "periodic"),
                           halo=3)


def _rand(grid, rng):
    return jnp.asarray(rng.standard_normal(grid.padded_shape))


def test_buffer_scheme_chain():
    w5 = WENO(5)
    assert isinstance(w5.buffer_scheme(), WENO)
    assert w5.buffer_scheme().order == 3
    assert isinstance(w5.buffer_scheme().buffer_scheme(), UpwindBiased)
    assert w5.buffer_scheme().buffer_scheme().order == 1
    assert w5.buffer_scheme().buffer_scheme().buffer_scheme() is None
    c6 = Centered(6)
    assert c6.buffer_scheme().order == 4
    assert c6.buffer_scheme().buffer_scheme().order == 2
    assert c6.buffer_scheme().buffer_scheme().buffer_scheme() is None
    u5 = UpwindBiased(5)
    assert u5.buffer_scheme().order == 3
    assert u5.buffer_scheme().buffer_scheme().order == 1


def test_weno5_cascades_to_weno3_then_upwind1(rng):
    grid = _grid()
    H, N = grid.H[0], grid.N[0]
    c = _rand(grid, rng)
    q = _rand(grid, rng)

    w5, w3, u1 = WENO(5), WENO(3), UpwindBiased(1)
    out = np.asarray(w5.biased_by(grid, c, 0, 0, q))
    plain5 = np.asarray(w5._biased_by_plain(grid, c, 0, 0, q))
    plain3 = np.asarray(w3._biased_by_plain(grid, c, 0, 0, q))
    plain1 = np.asarray(u1._biased_by_plain(grid, c, 0, 0, q))

    # face i (1-based) = padded slot H+i-1; R5=3, R3=2
    def slot(i):
        return H + i - 1

    # deep interior: full WENO5
    for i in (4, 8, N + 1 - 3):
        assert np.allclose(out[slot(i)], plain5[slot(i)]), i
    # one face inside the WENO5 buffer but outside WENO3's: WENO3
    for i in (3, N + 1 - 2):
        assert np.allclose(out[slot(i)], plain3[slot(i)]), i
    # innermost faces: first-order upwind
    for i in (2, N, N + 1 - 1):
        assert np.allclose(out[slot(i)], plain1[slot(i)]), i


def test_cascade_only_in_bounded_directions(rng):
    grid = _grid()
    c = _rand(grid, rng)
    q = _rand(grid, rng)
    w5 = WENO(5)
    # y is periodic: wrapped call must equal the plain reconstruction
    out = np.asarray(w5.biased_by(grid, c, 1, 0, q))
    plain = np.asarray(w5._biased_by_plain(grid, c, 1, 0, q))
    assert np.array_equal(out, plain)


def test_centered_symmetric_cascade(rng):
    grid = _grid()
    H, N = grid.H[0], grid.N[0]
    a = _rand(grid, rng)
    c4, c2 = Centered(4), Centered(2)
    out = np.asarray(c4.symmetric(grid, a, 0, 0))
    hi = np.asarray(c4._symmetric_plain(grid, a, 0, 0))
    lo = np.asarray(c2._symmetric_plain(grid, a, 0, 0))

    def slot(i):
        return H + i - 1

    # R=2: high order at faces i in [3, N-1]
    for i in (3, 7, N - 1):
        assert np.allclose(out[slot(i)], hi[slot(i)]), i
    for i in (2, N, N + 1):
        assert np.allclose(out[slot(i)], lo[slot(i)]), i


def test_weno_symmetric_gated_by_parent_buffer(rng):
    """The advecting-velocity interpolation cascade uses the PARENT scheme's
    buffer (reference passes the parent scheme to the conditional)."""
    grid = _grid()
    H, N = grid.H[0], grid.N[0]
    a = _rand(grid, rng)
    w5 = WENO(5)
    out = np.asarray(w5.symmetric(grid, a, 0, 0))
    hi = np.asarray(Centered(4)._symmetric_plain(grid, a, 0, 0))

    def slot(i):
        return H + i - 1

    # R5=3: Centered(4) applies at faces i in [4, N-2]; i=3 already cascades
    assert np.allclose(out[slot(4)], hi[slot(4)])
    assert not np.allclose(out[slot(3)], hi[slot(3)])
