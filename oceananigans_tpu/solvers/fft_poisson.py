"""FFT-based Poisson solver on fully-regular grids.

Reference semantics: src/Solvers/fft_based_poisson_solver.jl (:5-11, :52-74,
:95-125) — solve ∇²φ = b by forward transform (FFT along Periodic dims, DCT
along Bounded dims), eigenvalue division φ̂ = -b̂/(λx+λy+λz), zero-mode fix
φ̂[0,0,0] = 0, inverse transform. Eigenvalues per
src/Solvers/poisson_eigenvalues.jl:

    Periodic: λ[k] = (2 sin(kπ/N)  · N/L)²,  k = 0…N-1
    Bounded:  λ[k] = (2 sin(kπ/2N) · N/L)²
    Flat:     λ = 0

The solver operates on INTERIOR arrays (no halos): the pressure-projection
step writes the solution back into a padded array and refreshes halos.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.topology import BOUNDED, FLAT, PERIODIC
from .transforms import dct_forward, dct_inverse


def poisson_eigenvalues(N, L, topology):
    k = np.arange(N)
    if topology == PERIODIC:
        return (2 * np.sin(k * np.pi / N) * N / L) ** 2
    if topology == BOUNDED:
        return (2 * np.sin(k * np.pi / (2 * N)) * N / L) ** 2
    return np.zeros(N)


class FFTPoissonSolver:
    """Eigenfunction solver for ∇²φ = b on an all-regular RectilinearGrid."""

    def __init__(self, grid):
        if not grid.all_regular:
            raise ValueError(
                "FFTPoissonSolver requires regular spacing in every direction "
                "(use FourierTridiagonalPoissonSolver for one stretched dim)")
        self.grid = grid
        lam = np.zeros((1, 1, 1))
        self._dct_axes = []
        self._fft_axes = []
        for axis in range(3):
            topo = grid.topology[axis]
            N = grid.N[axis]
            L = grid.extent[axis]
            if topo == FLAT:
                continue
            shape = [1, 1, 1]
            shape[axis] = N
            lam = lam + poisson_eigenvalues(N, L, topo).reshape(shape)
            (self._fft_axes if topo == PERIODIC
             else self._dct_axes).append(axis)
        self.eigenvalues = lam

    def solve(self, b):
        """Solve ∇²φ = b for interior array b (shape grid.N); returns interior
        φ with zero mean.

        Transform order: DCT axes first (real→real), then FFT axes — the axes
        commute, and this keeps every DCT on REAL data. The FIRST FFT axis
        uses a real FFT (half spectrum: ~2× less transform and eigen-divide
        work); the inverse takes the real part after the inverse FFTs."""
        bh = b
        for axis in self._dct_axes:
            bh = dct_forward(bh, axis)
        rfft_axis = self._fft_axes[0] if self._fft_axes else None
        lam = self.eigenvalues
        if rfft_axis is not None:
            n_r = bh.shape[rfft_axis]
            bh = rfft_along(bh, rfft_axis)
            sl = [slice(None)] * 3
            sl[rfft_axis] = slice(0, n_r // 2 + 1)
            lam = np.broadcast_to(lam, np.broadcast_shapes(
                lam.shape, tuple(1 if i != rfft_axis else n_r
                                 for i in range(3))))[tuple(sl)]
        for axis in self._fft_axes[1:]:
            bh = fft_along(bh, axis)
        lam = jnp.asarray(lam, b.dtype)
        denom = jnp.where(lam == 0, 1.0, lam)
        ph = -bh / denom
        # zero the (singular) volume-mean mode
        ph = jnp.where(lam == 0, 0.0, ph)
        for axis in reversed(self._fft_axes[1:]):
            ph = ifft_along(ph, axis)
        if rfft_axis is not None:
            ph = irfft_along(ph, rfft_axis, n_r)
        if jnp.iscomplexobj(ph):
            ph = jnp.real(ph)
        for axis in reversed(self._dct_axes):
            ph = dct_inverse(ph, axis)
        return ph.astype(b.dtype)


import functools


@functools.lru_cache(maxsize=None)
def _dft_matrices(N):
    k = np.arange(N)
    W = np.exp(-2j * np.pi * np.outer(k, k) / N)
    return W, W.conj() / N


def _use_matmul_dft():
    # XLA:CPU's fft thunk RET_CHECKs on non-dim0-major layouts that arise
    # under SPMD partitioning; the DFT as a matmul partitions cleanly. The
    # TPU/GPU backends use the native FFT (on TPU the matmul-DFT is actually
    # competitive on the MXU for N ≤ ~512, but FFT is the default).
    return jax.default_backend() == "cpu"


def fft_along(a, axis):
    """FFT along ``axis``, computed on the LAST axis (innermost — the fast
    layout on TPU)."""
    if axis != a.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)
    if _use_matmul_dft():
        W, _ = _dft_matrices(a.shape[-1])
        out = jnp.einsum("kn,...n->...k", jnp.asarray(W),
                         a.astype(jnp.result_type(a.dtype, jnp.complex64)))
    else:
        out = jnp.fft.fft(a, axis=-1)
    if axis != a.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def ifft_along(a, axis):
    if axis != a.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)
    if _use_matmul_dft():
        _, Wi = _dft_matrices(a.shape[-1])
        out = jnp.einsum("kn,...n->...k", jnp.asarray(Wi),
                         a.astype(jnp.result_type(a.dtype, jnp.complex64)))
    else:
        out = jnp.fft.ifft(a, axis=-1)
    if axis != a.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


@functools.lru_cache(maxsize=None)
def _rdft_matrices(N):
    k = np.arange(N // 2 + 1)
    n = np.arange(N)
    W = np.exp(-2j * np.pi * np.outer(k, n) / N)          # (N//2+1, N)
    # inverse: x = (1/N) Re( Σ_k w_k conj-symmetric expansion )
    Wi = np.exp(2j * np.pi * np.outer(n, k) / N)          # (N, N//2+1)
    scale = np.ones(N // 2 + 1)
    scale[1:] = 2.0
    if N % 2 == 0:
        scale[-1] = 1.0
    Wi = Wi * scale[None, :] / N
    return W, Wi


def rfft_along(a, axis):
    """Real FFT along ``axis`` (half spectrum), computed on the last axis."""
    if axis != a.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)
    if _use_matmul_dft():
        W, _ = _rdft_matrices(a.shape[-1])
        out = jnp.einsum("kn,...n->...k", jnp.asarray(W),
                         a.astype(jnp.result_type(a.dtype, jnp.complex64)))
    else:
        out = jnp.fft.rfft(a, axis=-1)
    if axis != a.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def irfft_along(a, axis, n):
    if axis != a.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)
    if _use_matmul_dft():
        _, Wi = _rdft_matrices(n)
        out = jnp.real(jnp.einsum("nk,...k->...n", jnp.asarray(Wi), a))
    else:
        out = jnp.fft.irfft(a, n=n, axis=-1)
    if axis != a.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out
