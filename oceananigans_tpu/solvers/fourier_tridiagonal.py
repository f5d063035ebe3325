"""Fourier-tridiagonal Poisson solver: FFT/DCT in the two regular horizontal
directions, tridiagonal solve along one (possibly stretched) vertical
direction.

Reference semantics: src/Solvers/fourier_tridiagonal_poisson_solver.jl — for
each horizontal mode (kx, ky) solve the vertical system obtained by
multiplying ∇²φ = b rows by Δz_c(k):

    (1/Δz_f[k])   φ[k-1]
  - (1/Δz_f[k] + 1/Δz_f[k+1] + Δz_c[k](λx+λy)) φ[k]
  + (1/Δz_f[k+1]) φ[k+1]  =  Δz_c[k] b̂[k]

with Neumann (staggered) walls: the boundary coupling terms are dropped. The
singular (λx+λy = 0) mode is regularized by pinning φ[0] = 0 for that mode
(the zero-mode fix, analogue of the reference's mean subtraction)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grids.topology import BOUNDED, CENTER, FACE, FLAT, PERIODIC
from .fft_poisson import poisson_eigenvalues, fft_along, ifft_along
from .transforms import dct_forward, dct_inverse
from .tridiagonal import solve_batched_tridiagonal


class FourierTridiagonalPoissonSolver:
    def __init__(self, grid, stretched_axis=2):
        if stretched_axis != 2:
            raise NotImplementedError(
                "only a stretched z-direction is supported for now "
                "(rotate your domain); reference supports any single axis")
        self.grid = grid
        self._plan = []
        lam = np.zeros((1, 1, 1))
        for axis in (0, 1):
            topo = grid.topology[axis]
            if topo == FLAT:
                continue
            if not grid.regular(axis):
                raise ValueError("horizontal directions must be regular")
            N, L = grid.N[axis], grid.extent[axis]
            shape = [1, 1, 1]
            shape[axis] = N
            lam = lam + poisson_eigenvalues(N, L, topo).reshape(shape)
            self._plan.append((axis, "fft" if topo == PERIODIC else "dct"))
        self.eigenvalues = lam  # (Nx, Ny, 1) broadcastable

        # vertical coefficients (interior, numpy)
        h, n = grid.H[2], grid.N[2]
        loc_c = (CENTER, CENTER, CENTER)
        loc_f = (CENTER, CENTER, FACE)
        dzc = np.broadcast_to(np.asarray(grid.dz(loc_c)).reshape(-1),
                              (grid.padded_shape[2],))[h:h + n].copy()
        dzf_full = np.broadcast_to(np.asarray(grid.dz(loc_f)).reshape(-1),
                                   (grid.padded_shape[2],))
        # face k of cell k: spacing between centers k-1 and k
        dzf = dzf_full[h:h + n + 1] if dzf_full.size >= h + n + 1 else None
        if dzf is None or dzf_full.size < h + n + 1:
            # regular grid: scalar spacing
            dzf = np.full(n + 1, float(np.asarray(grid.dz(loc_f)).reshape(-1)[0]))
        self._dzc = dzc
        # lower[k] couples φ[k-1]: 1/Δz_f[k]; upper[k] couples φ[k+1]: 1/Δz_f[k+1]
        lower = 1.0 / dzf[:n]
        upper = 1.0 / dzf[1:n + 1]
        lower[0] = 0.0     # Neumann bottom: no coupling below
        upper[-1] = 0.0    # Neumann top
        self._lower = lower
        self._upper = upper

    def solve(self, b):
        """Solve ∇²φ = b for interior b (shape grid.N); returns interior φ.
        DCT axes transform first so they always see real data (see
        FFTPoissonSolver.solve)."""
        bh = b
        for axis, kind in sorted(self._plan, key=lambda p: p[1] != "dct"):
            bh = (fft_along(bh, axis) if kind == "fft"
                  else dct_forward(bh, axis))
        n = self.grid.N[2]
        lam = jnp.asarray(self.eigenvalues, bh.real.dtype)
        dzc = jnp.asarray(self._dzc, bh.real.dtype)
        lower = jnp.asarray(self._lower, bh.real.dtype)
        upper = jnp.asarray(self._upper, bh.real.dtype)

        diag = -(lower + upper)[None, None, :] - dzc[None, None, :] * lam
        rhs = bh * dzc[None, None, :]

        # regularize the singular λ=0 mode: pin φ[0] = 0 there
        singular = (lam == 0)  # (Nx, Ny, 1) mask
        diag0 = jnp.where(singular[..., 0], 1.0, diag[..., 0])
        diag = diag.at[..., 0].set(diag0)
        up0 = jnp.broadcast_to(upper, rhs.shape[:-1] + (n,))
        up0 = up0.at[..., 0].set(jnp.where(singular[..., 0], 0.0, upper[0]))
        rhs = rhs.at[..., 0].set(jnp.where(singular[..., 0], 0.0, rhs[..., 0]))

        lo = jnp.broadcast_to(lower, rhs.shape[:-1] + (n,))
        if jnp.iscomplexobj(rhs):
            pr = solve_batched_tridiagonal(lo, diag, up0, rhs.real)
            pi = solve_batched_tridiagonal(lo, diag, up0, rhs.imag)
            ph = pr + 1j * pi
        else:
            ph = solve_batched_tridiagonal(lo, diag, up0, rhs)

        for axis, kind in self._plan:
            if kind == "fft":
                ph = ifft_along(ph, axis)
        if jnp.iscomplexobj(ph):
            ph = jnp.real(ph)
        for axis, kind in self._plan:
            if kind == "dct":
                ph = dct_inverse(ph, axis)
        # remove the volume mean (the solution is defined up to a constant)
        w = dzc / jnp.sum(dzc)
        mean = jnp.sum(jnp.mean(ph, axis=(0, 1)) * w)
        return (ph - mean).astype(b.dtype)
