"""Pencil-decomposed distributed FFT Poisson solver.

Reference semantics: src/DistributedComputations/
distributed_fft_based_poisson_solver.jl:53-91 — the 3D transform of an
x-sharded field is computed by making one direction local at a time:

    FFT(z, y local) → transpose y↔x (MPI.Alltoallv!) → FFT(x) →
    eigen-divide → inverse chain

TPU-native: the transposes are ``lax.all_to_all`` over the mesh axis (one
fused ICI collective instead of the reference's buffer-packing Alltoallv,
distributed_transpose.jl:4-188), run inside a single shard_map region so XLA
can overlap them with the local FFTs. Divisibility constraints mirror the
reference's (Ny % Px == 0 — :80-91)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..grids.topology import PERIODIC
from ..solvers.fft_poisson import poisson_eigenvalues


class DistributedFFTPoissonSolver:
    """Solve ∇²φ = b for an interior field sharded along x over a 1D mesh.

    Requires fully periodic topology (DCT pencils are a follow-up) and
    Nx % P == 0, Ny % P == 0."""

    def __init__(self, grid, mesh, axis_name="x"):
        if not all(grid.is_periodic(i) or grid.is_flat(i) for i in range(3)):
            raise NotImplementedError("pencil solver requires periodic dims")
        self.grid = grid
        self.mesh = mesh
        self.axis_name = axis_name
        self.P = mesh.shape[axis_name]
        nx, ny, _ = grid.N
        if nx % self.P or ny % self.P:
            raise ValueError(
                f"Nx={nx} and Ny={ny} must divide the mesh size {self.P} "
                "(reference analogue: distributed_fft_based_poisson_solver.jl"
                ":80-91 divisibility constraints)")
        lam = np.zeros((1, 1, 1))
        for axis in range(3):
            if grid.is_flat(axis):
                continue
            N, L = grid.N[axis], grid.extent[axis]
            sh = [1, 1, 1]
            sh[axis] = N
            lam = lam + poisson_eigenvalues(N, L, PERIODIC).reshape(sh)
        self.eigenvalues = lam

        from jax import shard_map
        spec = P(axis_name, None, None)
        axn = axis_name
        Pn = self.P
        lam_local_spec = spec

        def solve_local(b, lam_x_sharded):
            # b: local (nx/P, Ny, Nz). FFT local dims y, z
            bh = jnp.fft.fftn(b, axes=(1, 2))
            # transpose x↔y: gather x, shard y
            bh = lax.all_to_all(bh, axn, split_axis=1, concat_axis=0,
                                tiled=True)     # (Nx, Ny/P, Nz)
            bh = jnp.fft.fft(bh, axis=0)
            # eigen-divide in (x-local, y-sharded) space
            lam_yshard = lax.all_to_all(
                jnp.broadcast_to(lam_x_sharded,
                                 (lam_x_sharded.shape[0],) + b.shape[1:]),
                axn, split_axis=1, concat_axis=0, tiled=True)
            denom = jnp.where(lam_yshard == 0, 1.0, lam_yshard)
            ph = jnp.where(lam_yshard == 0, 0.0, -bh / denom)
            ph = jnp.fft.ifft(ph, axis=0)
            ph = lax.all_to_all(ph, axn, split_axis=0, concat_axis=1,
                                tiled=True)     # back to x-sharded
            ph = jnp.fft.ifftn(ph, axes=(1, 2))
            return jnp.real(ph)

        self._solve = jax.jit(shard_map(
            solve_local, mesh=mesh,
            in_specs=(spec, lam_local_spec), out_specs=spec))

    def solve(self, b):
        """b: interior array (Nx, Ny, Nz) sharded (or shardable) along x."""
        lam = jnp.asarray(np.broadcast_to(self.eigenvalues, self.grid.N),
                          b.dtype)
        sharding = NamedSharding(self.mesh, P(self.axis_name, None, None))
        b = jax.device_put(b, sharding)
        lam = jax.device_put(lam, sharding)
        return self._solve(b, lam).astype(b.dtype)
