"""Index-shift primitive for stencil operators on halo-padded arrays.

``shift(a, s, axis)`` returns an array of the same shape with
``out[i] = a[i + s]``; slots that would read out of range are zero-filled.
Those slots are always in the outermost halo ring: provided the halo width is
at least the stencil radius and halos are refreshed by ``fill_halos`` between
stencil applications, garbage never reaches the interior. This mirrors the
reference's offset-array + halo design (reference: src/Grids/new_data.jl,
src/BoundaryConditions/fill_halo_regions.jl) but with static shapes so XLA
fuses every shifted read into the consuming elementwise kernel on the VPU.

``jnp.roll`` is deliberately NOT used: wrap-around is wrong for Bounded
topologies and lane-rotations are slower than fused slice reads.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def shift(a, s, axis):
    """out[i] = a[i + s] along ``axis``; zero-fill out-of-range (halo-only)."""
    if s == 0:
        return a
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    if s > 0:
        sl = lax.slice_in_dim(a, s, n, axis=axis)
        pad[axis] = (0, s)
    else:
        sl = lax.slice_in_dim(a, 0, n + s, axis=axis)
        pad[axis] = (-s, 0)
    return jnp.pad(sl, pad)
