"""Explicit shard_map halo exchange over the device mesh (ICI).

Reference semantics: src/DistributedComputations/halo_communication.jl:87-187
— pack per-side send buffers, MPI.Isend/Irecv! to the neighbor ranks, unpack
into halos (with corner passing :137-162).

TPU-native replacement: neighbor strips move with ``lax.ppermute`` inside a
``shard_map`` region — XLA lowers these to collective-permutes that ride the
ICI torus; no buffers, tags, or request pools exist because the dataflow is
static (SURVEY.md §5: the race class is gone by construction).

This module operates on LOCAL-VIEW arrays: each shard holds its own
halo-padded local block (the reference's distributed-grid layout,
distributed_grids.jl). Corners are correct because the x-exchange runs first
and the y-exchange then ships strips whose x-halos are already filled — the
same two-hop corner strategy the reference documents."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _exchange_axis(a, h, n, axis, axis_name, periodic=True):
    """Fill the local halos along ``axis`` from the neighbor shards.

    ``a`` is a local padded array with layout [h | n | h] along ``axis``;
    ``axis_name`` is the mesh axis this dimension is sharded over."""
    if not periodic:
        # the ppermute ring below always wraps; a bounded sharded axis
        # needs boundary-aware edge shards, which this exchange does not
        # implement — refuse instead of silently filling wall halos with
        # opposite-side data (round-5 review finding; all current callers
        # are gated to doubly-periodic grids)
        raise NotImplementedError(
            "shard_map halo exchange supports periodic axes only")
    if h == 0:
        return a
    size = lax.axis_size(axis_name)

    def sl(start, stop):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, stop)
        return tuple(idx)

    # ship my right interior edge to the right neighbor's left halo
    fwd = [(i, (i + 1) % size) for i in range(size)]
    bwd = [(i, (i - 1) % size) for i in range(size)]
    right_edge = a[sl(n, n + h)]
    from_left = lax.ppermute(right_edge, axis_name, fwd)
    left_edge = a[sl(h, 2 * h)]
    from_right = lax.ppermute(left_edge, axis_name, bwd)
    a = a.at[sl(0, h)].set(from_left)
    a = a.at[sl(h + n, n + 2 * h)].set(from_right)
    return a


def halo_exchange_local(a, halo, local_n, axis_names=("x", "y"),
                        axes=(0, 1)):
    """Exchange halos of a local-view padded block along the sharded axes.
    Must be called INSIDE a shard_map over a mesh with ``axis_names``.
    x first, then y: the y-strips carry filled x-halos, which completes the
    corners in two hops."""
    for axis, name in zip(axes, axis_names):
        a = _exchange_axis(a, halo[axis], local_n[axis], axis, name)
    return a


def make_halo_exchange(mesh, halo, local_n, axes=(0, 1)):
    """Build a jitted global-function that performs the local-view halo
    exchange for arrays laid out as per-shard padded blocks."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(*[mesh.axis_names[axes.index(i)] if i in axes else None
               for i in range(3)])

    def fn(a):
        return halo_exchange_local(a, halo, local_n,
                                   axis_names=mesh.axis_names, axes=axes)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(spec,),
                             out_specs=spec))
