"""Pallas fused pressure-projection kernels (z-compact fast layout).

The projection phase (reference: pressure_correction.jl:8-53 +
solve_for_pressure.jl:12-108) around the Poisson solve consists of pure
elementwise/stencil passes that XLA materializes as separate HBM sweeps:

    rhs  = interior(div(u*, v*, w*)) / Δt          (read 3 fields, write 1)
    p    = embed(solve(rhs)); fill_halos(p)
    u    = u* - Δt ∂x p,  v = v* - Δt ∂y p,  w = w* - Δt ∂z p

This module fuses them into two Pallas kernels with one HBM read per field:

* ``build_fused_divergence``: per-tile VMEM slabs of (u, v, w) → the scaled
  divergence source term, with the w bottom-face pin (w[0] = 0) folded in.
* ``build_fused_correct``: per-tile p slab (with its stencil ring) + the
  unfilled (u*, v*, w*) interior tiles → corrected velocities DMA'd straight
  into padded HBM buffers (halo slots garbage — the next stage's fill
  re-derives them, exactly like the megakernel's ``new`` outputs).

Eligibility matches the fully-fused megakernel path: regular grid, periodic
x/y, z-compact layout (H[2] == 0, padded z = Nz = whole 128-lane tiles), so
the ∂z p boundary treatment is the Neumann even mirror (∂z p = 0 on the walls,
the same BC the DCT eigenfunction solve imposes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_advection import _pick_tile, _TileGrid


def _check_fast_projection(grid):
    Hx, Hy, Hz = grid.H
    if Hz != 0 or grid.is_flat(2):
        raise ValueError("fused projection requires the z-compact layout")
    if grid.is_flat(0) or grid.is_flat(1):
        raise ValueError("fused projection tiles over (x, y)")
    if not getattr(grid, "all_regular", False):
        raise ValueError("fused projection requires a regular grid")
    ZP = grid.padded_shape[2]
    if ZP % 128:
        raise ValueError("z-compact layout guarantees ZP % 128 == 0")
    if (2 * Hy) % 8:
        raise ValueError("fused projection needs 2*Hy % 8 == 0")
    TX = _pick_tile(grid.N[0], (32, 16, 8, 4, 2))
    TY = _pick_tile(grid.N[1], (64, 32, 16, 128, 8, 4, 2))
    if TX is None or TY is None:
        raise ValueError("grid not tileable for the fused projection")
    return TX, TY


def build_fused_divergence(grid, dct_z=False):
    """Return fn(u, v, w, inv_dt) -> rhs of shape (Nx, Ny, Nz):
    rhs = divᶜᶜᶜ(u, v, w) · inv_dt on the interior, with w's bottom boundary
    face treated as 0 (the rigid-lid pin) and the top face read as the
    out-of-range zero (the lid). Velocity halos must be filled (1 ring used).

    ``dct_z=True``: the kernel additionally applies the DCT-II along z on the
    MXU before storing, emitting b̂z directly — the Poisson solver then skips
    its own z transform (``solve(rhs, zhat_in=True)``), removing one full
    read+write HBM sweep per solve. Requires the z-compact layout (ZP == Nz,
    already guaranteed by _check_fast_projection)."""
    TX, TY = _check_fast_projection(grid)
    Hx, Hy, _ = grid.H
    Nx, Ny, Nz = grid.N
    ZP = grid.padded_shape[2]
    tg = _TileGrid(grid)
    ax_v = float(tg.Ax(None) / tg.V(None))
    ay_v = float(tg.Ay(None) / tg.V(None))
    az_v = float(tg.Az(None) / tg.V(None))
    slab_shape = (TX + 2 * Hx, TY + 2 * Hy, ZP)
    n_in = 4 + (1 if dct_z else 0)

    def kernel(*refs):
        u_ref, v_ref, w_ref, inv_dt_ref = refs[:4]
        dmat_ref = refs[4] if dct_z else None
        out_ref = refs[n_in]
        su, sv, sw, sems = refs[n_in + 1:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0, y0 = i * TX, j * TY
        copies = []
        for k, (ref, slab) in enumerate(((u_ref, su), (v_ref, sv))):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(x0, TX + 2 * Hx), pl.ds(y0, TY + 2 * Hy), :],
                slab, sems.at[k])
            dma.start()
            copies.append(dma)
        # w needs no horizontal stencil ring (only the z difference)
        dma = pltpu.make_async_copy(
            w_ref.at[pl.ds(x0 + Hx, TX), pl.ds(y0 + Hy, TY), :],
            sw, sems.at[2])
        dma.start()
        copies.append(dma)
        for dma in copies:
            dma.wait()
        u = su[:]
        v = sv[:]
        # pin w's bottom boundary face (z slot 0) to 0
        kidx = lax.broadcasted_iota(jnp.int32, sw.shape, 2)
        wt = jnp.where(kidx == 0, 0.0, sw[:])
        sx = slice(Hx, Hx + TX)
        sy = slice(Hy, Hy + TY)
        du = u[Hx + 1:Hx + TX + 1, sy, :] - u[sx, sy, :]
        dv = v[sx, Hy + 1:Hy + TY + 1, :] - v[sx, sy, :]
        # w top face (slot Nz) is the rigid lid = 0: zero-fill the last slot
        dw = jnp.pad(wt[:, :, 1:], [(0, 0), (0, 0), (0, 1)]) - wt
        rhs = (ax_v * du + ay_v * dv + az_v * dw) * inv_dt_ref[0, 0]
        if dct_z:
            # b̂z[..., k] = Σ_n D[k, n] b[..., n] — a lane-axis contraction
            # on the (otherwise idle) MXU. Mosaic only lowers DEFAULT /
            # HIGHEST dot precisions; HIGHEST keeps the transform f32-exact
            # (stricter than the solver's own bf16x3 matmuls)
            flat = rhs.reshape(TX * TY, ZP)
            rhs = jax.lax.dot_general(
                flat, dmat_ref[:], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST).reshape(TX, TY, ZP)
        out_ref[:] = rhs

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3 \
        + [pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    if dct_z:
        in_specs += [pl.BlockSpec((ZP, ZP), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)]
    call = pl.pallas_call(
        kernel,
        grid=(Nx // TX, Ny // TY),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TX, TY, ZP), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nx, Ny, ZP), grid.dtype),
        scratch_shapes=[pltpu.VMEM(slab_shape, grid.dtype)] * 2
        + [pltpu.VMEM((TX, TY, ZP), grid.dtype)]
        + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )

    if dct_z:
        from ..solvers.transforms import dct2_matrix
        D = jnp.asarray(dct2_matrix(ZP), grid.dtype)

        def fused_div(u, v, w, inv_dt):
            s = jnp.asarray(inv_dt, grid.dtype).reshape(1, 1)
            return call(u, v, w, s, D)
    else:
        def fused_div(u, v, w, inv_dt):
            s = jnp.asarray(inv_dt, grid.dtype).reshape(1, 1)
            return call(u, v, w, s)

    return fused_div


def build_fused_correct(grid):
    """Return fn(p, u*, v*, w*, dt) -> (u, v, w) padded arrays whose
    interiors hold the projected velocities u* − Δt ∇p (halo slots garbage).
    ``p`` must be padded with filled halos (1 ring used); the velocity halo
    slots are never read. w's bottom boundary face comes out pinned to 0
    (∂z p = 0 there by the even/Neumann mirror, and the face itself is
    masked)."""
    TX, TY = _check_fast_projection(grid)
    Hx, Hy, _ = grid.H
    Nx, Ny, Nz = grid.N
    ZP = grid.padded_shape[2]
    NP = grid.padded_shape
    tg = _TileGrid(grid)
    inv_dx = 1.0 / float(tg.dx(None))
    inv_dy = 1.0 / float(tg.dy(None))
    inv_dz = 1.0 / float(tg.dz(None))
    pslab_shape = (TX + 2 * Hx, TY + 2 * Hy, ZP)

    def kernel(p_ref, u_ref, v_ref, w_ref, dt_ref,
               uo_ref, vo_ref, wo_ref, sp, su, sv, sw, nu, nv, nw, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0, y0 = i * TX, j * TY
        copies = []
        dma = pltpu.make_async_copy(
            p_ref.at[pl.ds(x0, TX + 2 * Hx), pl.ds(y0, TY + 2 * Hy), :],
            sp, sems.at[0])
        dma.start()
        copies.append(dma)
        for k, (ref, slab) in enumerate(((u_ref, su), (v_ref, sv),
                                         (w_ref, sw))):
            dma = pltpu.make_async_copy(
                ref.at[pl.ds(x0 + Hx, TX), pl.ds(y0 + Hy, TY), :],
                slab, sems.at[k + 1])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        dt = dt_ref[0, 0]
        p = sp[:]
        sx = slice(Hx, Hx + TX)
        sy = slice(Hy, Hy + TY)
        dpx = p[sx, sy, :] - p[Hx - 1:Hx + TX - 1, sy, :]
        dpy = p[sx, sy, :] - p[sx, Hy - 1:Hy + TY - 1, :]
        pt = p[sx, sy, :]
        # ∂z p at w-face k uses p[k] - p[k-1]; face 0 gets the even
        # (Neumann) mirror p[-1] = p[0] → 0, and the face itself is the
        # pinned rigid-lid boundary: mask it outright
        dpz = pt - jnp.pad(pt[:, :, :-1], [(0, 0), (0, 0), (1, 0)])
        kidx = lax.broadcasted_iota(jnp.int32, pt.shape, 2)
        nu[:] = su[:] - dt * inv_dx * dpx
        nv[:] = sv[:] - dt * inv_dy * dpy
        nw[:] = jnp.where(kidx == 0, 0.0, sw[:] - dt * inv_dz * dpz)
        wcopies = []
        for k, (slab, ref) in enumerate(((nu, uo_ref), (nv, vo_ref),
                                         (nw, wo_ref))):
            dma = pltpu.make_async_copy(
                slab, ref.at[pl.ds(x0 + Hx, TX), pl.ds(y0 + Hy, TY), :],
                sems.at[k])
            dma.start()
            wcopies.append(dma)
        for dma in wcopies:
            dma.wait()

        # HALO-VALID OUTPUTS (see fused_advection.make_call): edge tiles
        # mirror their boundary strips into the periodic-image halo slots so
        # the next stage consumes the corrected fields without a fill pass
        NI = Nx // TX
        NJ = Ny // TY

        def strip(slab, ref, src_x, src_y, dst_x, dst_y):
            cp = pltpu.make_async_copy(slab.at[src_x, src_y],
                                       ref.at[dst_x, dst_y], sems.at[3])
            cp.start()
            cp.wait()

        trio = ((nu, uo_ref), (nv, vo_ref), (nw, wo_ref))
        ys_own = pl.ds(y0 + Hy, TY)
        xs_own = pl.ds(x0 + Hx, TX)

        @pl.when(i == 0)
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(0, Hx), slice(None),
                      pl.ds(Hx + Nx, Hx), ys_own)

        @pl.when(i == NI - 1)
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(TX - Hx, Hx), slice(None),
                      pl.ds(0, Hx), ys_own)

        @pl.when(j == 0)
        def _():
            for slab, ref in trio:
                strip(slab, ref, slice(None), pl.ds(0, Hy),
                      xs_own, pl.ds(Hy + Ny, Hy))

        @pl.when(j == NJ - 1)
        def _():
            for slab, ref in trio:
                strip(slab, ref, slice(None), pl.ds(TY - Hy, Hy),
                      xs_own, pl.ds(0, Hy))

        @pl.when(lax.bitwise_and(i == 0, j == 0))
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(0, Hx), pl.ds(0, Hy),
                      pl.ds(Hx + Nx, Hx), pl.ds(Hy + Ny, Hy))

        @pl.when(lax.bitwise_and(i == 0, j == NJ - 1))
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(0, Hx), pl.ds(TY - Hy, Hy),
                      pl.ds(Hx + Nx, Hx), pl.ds(0, Hy))

        @pl.when(lax.bitwise_and(i == NI - 1, j == 0))
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(TX - Hx, Hx), pl.ds(0, Hy),
                      pl.ds(0, Hx), pl.ds(Hy + Ny, Hy))

        @pl.when(lax.bitwise_and(i == NI - 1, j == NJ - 1))
        def _():
            for slab, ref in trio:
                strip(slab, ref, pl.ds(TX - Hx, Hx), pl.ds(TY - Hy, Hy),
                      pl.ds(0, Hx), pl.ds(0, Hy))

    call = pl.pallas_call(
        kernel,
        grid=(Nx // TX, Ny // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=[jax.ShapeDtypeStruct(NP, grid.dtype)] * 3,
        scratch_shapes=[pltpu.VMEM(pslab_shape, grid.dtype)]
        + [pltpu.VMEM((TX, TY, ZP), grid.dtype)] * 6
        + [pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )

    def fused_correct(p, u, v, w, dt):
        s = jnp.asarray(dt, grid.dtype).reshape(1, 1)
        return call(p, u, v, w, s)

    return fused_correct
