"""Pallas fused shallow-water step kernel (2D).

The reference's second headline benchmark is the 16384² shallow-water step
(docs/src/appendix/benchmarks.md:35-75). The XLA path materializes every
stencil intermediate through HBM — at 8192² that is dozens of ~270 MB
sweeps per stage and the step is purely bandwidth-bound. This kernel is the
2D analogue of kernels/fused_advection.py: the whole conservative-form
tendency (models/shallow_water.py::conservative_tendencies — WENO transports,
gravity, coriolis, bathymetry, tracers) PLUS the RK3 stage update evaluates
per x-tile on VMEM-resident (TX+2Hx, NYpadded) slabs, one HBM read per field
per stage.

Layout: 2D arrays (x, y) with y as the 128-lane minor dim; tiles split x
only (y stays whole — at 16384 a slab row set is ~5 MB/field, well inside
VMEM). Mosaic DMA alignment requires the x (sublane) slice starts/sizes be
multiples of 8, so the model rounds Hx up to 8 and TX is a multiple of 8.

Eligibility: regular grid, periodic x/y, z-Flat, conservative formulation
(the model gates closure/forcing/BCs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_advection import _TileGrid, _pick_tile


def sw_eligible(grid, formulation="conservative"):
    from ..grids.topology import PERIODIC

    return (getattr(grid, "all_regular", False)
            and formulation == "conservative"
            and grid.is_flat(2)
            and not grid.is_flat(0) and not grid.is_flat(1)
            and grid.topology[0] == PERIODIC
            and grid.topology[1] == PERIODIC
            and _pick_tile(grid.N[0], (64, 32, 16, 8)) is not None)


def build_fused_sw_update(grid, scheme, g, coriolis, hB, tracer_names):
    """Return fn(fields, Gm, gamma_dt, zeta_dt) -> (G_int list, new dict).

    ``fields``: dict of PADDED (NXp, NYp, 1) arrays with filled halos for
    uh, vh, h and each tracer. ``Gm``: list of interior-x (Nx, NYp) arrays
    from the previous stage (None on stage 1). ``new``: padded arrays whose
    x-halo slots are garbage (refilled at the next stage's fill).
    ``hB``: the padded bathymetry array (static extra input)."""
    from ..grids.topology import PERIODIC
    from ..models.shallow_water import conservative_tendencies

    if grid.topology[0] != PERIODIC or grid.topology[1] != PERIODIC:
        raise ValueError("fused shallow-water requires periodic x/y")
    Hx, Hy, _ = grid.H
    Nx, Ny, _ = grid.N
    NXp, NYp, _ = grid.padded_shape
    if Hx % 8:
        raise ValueError("fused shallow-water needs Hx % 8 == 0 (Mosaic "
                         "sublane DMA alignment); the model rounds Hx up")
    tgrid = _TileGrid(grid)
    names = ("uh", "vh", "h") + tuple(tracer_names)
    nf = len(names)
    # Mosaic DMA slices must be 128-aligned along the lane (y) dim: pad the
    # 2D views to YPAD columns before the call (stencils never read the pad
    # from valid output rows)
    YPAD = -(-NYp // 128) * 128
    # pick the largest tile whose slabs + double-buffered out blocks fit
    # VMEM (grows with the y extent: at 16384² TX=64 would need ~150 MB)
    TX = None
    for cand in (64, 32, 16, 8):
        if Nx % cand:
            continue
        est = ((nf + 1) * (cand + 2 * Hx) * YPAD * 4
               + 2 * (3 * nf) * cand * YPAD * 4)
        if est <= 90 * 1024 * 1024:
            TX = cand
            break
    if TX is None:
        raise ValueError("Nx not tileable for the fused shallow-water kernel")
    slab_shape = (TX + 2 * Hx, YPAD)
    ypad = [(0, 0), (0, YPAD - NYp)]
    hB2 = jnp.pad(jnp.reshape(hB, (NXp, NYp)), ypad)

    def make_call(with_gm):
        def kernel(*refs):
            k0 = 0
            ins = refs[k0:k0 + nf]; k0 += nf
            hb_ref = refs[k0]; k0 += 1
            gms = refs[k0:k0 + (nf if with_gm else 0)]
            k0 += nf if with_gm else 0
            gdt_ref = refs[k0]; k0 += 1
            zdt_ref = None
            if with_gm:
                zdt_ref = refs[k0]; k0 += 1
            outs = refs[k0:k0 + 2 * nf]; k0 += 2 * nf
            slabs = refs[k0:k0 + nf]; k0 += nf
            hb_slab = refs[k0]; k0 += 1
            sems = refs[k0]
            i = pl.program_id(0)
            x0 = i * TX
            copies = []
            for k in range(nf):
                dma = pltpu.make_async_copy(
                    ins[k].at[pl.ds(x0, TX + 2 * Hx), :], slabs[k],
                    sems.at[k])
                dma.start()
                copies.append(dma)
            dma = pltpu.make_async_copy(
                hb_ref.at[pl.ds(x0, TX + 2 * Hx), :], hb_slab, sems.at[nf])
            dma.start()
            copies.append(dma)
            for dma in copies:
                dma.wait()

            fields = {n: slabs[k][:] for k, n in enumerate(names)}
            G = conservative_tendencies(tgrid, scheme, g, coriolis,
                                        hb_slab[:], tracer_names, fields)
            gdt = gdt_ref[0, 0]
            sx = slice(Hx, Hx + TX)
            for k, n in enumerate(names):
                Gt = G[n][sx, :]
                outs[k][:] = Gt
                inc = gdt * Gt
                if with_gm:
                    inc = inc + zdt_ref[0, 0] * gms[k][:]
                outs[nf + k][:] = fields[n][sx, :] + inc

        # `new` tiles are written through pipelined VMEM out blocks (x-tiled
        # over the INTERIOR (Nx, NYp) array) — no manual write DMA needed;
        # the model embeds them back into padded buffers with one concat.
        n_scal = 2 if with_gm else 1
        tile_spec = pl.BlockSpec((TX, YPAD), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (nf + 1)
        if with_gm:
            in_specs += [tile_spec] * nf
        in_specs += [smem_spec] * n_scal
        return pl.pallas_call(
            kernel,
            grid=(Nx // TX,),
            in_specs=in_specs,
            out_specs=[tile_spec] * (2 * nf),
            out_shape=[jax.ShapeDtypeStruct((Nx, YPAD), grid.dtype)] * (2 * nf),
            scratch_shapes=([pltpu.VMEM(slab_shape, grid.dtype)] * (nf + 1)
                            + [pltpu.SemaphoreType.DMA((nf + 1,))]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )

    call0 = make_call(False)
    call1 = make_call(True)
    sx = slice(Hx, Hx + Nx)

    def fused_update(fields, Gm, gamma_dt, zeta_dt):
        args = [jnp.pad(jnp.reshape(fields[n], (NXp, NYp)), ypad)
                for n in names] + [hB2]
        gd = jnp.asarray(gamma_dt, grid.dtype).reshape(1, 1)
        if Gm is None:
            outs = call0(*args, gd)
        else:
            zd = jnp.asarray(zeta_dt, grid.dtype).reshape(1, 1)
            outs = call1(*args, *Gm, gd, zd)
        G_int = list(outs[:nf])
        new = {}
        for k, n in enumerate(names):
            full = jnp.zeros((NXp, NYp), grid.dtype)
            full = full.at[sx, :].set(outs[nf + k][:, :NYp])
            new[n] = jnp.reshape(full, (NXp, NYp, 1))
        return G_int, new

    return fused_update
