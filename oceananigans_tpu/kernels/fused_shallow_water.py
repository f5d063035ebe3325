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

    # When the padded y extent is already 128-aligned (the model rounds Hy
    # for eligible configs), skip the pad/embed copies entirely: slabs read
    # the arrays in place and `new` tiles DMA straight into PADDED output
    # buffers (x-halo rows garbage, refilled at the next stage's fill). At
    # 16384² the transient gigabyte pad/embed copies otherwise OOM the chip.
    direct = (YPAD == NYp)

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
            newslabs = refs[k0:k0 + (nf if direct else 0)]
            k0 += nf if direct else 0
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
            wcopies = []
            for k, n in enumerate(names):
                Gt = G[n][sx, :]
                outs[k][:] = Gt
                inc = gdt * Gt
                if with_gm:
                    inc = inc + zdt_ref[0, 0] * gms[k][:]
                newv = fields[n][sx, :] + inc
                if direct:
                    newslabs[k][:] = newv
                    dma = pltpu.make_async_copy(
                        newslabs[k],
                        outs[nf + k].at[pl.ds(x0 + Hx, TX), :],
                        sems.at[k])
                    dma.start()
                    wcopies.append(dma)
                else:
                    outs[nf + k][:] = newv
            for dma in wcopies:
                dma.wait()

        n_scal = 2 if with_gm else 1
        tile_spec = pl.BlockSpec((TX, YPAD), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (nf + 1)
        if with_gm:
            in_specs += [tile_spec] * nf
        in_specs += [smem_spec] * n_scal
        if direct:
            new_specs = [pl.BlockSpec(memory_space=pl.ANY)] * nf
            new_shapes = [jax.ShapeDtypeStruct((NXp, NYp), grid.dtype)] * nf
            extra_scratch = [pltpu.VMEM((TX, YPAD), grid.dtype)] * nf
        else:
            new_specs = [tile_spec] * nf
            new_shapes = [jax.ShapeDtypeStruct((Nx, YPAD), grid.dtype)] * nf
            extra_scratch = []
        return pl.pallas_call(
            kernel,
            grid=(Nx // TX,),
            in_specs=in_specs,
            out_specs=[tile_spec] * nf + new_specs,
            out_shape=[jax.ShapeDtypeStruct((Nx, YPAD), grid.dtype)] * nf
            + new_shapes,
            scratch_shapes=([pltpu.VMEM(slab_shape, grid.dtype)] * (nf + 1)
                            + extra_scratch
                            + [pltpu.SemaphoreType.DMA((nf + 1,))]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )

    call0 = make_call(False)
    call1 = make_call(True)
    sx = slice(Hx, Hx + Nx)

    def fused_update(fields, Gm, gamma_dt, zeta_dt):
        if direct:
            args = [jnp.reshape(fields[n], (NXp, NYp)) for n in names] + [hB2]
        else:
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
            if direct:
                new[n] = jnp.reshape(outs[nf + k], (NXp, NYp, 1))
            else:
                full = jnp.zeros((NXp, NYp), grid.dtype)
                full = full.at[sx, :].set(outs[nf + k][:, :NYp])
                new[n] = jnp.reshape(full, (NXp, NYp, 1))
        return G_int, new

    return fused_update


def build_sharded_fused_sw_update(grid, scheme, g, coriolis, hB,
                                  tracer_names, mesh):
    """The fused shallow-water stage under an (x, y) device mesh: global-view
    padded fields are re-blocked into per-shard locally-padded slabs inside a
    ``shard_map``; ppermute strips fill the local halos
    (parallel/halo_exchange.py) and the per-shard Pallas kernel runs on its
    local block (the multi-chip continuation of the fused path — pure GSPMD
    would fall back to XLA because Pallas calls are opaque to the
    partitioner).

    Same signature as :func:`build_fused_sw_update`; the inter-stage ``Gm``
    arrays are opaque per-shard-blocked global arrays threaded back in."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..grids.rectilinear import RectilinearGrid
    from ..parallel.halo_exchange import halo_exchange_local

    names = ("uh", "vh", "h") + tuple(tracer_names)
    nf = len(names)
    Nx, Ny, _ = grid.N
    Hx, Hy, _ = grid.H
    axn = mesh.axis_names
    Sx, Sy = mesh.devices.shape
    if Nx % Sx or Ny % Sy:
        raise ValueError("interior must divide the mesh")
    nlx, nly = Nx // Sx, Ny // Sy
    ext = grid.extent
    lgrid = RectilinearGrid(
        size=(nlx, nly), extent=(ext[0] * nlx / Nx, ext[1] * nly / Ny),
        topology=grid.topology, halo=(Hx, Hy, 0), dtype=grid.dtype)

    spec3 = P(axn[0], axn[1], None)
    specG = P(axn[0], axn[1])
    gsx, gsy = slice(Hx, Hx + Nx), slice(Hy, Hy + Ny)
    lsx, lsy = slice(Hx, Hx + nlx), slice(Hy, Hy + nly)

    def pad_exchange(a):
        a = jnp.pad(a, [(Hx, Hx), (Hy, Hy), (0, 0)])
        return halo_exchange_local(a, (Hx, Hy, 0), (nlx, nly, 1),
                                   axis_names=axn)

    def make_body(with_gm):
        def body(*args):
            ins = args[:nf]
            hb_loc = args[nf]
            k0 = nf + 1
            gms = list(args[k0:k0 + (nf if with_gm else 0)])
            k0 += nf if with_gm else 0
            gd, zd = args[k0], args[k0 + 1]
            padded = [pad_exchange(a) for a in ins]
            fields_loc = dict(zip(names, padded))
            local_fused = build_fused_sw_update(
                lgrid, scheme, g, coriolis, pad_exchange(hb_loc),
                tracer_names)
            G_int, new = local_fused(fields_loc, gms if with_gm else None,
                                     gd, zd)
            return (tuple(G_int)
                    + tuple(new[n][lsx, lsy, :] for n in names))

        return body

    smapped0 = shard_map(make_body(False), mesh=mesh,
                         in_specs=(spec3,) * (nf + 1) + (P(), P()),
                         out_specs=(specG,) * nf + (spec3,) * nf,
                         check_vma=False)
    smapped1 = shard_map(make_body(True), mesh=mesh,
                         in_specs=(spec3,) * (nf + 1) + (specG,) * nf
                         + (P(), P()),
                         out_specs=(specG,) * nf + (spec3,) * nf,
                         check_vma=False)

    NXp, NYp, _ = grid.padded_shape
    hb_int = jnp.reshape(hB, (NXp, NYp, 1))[gsx, gsy, :]

    def fused_update(fields, Gm, gamma_dt, zeta_dt):
        ins = [fields[n][gsx, gsy, :] for n in names] + [hb_int]
        gd = jnp.asarray(gamma_dt, grid.dtype)
        zd = jnp.asarray(zeta_dt, grid.dtype)
        if Gm is None:
            outs = smapped0(*ins, gd, zd)
        else:
            outs = smapped1(*ins, *Gm, gd, zd)
        G_int = list(outs[:nf])
        new = {}
        shape = grid.padded_shape
        for k, n in enumerate(names):
            full = jnp.zeros(shape, grid.dtype)
            new[n] = full.at[gsx, gsy, :].set(outs[nf + k])
        return G_int, new

    return fused_update
