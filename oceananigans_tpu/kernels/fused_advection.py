"""Pallas fused advection megakernel.

The single hottest computation (SURVEY.md §3.2: WENO tendency assembly
dominates FLOPs) executed as ONE Pallas kernel per step stage:

* the padded prognostic arrays stay in HBM (`memory_space=ANY`);
* each program instance DMAs an (TX+2Hx, TY+2Hy, ZP) slab — interior tile
  plus its stencil halo — into VMEM scratch (double-buffer-free: one slab per
  field, the DMAs for all fields run concurrently);
* the ENTIRE flux-form advection (WENO reconstructions both sides, advecting-
  velocity interpolation, metric scaling, flux differences) evaluates on the
  VMEM slab with the SAME jnp operator code used by the XLA path
  (advection/fluxes.py) — Mosaic fuses it into one loop nest with VMEM-only
  intermediate traffic, eliminating the HBM round-trips XLA materializes
  between stencil ops;
* outputs are interior-tiled (Nx, Ny, ZP) arrays (z halo slots carry garbage
  and are never consumed — G halos are refilled before use anyway).

Eligibility: regular (scalar-metric) RectilinearGrid; Nx/Ny divisible by the
tile. The model falls back to the XLA path otherwise."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..advection.fluxes import div_Uc, div_Uu, div_Uv, div_Uw


class _TileGrid:
    """Scalar-metric grid proxy for kernel-local evaluation.

    x/y are reported PERIODIC regardless of the parent grid (kernel
    eligibility requires it — tile-local x/y indices cannot carry the
    global near-boundary masks); z keeps the parent topology/H/N so the
    near-wall advection order cascade (schemes.py _cascade_select) sees
    global z indices, which ARE global on every slab."""

    def __init__(self, grid):
        from ..grids.topology import PERIODIC
        self._flat = tuple(grid.is_flat(ax) for ax in range(3))
        self.topology = (PERIODIC, PERIODIC, grid.topology[2])
        self.H = tuple(grid.H)
        self.N = tuple(grid.N)
        # WENO weight divisions inside kernel bodies use the VPU approximate
        # reciprocal (schemes.py _biased; the reference's newton_div(FT2, ·)
        # analogue). Interpret mode (CPU tests) keeps exact division so the
        # Pallas==XLA equivalence tests stay bitwise-comparable.
        self.fast_reciprocal = jax.default_backend() == "tpu"
        ccc = ("c", "c", "c")
        # regular grids: all metrics are location-independent scalars
        self._dx = float(np.asarray(grid.dx(ccc)).reshape(())) \
            if not self._flat[0] else 1.0
        self._dy = float(np.asarray(grid.dy(ccc)).reshape(())) \
            if not self._flat[1] else 1.0
        self._dz = float(np.asarray(grid.dz(ccc)).reshape(())) \
            if not self._flat[2] else 1.0

    def is_flat(self, axis):
        return self._flat[axis]

    def dx(self, loc):
        return self._dx

    def dy(self, loc):
        return self._dy

    def dz(self, loc):
        return self._dz

    def Ax(self, loc):
        return self._dy * self._dz

    def Ay(self, loc):
        return self._dx * self._dz

    def Az(self, loc):
        return self._dx * self._dy

    def V(self, loc):
        return self._dx * self._dy * self._dz


def _pick_tile(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def eligible(grid, n_tracers=0):
    from ..grids.topology import PERIODIC

    if not getattr(grid, "all_regular", False):
        return False
    if grid.is_flat(0) or grid.is_flat(1):
        return False  # tile over (x, y); 2D-in-xy grids use the XLA path
    if grid.topology[0] != PERIODIC or grid.topology[1] != PERIODIC:
        # bounded x/y would need the near-wall order cascade with
        # tile-local indices — those configs take the XLA path
        return False
    ZP = grid.padded_shape[2]
    ZPAD = -(-ZP // 128) * 128
    nf = 3 + n_tracers
    spill = 6 if (grid.H[2] > 0 and not grid.is_flat(2)) else 1
    tx, ty = _pick_tiles_vmem(grid.N[0], grid.N[1], grid.H[0], grid.H[1],
                              ZPAD, ZP, nf, 0, spill_factor=spill)
    return tx is not None and ty is not None


def _pick_tiles_vmem(Nx, Ny, Hx, Hy, ZPAD, ZP, nf, n_new_bufs,
                     budget=66 * 1024 * 1024, spill_factor=1):
    """Best (TX, TY) whose VMEM working set (input slabs + pipelined
    out blocks + stage-update buffers) fits the budget — many-tracer runs
    need smaller tiles than the nf=3 default. Among feasible tiles, pick
    the one with the least halo overcompute (slab area / tile area), then
    the largest tile.

    ``spill_factor`` scales the estimate for kernel bodies whose Mosaic
    register allocation spills scoped VMEM proportional to the slab size
    (the padded-z advection body spilled 123 MB at 128³ with (32, 64)
    tiles; the z-compact body fits — empirically calibrated)."""
    zslice_factor = spill_factor
    best = None
    for TX in (32, 16, 8, 4, 2):
        if Nx % TX:
            continue
        for TY in (64, 32, 16, 128, 8, 4, 2):
            if Ny % TY:
                continue
            slabs = nf * (TX + 2 * Hx) * (TY + 2 * Hy) * ZPAD * 4
            tiles = (2 * nf + n_new_bufs) * TX * TY * ZP * 4
            if (slabs + tiles) * zslice_factor > budget:
                continue
            waste = (TX + 2 * Hx) * (TY + 2 * Hy) / (TX * TY)
            key = (waste, -TX * TY)
            if best is None or key < best[0]:
                best = (key, TX, TY)
    if best is None:
        return None, None
    return best[1], best[2]


def build_fused_advection(grid, scheme, tracer_names):
    """Return fn(u, v, w, tracers_dict) -> (Gu, Gv, Gw, {name: Gc}) of
    PADDED-shape arrays whose interior holds -∇·(𝐯 q); halo slots are
    garbage.

    When the grid is z-halo-free (H[2] == 0, the z-compact fast layout:
    padded z = Nz = a whole number of 128-lane tiles, so the VMEM slabs and
    all VPU stencil arithmetic shrink from 3 lane-tiles to 2 — measured −26%
    tendency cost), the z boundary conditions are applied INSIDE the stencil
    reads (shift_zbc): even mirror for u/v/tracers, odd-face (pinned w=0
    faces) for w; flux deltas need no fixes because boundary-face fluxes
    vanish and the out-of-range zero-fill reproduces exactly that."""
    from ..grids.topology import PERIODIC
    if grid.topology[0] != PERIODIC or grid.topology[1] != PERIODIC:
        raise ValueError("fused advection requires periodic x/y (the "
                         "near-wall order cascade needs global indices)")
    Hx, Hy, Hz = grid.H
    z_compact = (Hz == 0 and not grid.is_flat(2))
    zbc = None
    if z_compact:
        zbc = {"u": "even", "v": "even", "w": "odd_face"}
        zbc["c"] = "even"
    Nx, Ny, Nz = grid.N
    ZP = grid.padded_shape[2]
    tgrid = _TileGrid(grid)
    names = tuple(tracer_names)
    nf = 3 + len(names)
    # tile sweep on v5e at 256^3: TX=32/TY=64 fastest (10.44 ms vs
    # 10.84 for 16/64); larger TX amortizes the y/z halo overhead, but
    # many-tracer runs must shrink to fit VMEM
    ZPAD0 = -(-ZP // 128) * 128
    spill = 6 if (Hz > 0 and not grid.is_flat(2)) else 1
    TX, TY = _pick_tiles_vmem(Nx, Ny, Hx, Hy, ZPAD0, ZP, nf, 0,
                              spill_factor=spill)
    if TX is None or TY is None:
        raise ValueError("grid not tileable for the fused kernel")

    if (2 * Hy) % 8:
        raise ValueError("fused kernel needs 2*Hy % 8 == 0 (Mosaic DMA "
                         "sublane alignment); the model rounds Hy up")
    # Mosaic DMA slices must be 128-aligned in the lane (z) dim: inputs are
    # zero-padded to ZPAD before the call (cheap single pads)
    ZPAD = -(-ZP // 128) * 128
    slab_shape = (TX + 2 * Hx, TY + 2 * Hy, ZPAD)

    def kernel(*refs):
        ins = refs[:nf]
        outs = refs[nf:2 * nf]
        slabs = refs[2 * nf:3 * nf]
        sems = refs[3 * nf]
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = i * TX
        y0 = j * TY
        copies = []
        for k in range(nf):
            dma = pltpu.make_async_copy(
                ins[k].at[pl.ds(x0, TX + 2 * Hx), pl.ds(y0, TY + 2 * Hy), :],
                slabs[k], sems.at[k])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        u = slabs[0][:]
        v = slabs[1][:]
        w = slabs[2][:]

        # trim each directional term's transverse extents to the tile before
        # the expensive reconstructions (fluxes.py _term_trims)
        tile = (slice(Hx, Hx + TX), slice(Hy, Hy + TY))

        # outputs stay ZPAD lanes wide: slicing to a non-128-multiple ZP
        # INSIDE the kernel forces unaligned lane stores that spilled 123 MB
        # of Mosaic registers at 128³; the ZP slice happens outside in XLA
        outs[0][:] = -div_Uu(tgrid, scheme, u, v, w, zbc=zbc, tile=tile)
        outs[1][:] = -div_Uv(tgrid, scheme, u, v, w, zbc=zbc, tile=tile)
        outs[2][:] = -div_Uw(tgrid, scheme, u, v, w, zbc=zbc, tile=tile)
        for t, name in enumerate(names):
            c = slabs[3 + t][:]
            outs[3 + t][:] = -div_Uc(tgrid, scheme, u, v, w, c,
                                     zbc=zbc, tile=tile)

    call = pl.pallas_call(
        kernel,
        grid=(Nx // TX, Ny // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=[pl.BlockSpec((TX, TY, ZPAD), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * nf,
        out_shape=[jax.ShapeDtypeStruct((Nx, Ny, ZPAD), grid.dtype)] * nf,
        scratch_shapes=([pltpu.VMEM(slab_shape, grid.dtype)] * nf
                        + [pltpu.SemaphoreType.DMA((nf,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # CPU backend (tests): run the kernel in the Pallas interpreter
        interpret=jax.default_backend() == "cpu",
    )

    sx = slice(Hx, Hx + Nx)
    sy = slice(Hy, Hy + Ny)

    zpad = [(0, 0), (0, 0), (0, ZPAD - ZP)]

    def fused(u, v, w, tracers):
        args = [jnp.pad(a, zpad) for a in
                [u, v, w] + [tracers[n] for n in names]]
        outs = call(*args)
        shape = grid.padded_shape

        def embed(o):
            full = jnp.zeros(shape, o.dtype)
            return full.at[sx, sy, :].set(o[:, :, :ZP])

        Gu, Gv, Gw = embed(outs[0]), embed(outs[1]), embed(outs[2])
        Gc = {n: embed(outs[3 + t]) for t, n in enumerate(names)}
        return Gu, Gv, Gw, Gc

    return fused


def _build_update_group(grid, scheme, tracer_names, include_momentum,
                        with_corr=False, p_zspectral=False):
    """One advection+RK3-update kernel over a GROUP of advected fields:
    momentum (u, v, w) and/or a batch of tracers. u, v, w are always
    inputs (advecting velocities); G and ``new`` outputs exist only for
    the advected fields. Tracer batching keeps VMEM tiles large for
    many-tracer runs (see build_fused_advection_update).

    ``with_corr``: fold the PREVIOUS stage's pressure correction into this
    kernel — inputs are the uncorrected (u*, v*, w*) plus the padded
    pressure p; the kernel applies q ← q* − Δt_prev ∇p on the VMEM slabs
    before advecting (eliminating the separate fused_correct HBM pass for
    all but the last RK3 stage). Requires H ≥ required_halo + 1 in x and y
    (the correction consumes one extra stencil ring on the slab).

    ``p_zspectral``: the incoming p slab is still in DCT-z space (the
    Poisson solver ran with zhat_out=True, skipping its inverse z transform
    HBM sweep); the kernel applies the iDCT on the slab via the idle MXU
    before taking ∇p. Requires the z-compact layout (ZP == Nz)."""
    Hx, Hy, Hz = grid.H
    z_compact = (Hz == 0 and not grid.is_flat(2))
    zbc = None
    if z_compact:
        zbc = {"u": "even", "v": "even", "w": "odd_face", "c": "even"}
    Nx, Ny, Nz = grid.N
    ZP = grid.padded_shape[2]
    tgrid = _TileGrid(grid)
    names = tuple(tracer_names)
    nf = 3 + len(names)          # input slabs (u, v, w + batch tracers)
    n_in = nf + (1 if with_corr else 0)      # [+ the pressure slab]
    nfo = (3 if include_momentum else 0) + len(names)   # advected fields
    src_of = (list(range(3)) if include_momentum else []) \
        + [3 + t for t in range(len(names))]
    if with_corr:
        req = getattr(scheme, "required_halo", 1)
        if Hx < req + 1 or Hy < req + 1:
            raise ValueError("with_corr needs one spare halo ring beyond "
                             "the advection stencil (bump Hx/Hy)")
        inv_dx = 1.0 / float(tgrid.dx(None))
        inv_dy = 1.0 / float(tgrid.dy(None))
        inv_dz = 1.0 / float(tgrid.dz(None))
    ZPAD0 = -(-ZP // 128) * 128
    # double-buffered slabs (2·n_in) + pipelined G outs + Gm input tiles +
    # new-slabs (2·nfo each)
    # the padded-z body spills scoped VMEM ~6x its slab estimate (same
    # calibration as the eligibility gate above — at 128^3 the unscaled
    # pick chose (32, 64) tiles and Mosaic allocated 107 MB against the
    # 100 MB limit, an AOT compile failure)
    _spill = 6 if (Hz > 0 and not grid.is_flat(2)) else 1
    TX, TY = _pick_tiles_vmem(Nx, Ny, Hx, Hy, ZPAD0, ZP, 2 * n_in,
                              max(0, 6 * nfo - 4 * n_in),
                              spill_factor=_spill)
    import os as _os
    _tiles_env = _os.environ.get("FUSED_UPDATE_TILES")
    dma_io = False
    # probe knob: accumulate the three directional divergence terms
    # sequentially through the VMEM output ref instead of as one fused
    # expression — each store is a scheduling barrier that caps Mosaic's
    # live ranges (the monolithic 3-axis expression spills scoped VMEM
    # at large tiles)
    split_terms = _os.environ.get("FUSED_SPLIT_TERMS") == "1"
    if _tiles_env:
        # probe knob: "TXxTY[:dma][:split]" overrides the tile pick; the
        # ":dma" suffix switches G/Gm/new from pipelined tile buffers to
        # single-buffered DMA scratch (frees VMEM for larger tiles at the
        # cost of per-tile DMA serialization)
        part = _tiles_env.split(":")
        TX, TY = (int(v) for v in part[0].split("x"))
        dma_io = "dma" in part[1:]
        split_terms = split_terms or "split" in part[1:]
    if TX is None or TY is None:
        raise ValueError("grid not tileable for the fused kernel")
    if (2 * Hy) % 8:
        raise ValueError("fused kernel needs 2*Hy % 8 == 0")
    ZPAD = -(-ZP // 128) * 128
    slab_shape = (TX + 2 * Hx, TY + 2 * Hy, ZPAD)

    NI, NJ = Nx // TX, Ny // TY
    NT = NI * NJ

    def make_call(with_gm):
        def kernel(*refs):
            k0 = 0
            ins = refs[k0:k0 + n_in]; k0 += n_in
            gms = refs[k0:k0 + (nfo if with_gm else 0)]
            k0 += nfo if with_gm else 0
            gdt_ref = refs[k0]; k0 += 1
            zdt_ref = None
            if with_gm:
                zdt_ref = refs[k0]; k0 += 1
            cdt_ref = None
            if with_corr:
                cdt_ref = refs[k0]; k0 += 1
            idct_ref = None
            if with_corr and p_zspectral:
                idct_ref = refs[k0]; k0 += 1
            outs = refs[k0:k0 + 2 * nfo]; k0 += 2 * nfo
            slabs = refs[k0:k0 + n_in]; k0 += n_in
            newslabs = refs[k0:k0 + nfo]; k0 += nfo
            gm_slabs = g_slabs = acc_slabs = None
            if dma_io:
                if with_gm:
                    gm_slabs = refs[k0:k0 + nfo]; k0 += nfo
                g_slabs = refs[k0:k0 + nfo]; k0 += nfo
            elif split_terms:
                acc_slabs = refs[k0:k0 + nfo]; k0 += nfo
            sems_in = refs[k0]; k0 += 1
            sems_out = refs[k0]; k0 += 1
            sems_strip = refs[k0]
            i = pl.program_id(0)
            j = pl.program_id(1)
            # double-buffered prefetch: the grid runs row-major (j fastest);
            # at step t the t+1 slabs stream in while t computes
            t = i * NJ + j
            two = jnp.int32(2)
            cur = jax.lax.rem(t, two)
            nxt = jax.lax.rem(t + jnp.int32(1), two)
            jn = j + 1
            i_next = i + jnp.where(jn == NJ, 1, 0)
            j_next = jnp.where(jn == NJ, 0, jn)

            def dma_in(ti, tj, buf, k):
                return pltpu.make_async_copy(
                    ins[k].at[pl.ds(ti * TX, TX + 2 * Hx),
                              pl.ds(tj * TY, TY + 2 * Hy), :],
                    slabs[k].at[buf], sems_in.at[buf, k])

            @pl.when(t == 0)
            def _():
                for k in range(n_in):
                    dma_in(i, j, cur, k).start()

            @pl.when(t + 1 < NT)
            def _():
                for k in range(n_in):
                    dma_in(i_next, j_next, nxt, k).start()

            if dma_io and with_gm:
                gm_copies = []
                for k in range(nfo):
                    cp = pltpu.make_async_copy(
                        gms[k].at[pl.ds(i * TX, TX), pl.ds(j * TY, TY), :],
                        gm_slabs[k], sems_strip.at[k % 4])
                    cp.start()
                    gm_copies.append(cp)
                for cp in gm_copies:
                    cp.wait()

            for k in range(n_in):
                dma_in(i, j, cur, k).wait()

            u = slabs[0][cur]
            v = slabs[1][cur]
            w = slabs[2][cur]
            if with_corr:
                # previous stage's projection applied in VMEM: q ← q* − Δt∇p
                # (see build_fused_correct for the stencil/pin conventions;
                # slab index 0 of each horizontal axis has no p[i−1] — it is
                # never consumed because H ≥ required_halo + 1)
                cdt = cdt_ref[0, 0]
                p = slabs[nf][cur]
                if p_zspectral:
                    # p̂ → p: iDCT along the lane axis on the MXU (the solver
                    # skipped its inverse z sweep). Mosaic lowers only
                    # DEFAULT/HIGHEST dot precision; HIGHEST = f32-exact
                    sh = p.shape
                    p = jax.lax.dot_general(
                        p.reshape(sh[0] * sh[1], sh[2]), idct_ref[:],
                        (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST).reshape(sh)
                dpx = p - jnp.pad(p[:-1], [(1, 0), (0, 0), (0, 0)])
                dpy = p - jnp.pad(p[:, :-1], [(0, 0), (1, 0), (0, 0)])
                dpz = p - jnp.pad(p[:, :, :-1], [(0, 0), (0, 0), (1, 0)])
                kidx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 2)
                u = u - cdt * inv_dx * dpx
                v = v - cdt * inv_dy * dpy
                w = jnp.where(kidx == 0, 0.0, w - cdt * inv_dz * dpz)
            gdt = gdt_ref[0, 0]

            tile = (slice(Hx, Hx + TX), slice(Hy, Hy + TY))

            def ztile(a):
                return a[:, :, :ZP]

            def out_tile(a):
                return a[Hx:Hx + TX, Hy:Hy + TY, :ZP]

            div_of = []
            if include_momentum:
                div_of += [
                    lambda ax: -div_Uu(tgrid, scheme, u, v, w, zbc=zbc,
                                       tile=tile, only_axis=ax),
                    lambda ax: -div_Uv(tgrid, scheme, u, v, w, zbc=zbc,
                                       tile=tile, only_axis=ax),
                    lambda ax: -div_Uw(tgrid, scheme, u, v, w, zbc=zbc,
                                       tile=tile, only_axis=ax)]
            for tr in range(len(names)):
                div_of.append(
                    lambda ax, _c=slabs[3 + tr][cur]:
                    -div_Uc(tgrid, scheme, u, v, w, _c, zbc=zbc,
                            tile=tile, only_axis=ax))
            if not split_terms:
                Gs = [fn(None) for fn in div_of]
                Gs = [ztile(g) for g in Gs]

            def dma_out(buf, k, ti, tj):
                return pltpu.make_async_copy(
                    newslabs[k].at[buf],
                    outs[nfo + k].at[pl.ds(ti * TX + Hx, TX),
                                     pl.ds(tj * TY + Hy, TY), :],
                    sems_out.at[buf, k])

            # the write into newslabs[cur] two steps ago must have drained
            @pl.when(t >= 2)
            def _():
                for k in range(nfo):
                    # identical byte count: the wait only needs the shape
                    dma_out(cur, k, i, j).wait()

            for k in range(nfo):
                if split_terms:
                    # sequential per-axis accumulation THROUGH a VMEM
                    # scratch ref: each store is a scheduling barrier that
                    # caps Mosaic's live ranges (the monolithic 3-axis
                    # expression spills scoped VMEM at large tiles)
                    tgt = g_slabs[k] if dma_io else acc_slabs[k]
                    first = True
                    for ax in range(3):
                        if tgrid.is_flat(ax):
                            continue
                        term = ztile(div_of[k](ax))
                        tgt[:] = term if first else tgt[:] + term
                        first = False
                    Gk = tgt[:]
                    if not dma_io:
                        outs[k][:] = Gk
                else:
                    tgt = g_slabs[k] if dma_io else outs[k]
                    tgt[:] = Gs[k]
                    Gk = Gs[k]
                if dma_io:
                    gcp = pltpu.make_async_copy(
                        g_slabs[k],
                        outs[k].at[pl.ds(i * TX, TX), pl.ds(j * TY, TY), :],
                        sems_strip.at[k % 4])
                    gcp.start()
                    gcp.wait()
                inc = gdt * Gk
                if with_gm:
                    gmv = gm_slabs[k][:] if dma_io else gms[k][:]
                    inc = inc + zdt_ref[0, 0] * gmv
                newslabs[k][cur] = out_tile(slabs[src_of[k]][cur]) + inc
                dma_out(cur, k, i, j).start()

            # HALO-VALID OUTPUTS: edge tiles also write their boundary
            # strips into the opposite (periodic-image) halo slots, so the
            # projection divergence and the next stage's slab DMAs consume
            # `new` directly — no fill pass between kernels. Strip copies
            # are tiny; immediate waits keep buffer management simple.
            def strip(k, src_x, src_y, dst_x, dst_y, sem_idx):
                cp = pltpu.make_async_copy(
                    newslabs[k].at[cur, src_x, src_y],
                    outs[nfo + k].at[dst_x, dst_y],
                    sems_strip.at[sem_idx])
                cp.start()
                cp.wait()

            ys_own = pl.ds(j * TY + Hy, TY)
            xs_own = pl.ds(i * TX + Hx, TX)

            @pl.when(i == 0)
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(0, Hx), slice(None),
                          pl.ds(Hx + Nx, Hx), ys_own, 0)

            @pl.when(i == NI - 1)
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(TX - Hx, Hx), slice(None),
                          pl.ds(0, Hx), ys_own, 1)

            @pl.when(j == 0)
            def _():
                for k in range(nfo):
                    strip(k, slice(None), pl.ds(0, Hy),
                          xs_own, pl.ds(Hy + Ny, Hy), 2)

            @pl.when(j == NJ - 1)
            def _():
                for k in range(nfo):
                    strip(k, slice(None), pl.ds(TY - Hy, Hy),
                          xs_own, pl.ds(0, Hy), 3)

            @pl.when(jnp.logical_and(i == 0, j == 0))
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(0, Hx), pl.ds(0, Hy),
                          pl.ds(Hx + Nx, Hx), pl.ds(Hy + Ny, Hy), 0)

            @pl.when(jnp.logical_and(i == 0, j == NJ - 1))
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(0, Hx), pl.ds(TY - Hy, Hy),
                          pl.ds(Hx + Nx, Hx), pl.ds(0, Hy), 1)

            @pl.when(jnp.logical_and(i == NI - 1, j == 0))
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(TX - Hx, Hx), pl.ds(0, Hy),
                          pl.ds(0, Hx), pl.ds(Hy + Ny, Hy), 2)

            @pl.when(jnp.logical_and(i == NI - 1, j == NJ - 1))
            def _():
                for k in range(nfo):
                    strip(k, pl.ds(TX - Hx, Hx), pl.ds(TY - Hy, Hy),
                          pl.ds(0, Hx), pl.ds(0, Hy), 3)

            # drain all outstanding writes at the end of the grid
            @pl.when(t == NT - 1)
            def _():
                for k in range(nfo):
                    dma_out(cur, k, i, j).wait()
                if NT > 1:
                    for k in range(nfo):
                        dma_out(nxt, k, i, j).wait()

        n_scal = (2 if with_gm else 1) + (1 if with_corr else 0)
        tile_spec = pl.BlockSpec((TX, TY, ZP), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs = [any_spec] * nf
        if with_gm:
            in_specs += ([any_spec] if dma_io else [tile_spec]) * nfo
        in_specs += [smem_spec] * n_scal
        if with_corr:
            # the padded pressure rides as the last DMA'd input (after the
            # scalars in the ref list order established by the kernel body)
            in_specs = in_specs[:nf] + [any_spec] + in_specs[nf:]
        if with_corr and p_zspectral:
            # the iDCT matrix, a constant (ZPAD, ZPAD) VMEM block
            in_specs += [pl.BlockSpec((ZPAD, ZPAD), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)]
        NP = grid.padded_shape
        scratch = [pltpu.VMEM((2,) + slab_shape, grid.dtype)] * n_in \
            + [pltpu.VMEM((2, TX, TY, ZP), grid.dtype)] * nfo
        if dma_io:
            if with_gm:
                scratch += [pltpu.VMEM((TX, TY, ZP), grid.dtype)] * nfo
            scratch += [pltpu.VMEM((TX, TY, ZP), grid.dtype)] * nfo
        elif split_terms:
            scratch += [pltpu.VMEM((TX, TY, ZP), grid.dtype)] * nfo
        scratch += [pltpu.SemaphoreType.DMA((2, n_in)),
                    pltpu.SemaphoreType.DMA((2, max(nfo, 1))),
                    pltpu.SemaphoreType.DMA((4,))]
        return pl.pallas_call(
            kernel,
            grid=(Nx // TX, Ny // TY),
            in_specs=in_specs,
            # G: interior tiles (consumed as next stage's Gm); new: written
            # straight into PADDED HBM buffers by DMA with halo-valid
            # periodic edge strips, no embed pass
            out_specs=([any_spec] if dma_io else [tile_spec]) * nfo
            + [any_spec] * nfo,
            out_shape=[jax.ShapeDtypeStruct((Nx, Ny, ZP), grid.dtype)] * nfo
            + [jax.ShapeDtypeStruct(NP, grid.dtype)] * nfo,
            scratch_shapes=scratch,
            # 124 MB of the v5e's 128 MB VMEM: the corr-fused body's scoped
            # allocation measured 107.9 MB at (32,64) tiles — over the
            # conventional 100 MB margin but comfortably on-chip (the
            # separate-correct body fits under 100 MB either way)
            compiler_params=pltpu.CompilerParams(
                # the plain with-Gm variant at 128^3 z-compact allocates
                # 107.4 MB of scoped VMEM against v5e's 128 MB (Mosaic's
                # stack estimate, not the tile pick) — 112 MB clears it
                # without changing any kernel that already fit
                vmem_limit_bytes=(124 if with_corr else 112) * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )

    if p_zspectral and not z_compact:
        raise ValueError("p_zspectral requires the z-compact layout")
    call0 = make_call(False)
    call1 = make_call(True)
    zpad = [(0, 0), (0, 0), (0, ZPAD - ZP)]
    out_names = (("u", "v", "w") if include_momentum else ()) + names
    idct = None
    if with_corr and p_zspectral:
        from ..solvers.transforms import idct2_matrix
        idct = jnp.asarray(idct2_matrix(ZPAD), grid.dtype)

    def fused_update(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                     p=None, corr_dt=None):
        args = [jnp.pad(a, zpad) for a in
                [u, v, w] + [tracers[n] for n in names]]
        if with_corr:
            if p is None:
                raise ValueError("with_corr kernel needs p and corr_dt")
            args.append(jnp.pad(p, zpad))
        g = jnp.asarray(gamma_dt, grid.dtype).reshape(1, 1)
        scal = [g]
        if Gm is not None:
            scal.append(jnp.asarray(zeta_dt, grid.dtype).reshape(1, 1))
        if with_corr:
            scal.append(jnp.asarray(corr_dt, grid.dtype).reshape(1, 1))
        if idct is not None:
            scal.append(idct)
        if Gm is None:
            outs = call0(*args, *scal)
        else:
            outs = call1(*args, *Gm, *scal)
        G_int = list(outs[:nfo])
        new = {n: outs[nfo + k] for k, n in enumerate(out_names)}
        return G_int, new

    return fused_update


def build_fused_advection_update(grid, scheme, tracer_names,
                                 tracer_batch="auto", with_corr=False,
                                 p_zspectral=False):
    """Advection megakernel with the RK3 stage update FUSED in: G = -∇·(𝐯 q)
    AND new = q + γΔt·G + ζΔt·G⁻ for every prognostic field in Pallas,
    with halo-valid outputs. Many-tracer runs split into a momentum call +
    tracer-batch calls so VMEM tiles stay large (the r1 12-tracer kernel
    fell to (8, 32) tiles = 2.6× halo overcompute; batches keep (32, 64)
    at the cost of re-streaming the advecting velocities per batch).

    Returns fn(u, v, w, tracers, Gm, gamma_dt, zeta_dt) ->
    (G_int list [interior-shaped, pass back as next stage's Gm],
    new dict {u, v, w, *tracers} padded, halos valid for periodic x/y).
    ``Gm=None`` selects the first-stage variant (ζ = 0)."""
    names = tuple(tracer_names)
    ntr = len(names)
    Hx, Hy = grid.H[0], grid.H[1]
    ZP = grid.padded_shape[2]
    ZPAD0 = -(-ZP // 128) * 128
    import os as _os
    _batch_env = _os.environ.get("FUSED_TRACER_BATCH")
    if _batch_env:
        # probe knob: "single" forces one kernel; an integer forces that
        # tracer batch size (tile shrinkage vs velocity re-streaming sweep)
        tracer_batch = ("auto" if _batch_env == "single"
                        else int(_batch_env))
        if _batch_env == "single":
            plain = _build_update_group(grid, scheme, names, True)
            if not with_corr:
                return plain
            corr = _build_update_group(grid, scheme, names, True,
                                       with_corr=True,
                                       p_zspectral=p_zspectral)

            def fused_update(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                             p=None, corr_dt=None):
                if p is None:
                    return plain(u, v, w, tracers, Gm, gamma_dt, zeta_dt)
                return corr(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                            p=p, corr_dt=corr_dt)

            return fused_update
    single = True
    if tracer_batch == "auto" and ntr:
        nf = 3 + ntr
        TX, TY = _pick_tiles_vmem(grid.N[0], grid.N[1], Hx, Hy, ZPAD0, ZP,
                                  2 * nf, 2 * nf)
        # round-5 sweep (scripts/tracer_batch_sweep.py, 256^3 x 12 tracers,
        # v5e): single 93.0 ms vs K=2/3/4/6 91.4/89.4/87.25/89.5 ms — at
        # high tracer counts batches of 4 beat the single kernel by ~6%
        # even when its tiles stay large, so prefer batching past 6
        single = TX is not None and TX * TY >= 32 * 64 and ntr <= 6
    elif isinstance(tracer_batch, int):
        single = ntr <= tracer_batch
    if single:
        plain = _build_update_group(grid, scheme, names, True)
        if not with_corr:
            return plain
        corr = _build_update_group(grid, scheme, names, True,
                                   with_corr=True, p_zspectral=p_zspectral)

        def fused_update(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                         p=None, corr_dt=None):
            if p is None:
                return plain(u, v, w, tracers, Gm, gamma_dt, zeta_dt)
            return corr(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                        p=p, corr_dt=corr_dt)

        return fused_update

    K = tracer_batch if isinstance(tracer_batch, int) else 4  # see sweep above
    batches = [names[b:b + K] for b in range(0, ntr, K)]
    variants = [False, True] if with_corr else [False]
    mom = {wc: _build_update_group(grid, scheme, (), True, with_corr=wc,
                                   p_zspectral=p_zspectral and wc)
           for wc in variants}
    groups = {wc: [_build_update_group(grid, scheme, bn, False,
                                       with_corr=wc,
                                       p_zspectral=p_zspectral and wc)
                   for bn in batches]
              for wc in variants}

    def fused_update(u, v, w, tracers, Gm, gamma_dt, zeta_dt,
                     p=None, corr_dt=None):
        wc = p is not None
        kw = dict(p=p, corr_dt=corr_dt) if wc else {}
        if Gm is None:
            parts = [None] * (1 + len(batches))
        else:
            parts = [Gm[:3]]
            o = 3
            for bn in batches:
                parts.append(Gm[o:o + len(bn)])
                o += len(bn)
        G_all, new = mom[wc](u, v, w, {}, parts[0], gamma_dt, zeta_dt, **kw)
        G_all = list(G_all)
        for gfn, bn, pm in zip(groups[wc], batches, parts[1:]):
            gb, nb = gfn(u, v, w, {n: tracers[n] for n in bn}, pm,
                         gamma_dt, zeta_dt, **kw)
            G_all += gb
            new.update(nb)
        return G_all, new

    return fused_update


def build_sharded_fused_advection(grid, scheme, tracer_names, mesh):
    """The advection megakernel under an (x, y) device mesh: the GLOBAL-VIEW
    padded fields are re-blocked into per-shard locally-padded slabs inside a
    ``shard_map``; ppermute strips fill the local halos
    (parallel/halo_exchange.py) and the per-shard Pallas kernel runs on its
    local block — the multi-chip continuation of the fused fast path (the
    pure-GSPMD alternative would fall back to the XLA advection because
    Pallas calls are opaque to the partitioner).

    Returns fn(u, v, w, tracers) -> (Gu, Gv, Gw, {name: Gc}) padded
    global-view arrays (halo slots zero)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.halo_exchange import halo_exchange_local

    names = tuple(tracer_names)
    nf = 3 + len(names)
    Nx, Ny, Nz = grid.N
    Hx, Hy, Hz = grid.H
    axn = mesh.axis_names
    Sx, Sy = mesh.devices.shape
    if Nx % Sx or Ny % Sy:
        raise ValueError("interior must divide the mesh")
    nlx, nly = Nx // Sx, Ny // Sy
    ZP = grid.padded_shape[2]

    from ..grids.rectilinear import RectilinearGrid
    ext = grid.extent
    lgrid = RectilinearGrid(
        size=(nlx, nly, Nz),
        extent=(ext[0] * nlx / Nx, ext[1] * nly / Ny, ext[2]),
        topology=grid.topology, halo=(Hx, Hy, Hz), dtype=grid.dtype)
    fused_local = build_fused_advection(lgrid, scheme, names)

    spec = P(axn[0], axn[1], None)
    gsx = slice(Hx, Hx + Nx)
    gsy = slice(Hy, Hy + Ny)
    lsx = slice(Hx, Hx + nlx)
    lsy = slice(Hy, Hy + nly)

    def body(*locs):
        padded = [jnp.pad(a, [(Hx, Hx), (Hy, Hy), (0, 0)]) for a in locs]
        padded = [halo_exchange_local(a, (Hx, Hy, 0), (nlx, nly, ZP),
                                      axis_names=axn) for a in padded]
        Gu, Gv, Gw, Gc = fused_local(
            padded[0], padded[1], padded[2],
            {n: padded[3 + t] for t, n in enumerate(names)})
        outs = [Gu[lsx, lsy, :], Gv[lsx, lsy, :], Gw[lsx, lsy, :]]
        outs += [Gc[n][lsx, lsy, :] for n in names]
        return tuple(outs)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; the outputs are trivially per-shard local
    smapped = shard_map(body, mesh=mesh, in_specs=(spec,) * nf,
                        out_specs=(spec,) * nf, check_vma=False)

    def sharded(u, v, w, tracers):
        ins = [a[gsx, gsy, :] for a in
               [u, v, w] + [tracers[n] for n in names]]
        outs = smapped(*ins)
        shape = grid.padded_shape

        def embed(o):
            return jnp.zeros(shape, o.dtype).at[gsx, gsy, :].set(o)

        Gu, Gv, Gw = embed(outs[0]), embed(outs[1]), embed(outs[2])
        Gc = {n: embed(outs[3 + t]) for t, n in enumerate(names)}
        return Gu, Gv, Gw, Gc

    return sharded
