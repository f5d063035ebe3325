"""In-place Pallas halo fill: the single-chip "halo exchange kernel".

The XLA concat-based fill (boundary_conditions/fill_halos.py) rebuilds the
whole padded array once per axis — ~3 full HBM round-trips per field. But a
halo fill only MOVES tiny strips; the interior is untouched. This kernel
expresses exactly that: the output buffer is aliased to the input
(`input_output_aliases`), periodic x/y halos are HBM→HBM DMA strip copies,
and the bounded-z boundary fill touches only the two 128-lane windows
containing the z halos (via VMEM). Measured at 256³: ~0.1 ms/field vs ~2.3 ms
for the concat path.

Alignment requirements (Mosaic DMA slices must be tile-aligned in the minor
two dims): padded y extent and y-strip sizes multiples of 8, padded z extent
a multiple of 128 — provided by the model's Hy rounding and the grid's
lane-tail padding (grids/base.py). Reference semantics mirrored exactly:
fill_halo_regions_periodic.jl (wrap), fill_halo_regions_value_gradient.jl
(linear extrapolation), fill_halo_regions_open.jl (pinned boundary face),
default no-flux mirror (fill_halo_regions_flux.jl); x→y→z ordering propagates
corners like the reference's paired side kernels (fill_halo_regions.jl:25-41).

Supported subset (falls back to the XLA path otherwise): periodic (or flat)
x and y, bounded (or flat) z with static scalar/None conditions on
Value/Gradient/Open/Flux classifications, regular z spacing for
Value/Gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..boundary_conditions.boundary_condition import (FLUX, GRADIENT, OPEN,
                                                      VALUE)
from ..grids.topology import BOUNDED, CENTER, FACE, FLAT, PERIODIC


def _scalar_cond(bc):
    """(classification, scalar value) if statically supported, else None."""
    if bc is None:
        return (FLUX, 0.0)
    if getattr(bc, "scheme", None) is not None:
        return None  # PerturbationAdvection needs dt; XLA path handles it
    cond = bc.condition
    if cond is None:
        return (bc.classification, 0.0)
    if np.isscalar(cond) and not callable(cond):
        return (bc.classification, float(cond))
    return None


def supported_zb(grid, loc, bcs):
    """The bounded-z (classification, value) pair if this (grid, loc, bcs)
    combination is kernel-supported; "compact" when the grid is z-halo-free
    (boundary handling lives in the stencils); None if unsupported."""
    tx, ty, tz = grid.topology
    if grid.padded_shape[2] % 128 or grid.padded_shape[1] % 8:
        return None
    if tz == BOUNDED and grid.H[2] == 0:
        if tx not in (PERIODIC, FLAT) or ty not in (PERIODIC, FLAT):
            return None
        if ty == PERIODIC and grid.H[1] % 8:
            return None
        return "compact"
    if tz != BOUNDED or grid.lane_tail == 0:
        return None
    if tx not in (PERIODIC, FLAT) or ty not in (PERIODIC, FLAT):
        return None
    if ty == PERIODIC and grid.H[1] % 8:
        return None
    if not grid.regular(2):
        return None
    zb = _scalar_cond(bcs.bottom), _scalar_cond(bcs.top)
    if zb[0] is None or zb[1] is None:
        return None
    for cls, _ in zb:
        if cls not in (FLUX, OPEN, VALUE, GRADIENT):
            return None
    return zb


@functools.lru_cache(maxsize=256)
def _build(grid, loc, zb, interpret):
    """Build fn(a) -> filled a (in-place via aliasing)."""
    NPX, NPY, ZP = grid.padded_shape
    Hx, Hy, Hz = grid.H
    Nx, Ny, Nz = grid.N
    x_periodic = grid.topology[0] == PERIODIC
    y_periodic = grid.topology[1] == PERIODIC
    compact = zb == "compact"
    dz = (1.0 if compact
          else float(np.asarray(grid.dz((CENTER,) * 3)).reshape(())))

    # ---- kernel 1: periodic wraps (pure strip DMAs, in place) -------------
    def wrap_kernel(in_ref, out_ref, sem):
        if x_periodic:
            d1 = pltpu.make_async_copy(in_ref.at[pl.ds(Nx, Hx)],
                                       out_ref.at[pl.ds(0, Hx)], sem.at[0])
            d2 = pltpu.make_async_copy(in_ref.at[pl.ds(Hx, Hx)],
                                       out_ref.at[pl.ds(Hx + Nx, Hx)],
                                       sem.at[1])
            d1.start(); d2.start(); d1.wait(); d2.wait()
        if y_periodic:
            # reads out_ref AFTER the x wrap so corners carry wrapped columns
            d3 = pltpu.make_async_copy(out_ref.at[:, pl.ds(Ny, Hy)],
                                       out_ref.at[:, pl.ds(0, Hy)], sem.at[2])
            d3.start(); d3.wait()
            d4 = pltpu.make_async_copy(out_ref.at[:, pl.ds(Hy, Hy)],
                                       out_ref.at[:, pl.ds(Hy + Ny, Hy)],
                                       sem.at[3])
            d4.start(); d4.wait()

    wrap_call = pl.pallas_call(
        wrap_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NPX, NPY, ZP), grid.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
        input_output_aliases={0: 0},
        interpret=interpret,
    )

    if compact:
        # z-halo-free: the wrap strips are the whole fill
        wrap_call.zfix = lambda a: a
        wrap_call.wrap = wrap_call
        return wrap_call

    # ---- kernel 2: bounded-z boundary fill in the two 128-lane windows ----
    (cls_b, v_b), (cls_t, v_t) = zb
    zface = loc[2] == FACE
    L0 = ZP - 128                      # right window start (may equal 0)
    windows = [0] if L0 == 0 else [0, L0]

    def fix_window(w, w0):
        """Apply the z boundary fill to VMEM window w spanning lanes
        [w0, w0+128). Mirrors _fill_axis (fill_halos.py) exactly."""
        def land(k):                   # local lane index or None
            lk = k - w0
            return lk if 0 <= lk < 128 else None

        def get(k):
            return w[:, :, k - w0:k - w0 + 1]

        def setk(w, k, val):
            lk = land(k)
            if lk is None:
                return w
            # Mosaic lowers neither scatter nor DUS: write the lane with an
            # iota-masked select (pure VPU dataflow, ≤ 2·Hz lanes touched)
            lanes = jax.lax.broadcasted_iota(jnp.int32, w.shape, 2)
            return jnp.where(lanes == lk, jnp.asarray(val, w.dtype), w)

        if not zface:
            # bottom (left)
            if land(Hz - 1) is not None:
                if cls_b in (FLUX, OPEN):
                    for m in range(Hz):
                        w = setk(w, Hz - 1 - m, get(Hz + m))
                else:
                    c1 = get(Hz)
                    grad = (c1 - v_b) / (dz / 2) if cls_b == VALUE else \
                        v_b * jnp.ones_like(c1)
                    for m in range(Hz):
                        w = setk(w, m, c1 - grad * ((Hz - m) * dz))
            # top (right)
            if land(Hz + Nz) is not None:
                if cls_t in (FLUX, OPEN):
                    for m in range(Hz):
                        w = setk(w, Hz + Nz + m, get(Hz + Nz - 1 - m))
                else:
                    cN = get(Hz + Nz - 1)
                    grad = (v_t - cN) / (dz / 2) if cls_t == VALUE else \
                        v_t * jnp.ones_like(cN)
                    for m in range(Hz):
                        w = setk(w, Hz + Nz + m, cN + grad * ((m + 1) * dz))
        else:
            # z-Face field: slot Hz is the bottom boundary face, slot Hz+Nz
            # the top boundary face
            if land(Hz) is not None:
                if cls_b in (OPEN, VALUE):
                    for m in range(Hz):
                        w = setk(w, Hz - 1 - m, 2 * v_b - get(Hz + 1 + m))
                    w = setk(w, Hz, v_b * jnp.ones_like(get(Hz)))
                else:
                    for m in range(Hz):
                        w = setk(w, Hz - 1 - m, get(Hz + 1 + m))
            if land(Hz + Nz) is not None:
                if cls_t in (OPEN, VALUE):
                    w = setk(w, Hz + Nz, v_t * jnp.ones_like(get(Hz + Nz)))
                    for m in range(Hz - 1):
                        w = setk(w, Hz + Nz + 1 + m,
                                 2 * v_t - get(Hz + Nz - 1 - m))
                else:
                    for m in range(Hz - 1):
                        w = setk(w, Hz + Nz + 1 + m, get(Hz + Nz - 1 - m))
        return w

    nw = len(windows)
    CX = NPX
    # fix_window's per-slot selects keep several window-sized values live in
    # Mosaic's scoped VMEM — cap the scratch small enough that ~4x copies
    # still fit (48 MB caused a 171 MB scoped-vmem compile OOM at 128^3)
    while nw * CX * NPY * 128 * np.dtype(grid.dtype).itemsize > 12 * 2 ** 20:
        CX = -(-CX // 2)
    n_chunks = -(-NPX // CX)

    def zfix_kernel(in_ref, out_ref, *rest):
        del in_ref  # aliased with out_ref
        scratches, sem = rest[:nw], rest[nw]
        i = pl.program_id(0)
        x0 = jnp.minimum(i * CX, NPX - CX)
        dmas = []
        for s, (w0, scr) in enumerate(zip(windows, scratches)):
            d = pltpu.make_async_copy(
                out_ref.at[pl.ds(x0, CX), :, pl.ds(w0, 128)], scr, sem.at[s])
            d.start()
            dmas.append(d)
        for s, (w0, scr) in enumerate(zip(windows, scratches)):
            dmas[s].wait()
            scr[:] = fix_window(scr[:], w0)
            d = pltpu.make_async_copy(
                scr, out_ref.at[pl.ds(x0, CX), :, pl.ds(w0, 128)], sem.at[s])
            d.start()
            dmas[s] = d
        for d in dmas:
            d.wait()

    zfix_call = pl.pallas_call(
        zfix_kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NPX, NPY, ZP), grid.dtype),
        scratch_shapes=[pltpu.VMEM((CX, NPY, 128), grid.dtype)] * nw
                       + [pltpu.SemaphoreType.DMA((nw,))],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fill(a):
        return zfix_call(wrap_call(a))

    fill.zfix = zfix_call
    fill.wrap = wrap_call
    return fill


def get_pallas_fill(grid, loc, bcs, interpret=False):
    """Return fn(a)->filled or None if unsupported. Cached per
    (grid, loc, bcs) specialization."""
    zb = supported_zb(grid, loc, bcs)
    if zb is None:
        return None
    return _build(grid, tuple(loc), zb, interpret)


@functools.lru_cache(maxsize=64)
def _build_batched(grid, locs, zbs, interpret):
    """One pallas_call pair filling MANY fields (same grid, per-field
    loc/z-BCs): batches the strip DMAs and z-window fixes to amortize kernel
    launches (4 fields × 2 kernels → 2 kernels per fill phase)."""
    NPX, NPY, ZP = grid.padded_shape
    Hx, Hy, Hz = grid.H
    Nx, Ny, Nz = grid.N
    x_periodic = grid.topology[0] == PERIODIC
    y_periodic = grid.topology[1] == PERIODIC
    nf = len(locs)

    def wrap_kernel(*refs):
        ins = refs[:nf]
        outs = refs[nf:2 * nf]
        sem = refs[2 * nf]
        if x_periodic:
            dmas = []
            for i in range(nf):
                d1 = pltpu.make_async_copy(ins[i].at[pl.ds(Nx, Hx)],
                                           outs[i].at[pl.ds(0, Hx)],
                                           sem.at[2 * i])
                d2 = pltpu.make_async_copy(ins[i].at[pl.ds(Hx, Hx)],
                                           outs[i].at[pl.ds(Hx + Nx, Hx)],
                                           sem.at[2 * i + 1])
                d1.start(); d2.start()
                dmas += [d1, d2]
            for d in dmas:
                d.wait()
        if y_periodic:
            dmas = []
            for i in range(nf):
                d3 = pltpu.make_async_copy(outs[i].at[:, pl.ds(Ny, Hy)],
                                           outs[i].at[:, pl.ds(0, Hy)],
                                           sem.at[2 * i])
                d3.start()
                dmas.append(d3)
            for d in dmas:
                d.wait()
            dmas = []
            for i in range(nf):
                d4 = pltpu.make_async_copy(outs[i].at[:, pl.ds(Hy, Hy)],
                                           outs[i].at[:, pl.ds(Hy + Ny, Hy)],
                                           sem.at[2 * i])
                d4.start()
                dmas.append(d4)
            for d in dmas:
                d.wait()

    wrap_call = pl.pallas_call(
        wrap_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nf,
        out_shape=[jax.ShapeDtypeStruct((NPX, NPY, ZP), grid.dtype)] * nf,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2 * nf,))],
        input_output_aliases={i: i for i in range(nf)},
        interpret=interpret,
    )

    # per-field single builds provide the window-fix logic; reuse their
    # fix_window via the single-field zfix (launches stay per-field for the
    # z windows, but those are small VMEM passes)
    singles = [_build(grid, locs[i], zbs[i], interpret) for i in range(nf)]

    def fill(*arrays):
        wrapped = wrap_call(*arrays)
        return tuple(singles[i].zfix(a) for i, a in enumerate(wrapped))

    return fill


def get_batched_fill(grid, locs_bcss, interpret=False):
    """fn(*arrays) for fields sharing the grid, or None if ANY field is
    unsupported. ``locs_bcss``: tuple of (loc, bcs)."""
    zbs = []
    for loc, bcs in locs_bcss:
        zb = supported_zb(grid, loc, bcs)
        if zb is None:
            return None
        zbs.append(zb)
    locs = tuple(tuple(loc) for loc, _ in locs_bcss)
    return _build_batched(grid, locs, tuple(zbs), interpret)
