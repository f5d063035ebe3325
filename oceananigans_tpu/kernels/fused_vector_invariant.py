"""Pallas fused hydrostatic tendency megakernel (vector-invariant momentum).

The hydrostatic step's hot stencil (reference:
src/Models/HydrostaticFreeSurfaceModels/hydrostatic_free_surface_tendency_
kernel_functions.jl:27-140 — vector-invariant momentum advection + Coriolis +
∂x pHY′ + tracer advection) evaluated as ONE Pallas kernel per step:

* tiles run over x ONLY; each program instance DMAs an
  (TX + 2Hx, NYP, ZPAD) slab — full y and z extents — into VMEM. Full-y
  slabs keep every latitude-dependent metric a per-call constant array
  (lat-lon metrics are 1D in y, reference
  src/Operators/spacings_and_areas_and_volumes.jl) and make the bounded-y
  near-boundary order cascade exact (slab y-index == global y-index); the
  tiled x axis keeps its cascade exact through ``index_offset`` (local
  index + program_id·TX = global index, schemes._cascade_select).
* Mosaic forbids captured array constants inside kernels, so metric arrays
  are discovered by a build-time RECORD pass (an abstract jax.eval_shape
  trace of the same physics), packed into three grouped inputs by which
  dims they vary along — y:(My,NYP,1), z:(Mz,1,ZPAD), yz:(Myz,NYP,ZPAD) —
  and SERVED back as slices of those inputs during the kernel trace.
  The hook surface is the metric methods of ``_MetricTileGrid`` plus
  ``bake_1d`` (stretched-axis ENO coefficients, advection/schemes.py) and
  ``bake_metric`` (Coriolis f arrays, coriolis.py).
* the physics evaluates with the SAME operator code as the XLA path
  (advection/vector_invariant.py with ``tile=``-trimmed terms, fluxes.div_Uc)
  on the proxy grid; terms accumulate INTO the output refs phase-by-phase
  (vorticity → KE gradient → vertical → Coriolis → pressure gradient),
  bounding the live intermediate set per phase.

Eligibility: metrics must not vary along x (LatitudeLongitudeGrid, regular
RectilinearGrid), regular x coordinate, static z (no z-star), halo'd z
(the z-compact layout is the nonhydrostatic kernel's), no immersed grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..advection.fluxes import div_Uc
from ..grids.topology import LOC_CFC, LOC_FCC


class _MetricTileGrid:
    """Metric/topology proxy for x-tiled full-y/z slab evaluation.

    Forwards metrics from the parent grid (numpy constants, y- and/or
    z-broadcastable — never x-varying for eligible grids), extending the
    z extent of z-varying metrics and coordinates to the lane-padded ZPAD
    with edge values (tail slots are never consumed; edge values keep
    divisions finite). Carries the traced ``index_offset`` consumed by the
    boundary-order cascade.

    Two modes: ``record`` (build-time abstract trace — every non-scalar
    metric array is keyed by content and collected) and ``serve`` (kernel
    trace — the same keys return slices of the packed metric inputs)."""

    def __init__(self, parent, zpad):
        self.parent = parent
        self.N = tuple(parent.N)
        self.H = tuple(parent.H)
        self.topology = tuple(parent.topology)
        self.dtype = parent.dtype
        self.ZP = parent.padded_shape[2]
        self.ZPAD = zpad
        self.NYP = parent.padded_shape[1]
        self.index_offset = (None, None, None)
        # see fused_advection._TileGrid: approximate-reciprocal WENO weight
        # divisions on TPU kernel bodies only
        self.fast_reciprocal = jax.default_backend() == "tpu"
        self._mode = "record"
        self._recorded = {}   # key -> numpy array (insertion-ordered)
        self._served = None   # key -> jnp array (set per kernel trace)

    @property
    def padded_shape(self):
        s = self.parent.padded_shape
        return (s[0], s[1], self.ZPAD)

    def is_flat(self, axis):
        return self.parent.is_flat(axis)

    def regular(self, axis):
        return self.parent.regular(axis)

    def coord_padded(self, axis, loc):
        c = np.asarray(self.parent.coord_padded(axis, loc), np.float64)
        if axis == 2 and 1 < c.size < self.ZPAD:
            d = c[-1] - c[-2]
            ext = c[-1] + d * np.arange(1, self.ZPAD - c.size + 1)
            c = np.concatenate([c, ext])
        return c

    # -- constant registration -------------------------------------------------

    def _group_of(self, arr):
        if arr.shape == (1, self.NYP, 1):
            return "y"
        if arr.shape == (1, 1, self.ZPAD):
            return "z"
        if arr.shape == (1, self.NYP, self.ZPAD):
            return "yz"
        raise ValueError(f"metric shape {arr.shape} is not x-invariant "
                         f"broadcastable (NYP={self.NYP}, ZPAD={self.ZPAD})")

    def _constant(self, m):
        m = self._pad_z(m)
        if np.isscalar(m) or np.ndim(m) == 0:
            return m
        arr = np.ascontiguousarray(np.asarray(m, np.float64))
        if arr.shape == (1, 1, 1):
            return float(arr.reshape(()))
        group = self._group_of(arr)
        key = (group, arr.tobytes())
        if self._mode == "record":
            self._recorded.setdefault(key, arr)
            # y-windowed slabs (x,y tiling): return a window-shaped view so
            # the abstract record trace broadcasts; values are irrelevant
            tys = getattr(self, "_tys", None)
            if tys is not None and group in ("y", "yz") \
                    and arr.shape[1] != tys:
                return arr[:, :tys, :]
            return arr
        if key not in self._served:
            raise KeyError("metric used in the kernel trace was not seen "
                           "in the record pass — record/serve divergence")
        return self._served[key]

    # hook for coriolis.py f arrays
    def bake_metric(self, m):
        return self._constant(m)

    # hook for stretched-axis ENO coefficients (advection/schemes.py)
    def bake_1d(self, c, axis):
        from ..grids.base import broadcastable_1d
        return self._constant(broadcastable_1d(c, axis))

    def _pad_z(self, m):
        if np.isscalar(m) or np.ndim(m) == 0:
            return m
        m = np.asarray(m)
        if m.ndim == 3 and m.shape[2] == self.ZP and self.ZPAD != self.ZP \
                and self.ZP > 1:
            m = np.pad(m, [(0, 0), (0, 0), (0, self.ZPAD - self.ZP)],
                       mode="edge")
        return m

    def dx(self, loc):
        return self._constant(self.parent.dx(loc))

    def dy(self, loc):
        return self._constant(self.parent.dy(loc))

    def dz(self, loc):
        return self._constant(self.parent.dz(loc))

    def Ax(self, loc):
        return self._constant(self.parent.Ax(loc))

    def Ay(self, loc):
        return self._constant(self.parent.Ay(loc))

    def Az(self, loc):
        return self._constant(self.parent.Az(loc))

    def V(self, loc):
        return self._constant(self.parent.V(loc))

    def _fingerprint(self):
        return ("MetricTileGrid", self.parent._fingerprint(), self.ZPAD)

    def __hash__(self):
        return hash(self._fingerprint())

    def __eq__(self, other):
        return (isinstance(other, _MetricTileGrid)
                and self._fingerprint() == other._fingerprint())


def _metrics_x_invariant(grid):
    """True when no metric varies along x (the slab sees y/z-broadcastable
    constants only)."""
    locs = [("c", "c", "c"), ("f", "c", "c"), ("c", "f", "c"),
            ("c", "c", "f"), ("f", "f", "c")]
    for loc in locs:
        for m in (grid.dx(loc), grid.dy(loc), grid.dz(loc), grid.Az(loc)):
            if not np.isscalar(m) and np.ndim(m) == 3 and m.shape[0] != 1:
                return False
    return True


def _pick_tiles(Nx, Ny, Hx, Hy, ZPAD, nf, nout, spill_factor,
                budget=100 * 1024 * 1024):
    """Best (TX, TY) whose VMEM working set (input slabs scaled by the
    phase's empirical Mosaic register-spill factor + double-buffered out
    blocks) fits; among feasible tiles minimize halo overcompute.

    spill calibration on v5e (512x256x32 WENO-VI): the vorticity phase
    spilled 186M of registers on 12.2M of slabs ≈ 15×."""
    best = None
    for TX in (64, 32, 16, 8, 4, 2):
        if Nx % TX:
            continue
        # small TY values only arise on small (test) grids; TPU runs pick
        # sublane-aligned tiles
        for TY in (128, 64, 32, 16, 8, 4, 2):
            if Ny % TY:
                continue
            TXS, TYS = TX + 2 * Hx, TY + 2 * Hy
            slabs = nf * TXS * TYS * ZPAD * 4
            outs = 2 * nout * TX * TY * ZPAD * 4
            if slabs * spill_factor + outs > budget:
                continue
            waste = (TXS * TYS) / (TX * TY)
            key = (waste, -TX * TY)
            if best is None or key < best[0]:
                best = (key, TX, TY)
    if best is None:
        return None, None
    return best[1], best[2]


def eligible_hydrostatic(grid, vi, tracer_scheme, tracer_names):
    from ..advection.vector_invariant import VectorInvariant
    from ..immersed import ImmersedBoundaryGrid

    if not isinstance(vi, VectorInvariant):
        return False
    if isinstance(grid, ImmersedBoundaryGrid):
        return False
    if grid.is_flat(0) or grid.is_flat(1) or grid.is_flat(2):
        return False
    if grid.H[2] == 0:
        return False  # z-compact layout not wired for this kernel
    if not grid.regular(0):
        return False  # x-window'd nonuniform coefficients unsupported
    if grid.H[1] % 8:
        return False  # Mosaic sublane alignment for the y tile windows
    if getattr(grid, "polar_south", False) or getattr(grid, "polar_north",
                                                      False):
        return False  # polar halo rows carry recomputed zonal means
    if not _metrics_x_invariant(grid):
        return False
    ZP = grid.padded_shape[2]
    ZPAD = -(-ZP // 128) * 128
    ntr = len(tuple(tracer_names))
    nf = 4 + ntr  # u, v, w, ph, tracers (worst phase)
    tx, ty = _pick_tiles(grid.N[0], grid.N[1], grid.H[0], grid.H[1], ZPAD,
                         nf, 2 + ntr, spill_factor=8)
    return tx is not None


# maximum tile sizes the input padding must accommodate (extra boundary-face
# tiles on bounded axes read zero-pad rows past the padded extent)
_TX_MAX = 64
_TY_MAX = 128


def _build_phase_call(grid, tgrid, n_in, nout, body, spill_factor):
    """One (x, y)-tiled phase kernel: DMA ``n_in`` halo-extended slabs,
    serve the metric constants discovered by a per-phase record pass as
    y-windowed slices of packed VMEM inputs, evaluate ``body(slabs, tiles,
    write)`` accumulating (TX, TY, ZPAD) terms into the outputs.

    Splitting the hydrostatic tendency into per-phase kernels keeps each
    Mosaic program at the scale of the nonhydrostatic megakernel (~3k HLO
    ops; the monolith was 2.7× that and Mosaic compile time grows
    superlinearly) and bounds register spills per phase, buying usable
    tiles. The phase outputs are summed by XLA during the (cheap) embed."""
    Hx, Hy = grid.H[0], grid.H[1]
    Nx, Ny = grid.N[0], grid.N[1]
    NXP, NYP, ZP = grid.padded_shape
    ZPAD = tgrid.ZPAD
    TX, TY = _pick_tiles(Nx, Ny, Hx, Hy, ZPAD, n_in, nout, spill_factor)
    if TX is None:
        raise ValueError("grid not tileable for the fused VI kernel")
    TXS, TYS = TX + 2 * Hx, TY + 2 * Hy
    slab_shape = (TXS, TYS, ZPAD)
    bounded_x = grid.topology[0] == "bounded"
    bounded_y = grid.topology[1] == "bounded"
    ntx = Nx // TX + (1 if bounded_x else 0)
    nty = Ny // TY + (1 if bounded_y else 0)
    tile = (slice(Hx, Hx + TX), slice(Hy, Hy + TY))

    # record pass: discover the metric constants this phase touches
    tgrid._mode = "record"
    tgrid._recorded = {}
    tgrid._tys = TYS
    tgrid.index_offset = (0, 0, None)
    spec = jax.ShapeDtypeStruct(slab_shape, grid.dtype)

    def record_fn(*slabs):
        acc = {}

        def write(k, term):
            acc[k] = term if k not in acc else acc[k] + term

        body(slabs, tile, write)
        return tuple(acc[k] for k in sorted(acc))

    jax.eval_shape(record_fn, *([spec] * n_in))

    packs = {}
    key_index = {}
    by_group = {"y": [], "z": [], "yz": []}
    for (group, _), arr in tgrid._recorded.items():
        by_group[group].append(arr)
        key_index[(group, arr.tobytes())] = (group, len(by_group[group]) - 1)
    shapes = {"y": (NYP, 1), "z": (1, ZPAD), "yz": (NYP, ZPAD)}
    # y extents edge-padded so the bounded-y extra tile's windows stay in
    # bounds (those rows never survive the embed)
    ypad = _TY_MAX

    def prep(g, a):
        a = a.reshape(shapes[g])
        if g in ("y", "yz"):
            a = np.pad(a, [(0, ypad), (0, 0)], mode="edge")
        return a

    for g, arrs in by_group.items():
        if arrs:
            packs[g] = np.stack([prep(g, a) for a in arrs]) \
                .astype(grid.dtype)
    pack_order = [g for g in ("y", "z", "yz") if g in packs]
    n_packs = len(pack_order)

    def kernel(*refs):
        ins = refs[:n_in]
        pack_refs = {g: refs[n_in + i] for i, g in enumerate(pack_order)}
        outs = refs[n_in + n_packs:n_in + n_packs + nout]
        slabs = refs[n_in + n_packs + nout:n_in + n_packs + nout + n_in]
        sems = refs[n_in + n_packs + nout + n_in]
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = i * TX
        y0 = j * TY
        copies = []
        for k in range(n_in):
            dma = pltpu.make_async_copy(
                ins[k].at[pl.ds(x0, TXS), pl.ds(y0, TYS), :], slabs[k],
                sems.at[k])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        vals = [s[:] for s in slabs]

        served = {}
        for key, (g, row) in key_index.items():
            if g == "y":
                served[key] = pack_refs[g][row, pl.ds(y0, TYS), :][None]
            elif g == "yz":
                served[key] = pack_refs[g][row, pl.ds(y0, TYS), :][None]
            else:
                served[key] = pack_refs[g][row][None]
        tgrid._mode = "serve"
        tgrid._served = served
        # global-index offsets for the x/y cascades (slab index + offset =
        # global padded index)
        tgrid.index_offset = (x0, y0, None)

        written = set()

        def write(k, term):
            if k in written:
                outs[k][:] = outs[k][:] + term
            else:
                outs[k][:] = term
                written.add(k)

        body(vals, tile, write)

    pack_specs = []
    for g in pack_order:
        pack_specs.append(pl.BlockSpec(
            packs[g].shape, (lambda i, j: (0, 0, 0)),
            memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in + pack_specs,
        out_specs=[pl.BlockSpec((TX, TY, ZPAD), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * nout,
        out_shape=[jax.ShapeDtypeStruct((ntx * TX, nty * TY, ZPAD),
                                        grid.dtype)] * nout,
        scratch_shapes=([pltpu.VMEM(slab_shape, grid.dtype)] * n_in
                        + [pltpu.SemaphoreType.DMA((n_in,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )
    pack_args = [jnp.asarray(packs[g]) for g in pack_order]
    return lambda *args: call(*(list(args) + pack_args))


def build_fused_hydrostatic_tendency(grid, vi, tracer_scheme, tracer_names,
                                     coriolis=None, with_ph=True):
    """Return fn(u, v, w, tracers_dict, ph) -> (Gu, Gv, {name: Gc}) of
    padded-shape arrays whose interior holds the advective + Coriolis +
    baroclinic-pressure tendency contributions; halo slots are garbage
    (refilled before use).

    Four per-phase Pallas kernels (vorticity / Bernoulli / vertical /
    forces+tracers) whose (TX, TY, ZPAD) outputs are summed by XLA in the
    embed pass; see _build_phase_call for why they are split."""
    Hx, Hy, Hz = grid.H
    Nx, Ny, Nz = grid.N
    NXP, NYP, ZP = grid.padded_shape
    ZPAD = -(-ZP // 128) * 128
    names = tuple(tracer_names)
    ntr = len(names)
    tgrid = _MetricTileGrid(grid, ZPAD)
    # bounded axes: the velocity component normal to the boundary has an
    # extra boundary face (i=N / j=N) living in the first halo slot
    # (grids/base.py) with a freely-evolving tendency on the XLA path —
    # one extra tile per bounded axis covers it (its slab reads zero-pad
    # rows past the padded extent; only the face row survives the embed)
    bounded_x = grid.topology[0] == "bounded"
    bounded_y = grid.topology[1] == "bounded"
    nx_keep = Nx + (1 if bounded_x else 0)
    ny_keep = Ny + (1 if bounded_y else 0)
    from ..operators.operators import ddx, ddy

    def trims(tile):
        TX = tile[0].stop - tile[0].start
        TY = tile[1].stop - tile[1].start

        def otx(a):
            # terms come back x-trimmed unless VI trims are disabled
            # (multi_dimensional_stencil); normalize to the output tile
            a = a if a.shape[0] == TX else a[tile[0]]
            return a if a.shape[1] == TY else a[:, tile[1]]

        return otx

    def body_vorticity(slabs, tile, write):
        u, v = slabs
        otx = trims(tile)
        h_u, h_v = vi._horizontal(tgrid, u, v, tile[0])
        write(0, -otx(h_u))
        write(1, -otx(h_v))

    def body_bernoulli(slabs, tile, write):
        u, v = slabs
        otx = trims(tile)
        b_u, b_v = vi._bernoulli(tgrid, u, v, tile[0])
        write(0, -otx(b_u))
        write(1, -otx(b_v))

    def body_vertical(slabs, tile, write):
        u, v, w = slabs
        otx = trims(tile)
        z_u, z_v = vi._vertical(tgrid, u, v, w, None, tile[0])
        write(0, -otx(z_u))
        write(1, -otx(z_v))

    def body_forces(slabs, tile, write):
        k0 = 3 + (1 if with_ph else 0)
        u, v, w = slabs[0], slabs[1], slabs[2]
        ph = slabs[3] if with_ph else None
        tracers = slabs[k0:k0 + ntr]
        otx = trims(tile)
        wrote = False
        if coriolis is not None:
            write(0, -otx(coriolis.x_f_cross_U(tgrid, u, v, w)))
            write(1, -otx(coriolis.y_f_cross_U(tgrid, u, v, w)))
            wrote = True
        if with_ph:
            write(0, -otx(ddx(tgrid, ph, LOC_FCC)))
            write(1, -otx(ddy(tgrid, ph, LOC_CFC)))
            wrote = True
        if not wrote:
            TX = tile[0].stop - tile[0].start
            TY = tile[1].stop - tile[1].start
            z = jnp.zeros((TX, TY) + u.shape[2:], u.dtype)
            write(0, z)
            write(1, z)
        for t, c in enumerate(tracers):
            write(2 + t, -div_Uc(tgrid, tracer_scheme, u, v, w, c,
                                 tile=tile))

    # per-phase Mosaic register-spill factors (see _pick_tiles calibration)
    call_h = _build_phase_call(grid, tgrid, 2, 2, body_vorticity, 16)
    call_b = _build_phase_call(grid, tgrid, 2, 2, body_bernoulli, 16)
    call_z = _build_phase_call(grid, tgrid, 3, 2, body_vertical, 16)
    nf_f = 3 + (1 if with_ph else 0) + ntr
    call_f = _build_phase_call(grid, tgrid, nf_f, 2 + ntr, body_forces, 8)

    sx = slice(Hx, Hx + nx_keep)
    sy = slice(Hy, Hy + ny_keep)
    pads = [(0, (_TX_MAX if bounded_x else 0)),
            (0, (_TY_MAX if bounded_y else 0)), (0, ZPAD - ZP)]

    def fused(u, v, w, tracers, ph=None):
        args = [jnp.pad(a.astype(grid.dtype), pads) for a in
                [u, v, w] + ([ph] if with_ph else [])
                + [tracers[n] for n in names]]
        up, vp, wp = args[0], args[1], args[2]
        outs_h = call_h(up, vp)
        outs_b = call_b(up, vp)
        outs_z = call_z(up, vp, wp)
        outs_f = call_f(*args)
        shape = grid.padded_shape

        def embed(parts):
            tot = None
            for o in parts:
                t = o[:nx_keep, :ny_keep, :ZP]
                tot = t if tot is None else tot + t
            full = jnp.zeros(shape, tot.dtype)
            return full.at[sx, sy, :].set(tot)

        Gu = embed([outs_h[0], outs_b[0], outs_z[0], outs_f[0]])
        Gv = embed([outs_h[1], outs_b[1], outs_z[1], outs_f[1]])
        Gc = {n: embed([outs_f[2 + t]]) for t, n in enumerate(names)}
        return Gu, Gv, Gc

    return fused


# =============================================================================
# PACKED (y,z)-flattened variant — the shallow-grid fast path
# =============================================================================
#
# At hydrostatic depths (Nz ≪ 128) the (x, y, z)-slab kernels above waste up
# to 4× of the VPU on 128-lane minor-dim padding (ZPAD = 128 at Nz = 32).
# HBM storage is NOT lane-padded (measured: XLA op time scales linearly in
# Nz — PARITY.md), so the fix is purely a VIEW change: the kernel sees each
# field as (x, rows, 128) over the row-major FLATTENED (y, z) plane
# (flat = y·ZP + z, z halos included — a zero-copy reshape of the padded
# array). Then a y-shift is a flat shift by ZP, a z-shift a flat shift by 1
# (operators/shifts.py packed_mode), cross-column reads land in halo slots
# only (the same guarantee zero-fill provides), and the lane waste drops to
# the ≤ 127-element flat tail (<1%). Tiles run over x ONLY — full-(y,z)
# slabs; the bounded-y extra face row is inside the slab for free.


class _PackedMetricTileGrid(_MetricTileGrid):
    """Metric proxy for the packed layout: every x-invariant metric is
    materialized to the full (1, NYP, ZP) broadcast, flattened, edge-padded
    to rows·128 and served as a (1, rows, 128) VMEM constant. Also serves
    the global y/z padded-index arrays consumed by the boundary-order
    cascade through the ``axis_iota`` hook (advection/schemes.py)."""

    def __init__(self, parent):
        super().__init__(parent, parent.padded_shape[2])
        self.FLAT = self.NYP * self.ZP
        self.S = -(-self.FLAT // 128)

    @property
    def padded_shape(self):
        return (self.parent.padded_shape[0], self.S, 128)

    @property
    def logical_padded_shape(self):
        # the true (x, y, z) padded extents — consumed by coefficient
        # baking (advection/schemes.py _nonuniform_eno), which must not see
        # the packed slab geometry
        return self.parent.padded_shape

    def _pack_np(self, full):
        flat = np.asarray(full, np.float64).reshape(-1)
        tail = self.S * 128 - flat.size
        if tail:
            flat = np.pad(flat, (0, tail), mode="edge")
        return flat.reshape(1, self.S, 128)

    def _constant(self, m):
        if np.isscalar(m) or np.ndim(m) == 0:
            return m
        arr = np.ascontiguousarray(np.asarray(m, np.float64))
        if arr.shape == (1, 1, 1):
            return float(arr.reshape(()))
        if arr.shape not in ((1, self.NYP, 1), (1, 1, self.ZP),
                             (1, self.NYP, self.ZP)):
            raise ValueError(f"metric shape {arr.shape} is not x-invariant "
                             f"broadcastable (NYP={self.NYP}, ZP={self.ZP})")
        full = np.broadcast_to(arr, (1, self.NYP, self.ZP))
        key = ("p", full.tobytes())
        if self._mode == "record":
            self._recorded.setdefault(key, full)
            return self._pack_np(full)
        if key not in self._served:
            raise KeyError("metric used in the kernel trace was not seen "
                           "in the record pass — record/serve divergence")
        return self._served[key]

    def axis_iota(self, shape, axis):
        """Global padded-index arrays for _cascade_select: x is a true iota
        plus the traced tile offset; y/z are served (1, rows, 128)
        constants (float — exact for index magnitudes)."""
        if axis == 0:
            from jax import lax
            iota = lax.broadcasted_iota(jnp.int32, shape, 0)
            off = self.index_offset[0]
            return iota if off is None else iota + off
        idx = np.arange(self.NYP if axis == 1 else self.ZP,
                        dtype=np.float64)
        full = np.broadcast_to(broadcastable_1d_np(idx, axis),
                               (1, self.NYP, self.ZP))
        return self._constant(full)


def broadcastable_1d_np(arr, axis):
    shape = [1, 1, 1]
    shape[axis] = -1
    return np.asarray(arr).reshape(shape)


def eligible_hydrostatic_packed(grid, vi, tracer_scheme, tracer_names):
    from ..advection.vector_invariant import VectorInvariant
    from ..immersed import ImmersedBoundaryGrid

    if not isinstance(vi, VectorInvariant):
        return False
    if isinstance(grid, ImmersedBoundaryGrid):
        return False
    if grid.is_flat(0) or grid.is_flat(1) or grid.is_flat(2):
        return False
    if grid.H[2] == 0:
        return False
    if not grid.regular(0):
        return False
    if getattr(grid, "polar_south", False) or getattr(grid, "polar_north",
                                                      False):
        return False
    if not _metrics_x_invariant(grid):
        return False
    return _pick_tx_packed(grid, 4 + len(tuple(tracer_names)),
                           spill_factor=8) is not None


def _pick_tx_packed(grid, nf, budget=100 * 1024 * 1024, spill_factor=4,
                    nout=4):
    """Largest TX whose packed slab working set fits the VMEM budget.
    ``nout`` is the phase's double-buffered output count (the forces
    phase emits 2 + ntr blocks — a hardcoded 4 under-budgeted it at high
    tracer counts and risked a Mosaic VMEM overflow instead of a smaller
    tile)."""
    Nx, Hx = grid.N[0], grid.H[0]
    NYP, ZP = grid.padded_shape[1], grid.padded_shape[2]
    S = -(-(NYP * ZP) // 128)
    for TX in (64, 32, 16, 8, 4, 2):
        if Nx % TX:
            continue
        slabs = nf * (TX + 2 * Hx) * S * 128 * 4
        outs = 2 * nout * TX * S * 128 * 4
        if slabs * spill_factor + outs <= budget:
            return TX
    return None


def _build_phase_call_packed(grid, tgrid, n_in, nout, body, spill_factor):
    """One x-tiled packed phase kernel: DMA ``n_in`` x-halo-extended
    (TXS, rows, 128) slabs, serve packed metric constants, evaluate ``body``
    inside operators.shifts.packed_mode, accumulate into (TX, rows, 128)
    output blocks."""
    from ..operators.shifts import packed_mode

    Hx = grid.H[0]
    Nx = grid.N[0]
    S = tgrid.S
    ZP = tgrid.ZP
    TX = _pick_tx_packed(grid, n_in, spill_factor=spill_factor,
                        nout=nout)
    if TX is None:
        raise ValueError("grid not tileable for the packed VI kernel")
    TXS = TX + 2 * Hx
    slab_shape = (TXS, S, 128)
    bounded_x = grid.topology[0] == "bounded"
    ntx = Nx // TX + (1 if bounded_x else 0)
    tile = (slice(Hx, Hx + TX), slice(None))

    tgrid._mode = "record"
    tgrid._recorded = {}
    tgrid._tys = None
    tgrid.index_offset = (0, None, None)
    spec = jax.ShapeDtypeStruct(slab_shape, grid.dtype)

    def record_fn(*slabs):
        acc = {}

        def write(k, term):
            acc[k] = term if k not in acc else acc[k] + term

        with packed_mode(ZP):
            body(slabs, tile, write)
        return tuple(acc[k] for k in sorted(acc))

    jax.eval_shape(record_fn, *([spec] * n_in))

    rows = []
    key_index = {}
    for key, full in tgrid._recorded.items():
        key_index[key] = len(rows)
        rows.append(tgrid._pack_np(full)[0])
    pack = (np.stack(rows).astype(grid.dtype) if rows
            else np.zeros((1, S, 128), grid.dtype))

    def kernel(*refs):
        ins = refs[:n_in]
        pack_ref = refs[n_in]
        outs = refs[n_in + 1:n_in + 1 + nout]
        slabs = refs[n_in + 1 + nout:n_in + 1 + nout + n_in]
        sems = refs[n_in + 1 + nout + n_in]
        i = pl.program_id(0)
        x0 = i * TX
        copies = []
        for k in range(n_in):
            dma = pltpu.make_async_copy(
                ins[k].at[pl.ds(x0, TXS)], slabs[k], sems.at[k])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        vals = [s[:] for s in slabs]

        served = {key: pack_ref[row][None]
                  for key, row in key_index.items()}
        tgrid._mode = "serve"
        tgrid._served = served
        tgrid.index_offset = (x0, None, None)

        written = set()

        def write(k, term):
            if k in written:
                outs[k][:] = outs[k][:] + term
            else:
                outs[k][:] = term
                written.add(k)

        with packed_mode(ZP):
            body(vals, tile, write)

    call = pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
        + [pl.BlockSpec(pack.shape, lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((TX, S, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * nout,
        out_shape=[jax.ShapeDtypeStruct((ntx * TX, S, 128), grid.dtype)]
        * nout,
        scratch_shapes=([pltpu.VMEM(slab_shape, grid.dtype)] * n_in
                        + [pltpu.SemaphoreType.DMA((n_in,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )
    pack_arg = jnp.asarray(pack)
    return lambda *args: call(*(list(args) + [pack_arg]))


def build_fused_hydrostatic_tendency_packed(grid, vi, tracer_scheme,
                                            tracer_names, coriolis=None,
                                            with_ph=True):
    """Packed-layout fused VI hydrostatic tendency: same physics surface as
    :func:`build_fused_hydrostatic_tendency` (reference:
    hydrostatic_free_surface_tendency_kernel_functions.jl:27-140) but on
    (x, rows, 128) flat-(y,z) slabs — no 128-lane z padding."""
    Hx, Hy, Hz = grid.H
    Nx, Ny, Nz = grid.N
    NXP, NYP, ZP = grid.padded_shape
    names = tuple(tracer_names)
    ntr = len(names)
    tgrid = _PackedMetricTileGrid(grid)
    S = tgrid.S
    FLAT = tgrid.FLAT
    bounded_x = grid.topology[0] == "bounded"
    nx_keep = Nx + (1 if bounded_x else 0)
    from ..operators.operators import ddx, ddy

    def trims(tile):
        TX = tile[0].stop - tile[0].start

        def otx(a):
            return a if a.shape[0] == TX else a[tile[0]]

        return otx

    def body_vorticity(slabs, tile, write):
        u, v = slabs
        otx = trims(tile)
        h_u, h_v = vi._horizontal(tgrid, u, v, tile[0])
        write(0, -otx(h_u))
        write(1, -otx(h_v))

    def body_bernoulli(slabs, tile, write):
        u, v = slabs
        otx = trims(tile)
        b_u, b_v = vi._bernoulli(tgrid, u, v, tile[0])
        write(0, -otx(b_u))
        write(1, -otx(b_v))

    def body_vertical(slabs, tile, write):
        u, v, w = slabs
        otx = trims(tile)
        z_u, z_v = vi._vertical(tgrid, u, v, w, None, tile[0])
        write(0, -otx(z_u))
        write(1, -otx(z_v))

    def body_forces(slabs, tile, write):
        k0 = 3 + (1 if with_ph else 0)
        u, v, w = slabs[0], slabs[1], slabs[2]
        ph = slabs[3] if with_ph else None
        tracers = slabs[k0:k0 + ntr]
        otx = trims(tile)
        wrote = False
        if coriolis is not None:
            write(0, -otx(coriolis.x_f_cross_U(tgrid, u, v, w)))
            write(1, -otx(coriolis.y_f_cross_U(tgrid, u, v, w)))
            wrote = True
        if with_ph:
            write(0, -otx(ddx(tgrid, ph, LOC_FCC)))
            write(1, -otx(ddy(tgrid, ph, LOC_CFC)))
            wrote = True
        if not wrote:
            TX = tile[0].stop - tile[0].start
            z = jnp.zeros((TX,) + u.shape[1:], u.dtype)
            write(0, z)
            write(1, z)
        for t, c in enumerate(tracers):
            write(2 + t, -div_Uc(tgrid, tracer_scheme, u, v, w, c,
                                 tile=tile))

    # per-phase Mosaic register-spill factors: the unpacked calibration
    # (see _pick_tiles) transfers — packed slabs are denser but spills
    # scale with slab element count all the same
    call_h = _build_phase_call_packed(grid, tgrid, 2, 2, body_vorticity, 16)
    call_b = _build_phase_call_packed(grid, tgrid, 2, 2, body_bernoulli, 16)
    call_z = _build_phase_call_packed(grid, tgrid, 3, 2, body_vertical, 16)
    nf_f = 3 + (1 if with_ph else 0) + ntr
    call_f = _build_phase_call_packed(grid, tgrid, nf_f, 2 + ntr,
                                      body_forces, 8)

    sx = slice(Hx, Hx + nx_keep)
    PADF = S * 128 - FLAT
    xpad = _TX_MAX if bounded_x else 0

    def packf(a):
        a = a.astype(grid.dtype).reshape(NXP, FLAT)
        a = jnp.pad(a, [(0, xpad), (0, PADF)])
        return a.reshape(NXP + xpad, S, 128)

    def fused(u, v, w, tracers, ph=None):
        args = [packf(a) for a in
                [u, v, w] + ([ph] if with_ph else [])
                + [tracers[n] for n in names]]
        up, vp, wp = args[0], args[1], args[2]
        outs_h = call_h(up, vp)
        outs_b = call_b(up, vp)
        outs_z = call_z(up, vp, wp)
        outs_f = call_f(*args)

        def embed(parts):
            tot = None
            for o in parts:
                t = o[:nx_keep]
                tot = t if tot is None else tot + t
            tot = tot.reshape(nx_keep, S * 128)[:, :FLAT] \
                .reshape(nx_keep, NYP, ZP)
            full = jnp.zeros((NXP, NYP, ZP), tot.dtype)
            return full.at[sx].set(tot)

        Gu = embed([outs_h[0], outs_b[0], outs_z[0], outs_f[0]])
        Gv = embed([outs_h[1], outs_b[1], outs_z[1], outs_f[1]])
        Gc = {n: embed([outs_f[2 + t]]) for t, n in enumerate(names)}
        return Gu, Gv, Gc

    return fused
