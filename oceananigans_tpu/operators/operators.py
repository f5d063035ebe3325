"""Finite-volume stencil micro-operators on halo-padded arrays.

The vocabulary mirrors the reference's Operators layer exactly
(reference: src/Operators/difference_operators.jl:7-27,
interpolation_operators.jl, derivative_operators.jl,
divergence_operators.jl:16-19, laplacian_operators.jl,
vorticity_operators.jl), with the suffix naming convention:

    dx_f(grid, c)   ≡ δxᶠᵃᵃ : difference of a Center quantity, result at Face
    dx_c(grid, f)   ≡ δxᶜᵃᵃ : difference of a Face quantity, result at Center
    ix_f / ix_c     ≡ ℑxᶠᵃᵃ / ℑxᶜᵃᵃ : 2-point interpolations
    ddx(grid, a, out_loc) ≡ ∂xᶠᶜᶜ etc.: metric-aware derivative

Conventions (Arakawa C): face ``i`` is the LEFT face of cell ``i``, so
``δxᶠ(c)[i] = c[i] - c[i-1]`` and ``δxᶜ(f)[i] = f[i+1] - f[i]``.

Flat directions compile to exact zeros / identity (the analogue of the
reference's Flat specializations, difference_operators.jl:33-49) — XLA folds
them away entirely.

All functions take and return full padded jnp arrays; every shifted read fuses
into the consuming elementwise kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.topology import CENTER, FACE
from .shifts import shift

X, Y, Z = 0, 1, 2


# -- differences δ -------------------------------------------------------------

def _delta_f(grid, a, axis):
    if grid.is_flat(axis):
        return jnp.zeros_like(a)
    return a - shift(a, -1, axis)


def _delta_c(grid, a, axis):
    if grid.is_flat(axis):
        return jnp.zeros_like(a)
    return shift(a, +1, axis) - a


def dx_f(grid, c): return _delta_f(grid, c, X)
def dx_c(grid, f): return _delta_c(grid, f, X)
def dy_f(grid, c): return _delta_f(grid, c, Y)
def dy_c(grid, f): return _delta_c(grid, f, Y)
def dz_f(grid, c): return _delta_f(grid, c, Z)
def dz_c(grid, f): return _delta_c(grid, f, Z)


def delta(grid, a, axis, out_loc_axis):
    return _delta_f(grid, a, axis) if out_loc_axis == FACE else _delta_c(grid, a, axis)


# -- interpolations ℑ ----------------------------------------------------------

def _interp_f(grid, a, axis):
    if grid.is_flat(axis):
        return a
    return 0.5 * (a + shift(a, -1, axis))


def _interp_c(grid, a, axis):
    if grid.is_flat(axis):
        return a
    return 0.5 * (shift(a, +1, axis) + a)


def ix_f(grid, c): return _interp_f(grid, c, X)
def ix_c(grid, f): return _interp_c(grid, f, X)
def iy_f(grid, c): return _interp_f(grid, c, Y)
def iy_c(grid, f): return _interp_c(grid, f, Y)
def iz_f(grid, c): return _interp_f(grid, c, Z)
def iz_c(grid, f): return _interp_c(grid, f, Z)


def interp(grid, a, axis, out_loc_axis):
    return _interp_f(grid, a, axis) if out_loc_axis == FACE else _interp_c(grid, a, axis)


def interp_to(grid, a, from_loc, to_loc):
    """Interpolate ``a`` from staggered location ``from_loc`` to ``to_loc``
    (2-point means in each direction that moves — the analogue of the
    reference's ℑ composition / @at machinery, src/AbstractOperations/at.jl)."""
    out = a
    for axis in range(3):
        if from_loc[axis] != to_loc[axis]:
            out = interp(grid, out, axis, to_loc[axis])
    return out


# -- metric-aware derivatives ∂ ------------------------------------------------
# reference: src/Operators/derivative_operators.jl — ∂xᶠ(c) = δxᶠ(c)/Δxᶠ where
# the spacing is evaluated at the OUTPUT location.

def ddx(grid, a, out_loc):
    return delta(grid, a, X, out_loc[0]) / grid.dx(out_loc)


def ddy(grid, a, out_loc):
    return delta(grid, a, Y, out_loc[1]) / grid.dy(out_loc)


def ddz(grid, a, out_loc):
    return delta(grid, a, Z, out_loc[2]) / grid.dz(out_loc)


# -- divergence ----------------------------------------------------------------
# reference: src/Operators/divergence_operators.jl:16-19 —
# divᶜᶜᶜ(u,v,w) = V⁻¹ [δxᶜ(Ax u) + δyᶜ(Ay v) + δzᶜ(Az w)]

LOC_CCC = (CENTER, CENTER, CENTER)
LOC_FCC = (FACE, CENTER, CENTER)
LOC_CFC = (CENTER, FACE, CENTER)
LOC_CCF = (CENTER, CENTER, FACE)
LOC_FFC = (FACE, FACE, CENTER)


def div_ccc(grid, u, v, w):
    return (dx_c(grid, grid.Ax(LOC_FCC) * u)
            + dy_c(grid, grid.Ay(LOC_CFC) * v)
            + dz_c(grid, grid.Az(LOC_CCF) * w)) / grid.V(LOC_CCC)


def div_xy_ccc(grid, u, v):
    """Horizontal divergence (used by free-surface / w-from-continuity;
    reference: div_xyᶜᶜᶜ)."""
    return (dx_c(grid, grid.Ax(LOC_FCC) * u)
            + dy_c(grid, grid.Ay(LOC_CFC) * v)) / grid.V(LOC_CCC)


# -- Laplacian -----------------------------------------------------------------
# reference: src/Operators/laplacian_operators.jl — ∇²ᶜᶜᶜ(c) =
# V⁻¹ [δxᶜ(Ax ∂xᶠ c) + δyᶜ(Ay ∂yᶠ c) + δzᶜ(Az ∂zᶠ c)]

def laplacian_ccc(grid, c):
    lx = (FACE, CENTER, CENTER)
    ly = (CENTER, FACE, CENTER)
    lz = (CENTER, CENTER, FACE)
    return (dx_c(grid, grid.Ax(lx) * ddx(grid, c, lx))
            + dy_c(grid, grid.Ay(ly) * ddy(grid, c, ly))
            + dz_c(grid, grid.Az(lz) * ddz(grid, c, lz))) / grid.V(LOC_CCC)


# -- vorticity -----------------------------------------------------------------
# reference: src/Operators/vorticity_operators.jl — vertical vorticity at ffc
# via the circulation theorem: ζ = (δxᶠ(Δyᶜᶠᶜ v) - δyᶠ(Δxᶠᶜᶜ u)) / Az_ffc

def zeta3_ffc(grid, u, v):
    return (dx_f(grid, grid.dy(LOC_CFC) * v)
            - dy_f(grid, grid.dx(LOC_FCC) * u)) / grid.Az(LOC_FFC)
