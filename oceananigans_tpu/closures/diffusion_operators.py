"""Shared diffusive-flux-divergence operators.

Reference semantics: src/TurbulenceClosures/abstract_scalar_diffusivity_closure.jl
— the closure contributes -∂ⱼτᵢⱼ (momentum) and -∇·q (tracers) to tendencies,
with viscous fluxes

    isotropic:   τᵢⱼ = -2 ν Σᵢⱼ            (full strain tensor, :194-202)
    vertical:    τᵢ₃ = -ν ∂z uᵢ            (:229)
    tracers:     q = -κ ∇c

Strain-rate components at their natural C-grid locations
(reference: src/TurbulenceClosures/velocity_tracer_gradients.jl)."""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.topology import CENTER, FACE
from ..operators.operators import (LOC_CCC, LOC_CCF, LOC_CFC, LOC_FCC,
                                   _delta_c, _delta_f, ddx, ddy, ddz, delta,
                                   interp)

X, Y, Z = 0, 1, 2
LOC_FFC = (FACE, FACE, CENTER)
LOC_FCF = (FACE, CENTER, FACE)
LOC_CFF = (CENTER, FACE, FACE)


def _flip(loc, axis):
    out = list(loc)
    out[axis] = FACE if loc[axis] == CENTER else CENTER
    return tuple(out)


def _area(grid, loc, axis):
    return (grid.Ax(loc), grid.Ay(loc), grid.Az(loc))[axis]


def _dd(grid, a, axis, out_loc):
    return (ddx, ddy, ddz)[axis](grid, a, out_loc)


def _interp_kappa(grid, kappa, axis, floc):
    """Diffusivity evaluated at the flux location; scalars pass through, ccc
    arrays are interpolated."""
    if jnp.isscalar(kappa) or not hasattr(kappa, "ndim") or kappa.ndim == 0:
        return kappa
    return interp(grid, kappa, axis, floc[axis])


def _fm(grid, floc, flux):
    """Zero the flux at immersed faces (the dense-mask analogue of the
    reference's conditional fluxes, conditional_differences.jl): no diffusive
    transport through or inside the topography."""
    fmat = getattr(grid, "fluid_mask_at", None)
    if fmat is None:
        return flux
    return flux * fmat(floc, getattr(flux, "dtype", None))


def div_kappa_grad(grid, q, loc, kappa, axes=(0, 1, 2)):
    """∇·(κ ∇q) at ``loc`` over the selected axes (the tendency contribution
    of a gradient-diffusion closure; sign: this is ADDED to G)."""
    total = None
    for axis in axes:
        if grid.is_flat(axis):
            continue
        floc = _flip(loc, axis)
        grad = _dd(grid, q, axis, floc)
        k = _interp_kappa(grid, kappa, axis, floc)
        flux = _fm(grid, floc, _area(grid, floc, axis) * k * grad)
        term = delta(grid, flux, axis, loc[axis])
        total = term if total is None else total + term
    if total is None:
        return jnp.zeros_like(q)
    return total / grid.V(loc)


def vitd_explicit_z_term(grid, q, loc, kappa, cross_grad=None):
    """Explicit z-flux remainder under VerticallyImplicitTimeDiscretization
    (reference: abstract_scalar_diffusivity_closure.jl:263-292). The implicit
    tridiagonal solve owns κ ∂z q on INTERIOR z faces and drops the boundary
    faces, so the explicit tendency must keep (a) the full flux on the two
    BOUNDARY faces — this is how Value/Gradient z boundary conditions act on
    an implicitly-diffused field — and (b) any ``cross_grad`` part of the flux
    the tridiagonal operator cannot represent on interior faces (ν ∂x w for
    the isotropic strain form, reference ivd_viscous_flux_uz).

    Returns the tendency contribution (to be ADDED to G), or None when the
    grid has no z halo to hold the boundary values (the z-compact layout's
    built-in mirror BCs are no-flux, for which this term vanishes), z is flat,
    or z is not bounded."""
    from ..grids.topology import BOUNDED, PERIODIC
    if not grid.is_flat(Z) and grid.topology[2] == PERIODIC:
        # the tridiagonal implicit operator assumes walls (no-flux rows at
        # k=1, Nz) — on a z-periodic grid it would silently mis-diffuse
        # (reference keeps the full explicit z flux everywhere off Bounded)
        raise ValueError(
            "VerticallyImplicitTimeDiscretization needs a Bounded z "
            "direction; use ExplicitTimeDiscretization on z-periodic grids")
    if grid.is_flat(Z) or grid.topology[2] != BOUNDED or grid.H[2] < 1:
        return None
    import numpy as np
    floc = _flip(loc, Z)
    h, n = grid.H[2], grid.N[2]
    bmask = np.zeros(q.shape[2])
    bmask[h] = 1.0          # bottom boundary face (face k sits below cell k)
    bmask[h + n] = 1.0      # top boundary face
    bmask = jnp.asarray(bmask.reshape(1, 1, -1), q.dtype)
    grad = _dd(grid, q, Z, floc) * bmask
    if cross_grad is not None:
        # full flux at the walls already includes the cross term; adding it
        # everywhere keeps interior faces cross-only and walls complete
        grad = grad + cross_grad
    k = _interp_kappa(grid, kappa, Z, floc)
    flux = _fm(grid, floc, _area(grid, floc, Z) * k * grad)
    return delta(grid, flux, Z, loc[2]) / grid.V(loc)


# -- strain-rate tensor components --------------------------------------------

def Sxx_ccc(grid, u):
    return ddx(grid, u, LOC_CCC)


def Syy_ccc(grid, v):
    return ddy(grid, v, LOC_CCC)


def Szz_ccc(grid, w):
    return ddz(grid, w, LOC_CCC)


def Sxy_ffc(grid, u, v):
    return 0.5 * (ddy(grid, u, LOC_FFC) + ddx(grid, v, LOC_FFC))


def Sxz_fcf(grid, u, w):
    return 0.5 * (ddz(grid, u, LOC_FCF) + ddx(grid, w, LOC_FCF))


def Syz_cff(grid, v, w):
    return 0.5 * (ddz(grid, v, LOC_CFF) + ddy(grid, w, LOC_CFF))


def div_2nu_strain_u(grid, u, v, w, nu_ccc, nu_ffc, nu_fcf, axes=(0, 1, 2)):
    """-∂ⱼτ₁ⱼ with τ₁ⱼ = -2νΣ₁ⱼ: the isotropic viscous tendency for u at fcc."""
    terms = []
    if X in axes and not grid.is_flat(X):
        flux = _fm(grid, LOC_CCC, grid.Ax(LOC_CCC) * 2 * nu_ccc * Sxx_ccc(grid, u))
        terms.append(_delta_f(grid, flux, X))
    if Y in axes and not grid.is_flat(Y):
        flux = _fm(grid, LOC_FFC, grid.Ay(LOC_FFC) * 2 * nu_ffc * Sxy_ffc(grid, u, v))
        terms.append(_delta_c(grid, flux, Y))
    if Z in axes and not grid.is_flat(Z):
        flux = _fm(grid, LOC_FCF, grid.Az(LOC_FCF) * 2 * nu_fcf * Sxz_fcf(grid, u, w))
        terms.append(_delta_c(grid, flux, Z))
    if not terms:
        return jnp.zeros_like(u)
    return sum(terms) / grid.V(LOC_FCC)


def div_2nu_strain_v(grid, u, v, w, nu_ccc, nu_ffc, nu_cff, axes=(0, 1, 2)):
    terms = []
    if X in axes and not grid.is_flat(X):
        flux = _fm(grid, LOC_FFC, grid.Ax(LOC_FFC) * 2 * nu_ffc * Sxy_ffc(grid, u, v))
        terms.append(_delta_c(grid, flux, X))
    if Y in axes and not grid.is_flat(Y):
        flux = _fm(grid, LOC_CCC, grid.Ay(LOC_CCC) * 2 * nu_ccc * Syy_ccc(grid, v))
        terms.append(_delta_f(grid, flux, Y))
    if Z in axes and not grid.is_flat(Z):
        flux = _fm(grid, LOC_CFF, grid.Az(LOC_CFF) * 2 * nu_cff * Syz_cff(grid, v, w))
        terms.append(_delta_c(grid, flux, Z))
    if not terms:
        return jnp.zeros_like(v)
    return sum(terms) / grid.V(LOC_CFC)


def div_2nu_strain_w(grid, u, v, w, nu_ccc, nu_fcf, nu_cff, axes=(0, 1, 2)):
    terms = []
    if X in axes and not grid.is_flat(X):
        flux = _fm(grid, LOC_FCF, grid.Ax(LOC_FCF) * 2 * nu_fcf * Sxz_fcf(grid, u, w))
        terms.append(_delta_c(grid, flux, X))
    if Y in axes and not grid.is_flat(Y):
        flux = _fm(grid, LOC_CFF, grid.Ay(LOC_CFF) * 2 * nu_cff * Syz_cff(grid, v, w))
        terms.append(_delta_c(grid, flux, Y))
    if Z in axes and not grid.is_flat(Z):
        flux = _fm(grid, LOC_CCC, grid.Az(LOC_CCC) * 2 * nu_ccc * Szz_ccc(grid, w))
        terms.append(_delta_f(grid, flux, Z))
    if not terms:
        return jnp.zeros_like(w)
    return sum(terms) / grid.V(LOC_CCF)
