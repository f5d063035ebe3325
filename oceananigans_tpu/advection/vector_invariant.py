"""Vector-invariant (rotational form) momentum advection for hydrostatic
models.

Reference semantics: src/Advection/vector_invariant_advection.jl (:8, :82) —
the horizontal momentum advection is split into a vertical-vorticity term, a
kinetic-energy gradient, and vertical advection:

    u: -(ζ v̂) + ∂x K + ŵ ∂z u
    v: +(ζ û) + ∂y K + ŵ ∂z v

with `EnergyConserving` and `EnstrophyConserving` discretizations of the
vorticity term (vector_invariant_upwinding.jl and the Coriolis analogues in
src/Coriolis/hydrostatic_spherical_coriolis.jl). WENO-upwinded vorticity
(`VelocityStencil`) is a future extension."""

from __future__ import annotations

import jax.numpy as jnp

from ..grids.topology import LOC_CFC, LOC_FCC
from ..operators.operators import (ddx, ddy, ddz, ix_c, ix_f, iy_c, iy_f,
                                   iz_c, iz_f, zeta3_ffc)

ENERGY = "energy_conserving"
ENSTROPHY = "enstrophy_conserving"


class VectorInvariant:
    required_halo = 2

    def __init__(self, vorticity_scheme=ENSTROPHY):
        self.vorticity_scheme = vorticity_scheme

    def _fp(self):
        return ("VectorInvariant", self.vorticity_scheme)

    def __hash__(self):
        return hash(self._fp())

    def __eq__(self, o):
        return hasattr(o, "_fp") and self._fp() == o._fp()

    def __repr__(self):
        return f"VectorInvariant({self.vorticity_scheme})"

    def momentum_tendencies(self, grid, u, v, w):
        """Return the ADVECTION contributions (to be subtracted from G)."""
        zeta = zeta3_ffc(grid, u, v)
        KE = 0.5 * (ix_c(grid, u * u) + iy_c(grid, v * v))

        if self.vorticity_scheme == ENSTROPHY:
            # q̄ʸ · v̄ˣʸ at fcc ;  q̄ˣ · ūˣʸ at cfc
            zv = iy_c(grid, zeta) * ix_f(grid, iy_c(grid, v))
            zu = ix_c(grid, zeta) * iy_f(grid, ix_c(grid, u))
        else:
            # energy conserving: ℑy(ζ · v̄ˣ), ℑx(ζ · ūʸ)
            zv = iy_c(grid, zeta * ix_f(grid, v))
            zu = ix_c(grid, zeta * iy_f(grid, u))

        # vertical advection (advective form): ŵ ∂z u at fcc / ŵ ∂z v at cfc
        if grid.is_flat(2):
            wdzu = 0.0
            wdzv = 0.0
        else:
            wdzu = iz_c(grid, ix_f(grid, w) * ddz(grid, u, ("f", "c", "f")))
            wdzv = iz_c(grid, iy_f(grid, w) * ddz(grid, v, ("c", "f", "f")))

        adv_u = -zv + ddx(grid, KE, LOC_FCC) + wdzu
        adv_v = zu + ddy(grid, KE, LOC_CFC) + wdzv
        return adv_u, adv_v
