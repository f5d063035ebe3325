"""z* (free-surface-following) vertical coordinate support.

Reference semantics: src/Grids/vertical_discretization.jl
(MutableVerticalDiscretization with σⁿ, σ⁻, ∂t_σ scale factors),
src/Models/HydrostaticFreeSurfaceModels/z_star_vertical_spacing.jl (σ =
(H + η)/H updated each step) and hydrostatic_free_surface_ab2_step.jl:116-130
(σ-weighted conservative tracer update c ← (σⁿ c + Δt G)/σⁿ⁺¹).

TPU-first: the static grid never changes; a lightweight TRACED proxy wraps it
with the σ(x, y, t) scale factor, and the operator layer — which only ever
asks for broadcastable metric factors — consumes the traced metrics
unchanged. The grid-motion contribution to the diagnostic vertical velocity
(the ∂t_σ term) is included in HydrostaticFreeSurfaceModel._w_from_continuity;
the ∂t_σ contribution inside the UPWINDED vector-invariant divergence flux is
still pending (zero on static grids)."""

from __future__ import annotations

import jax.numpy as jnp

from ..operators.operators import interp


class ZStarGrid:
    """Ephemeral moving-grid proxy: metrics scaled by σ = (H + η)/H.

    ``sigma`` is a padded (npx, npy, 1) traced array at cell centers."""

    def __init__(self, base, sigma):
        self.base = base
        self.sigma = sigma

    # -- σ at staggered horizontal locations -----------------------------------

    def _sigma_at(self, loc):
        s = self.sigma
        if loc[0] == "f":
            s = interp(self.base, s, 0, "f")
        if loc[1] == "f":
            s = interp(self.base, s, 1, "f")
        return s

    # -- metrics ---------------------------------------------------------------

    def dz(self, loc):
        return self.base.dz(loc) * self._sigma_at(loc)

    def dx(self, loc):
        return self.base.dx(loc)

    def dy(self, loc):
        return self.base.dy(loc)

    def Ax(self, loc):
        return self.base.dy(loc) * self.dz(loc)

    def Ay(self, loc):
        return self.base.dx(loc) * self.dz(loc)

    def Az(self, loc):
        return self.base.Az(loc)

    def V(self, loc):
        return self.base.Az(loc) * self.dz(loc)

    # -- delegation -------------------------------------------------------------

    def __getattr__(self, name):
        return getattr(self.base, name)


def sigma_from_eta(grid, eta, depth):
    """σ = (H + η)/H at cell centers (padded 2D)."""
    return 1.0 + eta / depth
