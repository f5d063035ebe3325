"""Tracer-variance budget diagnostics.

Reference semantics: src/Models/VarianceDissipationComputations/
(VarianceDissipationComputations.jl:1-46) — track the production/dissipation
terms of the tracer-variance (c²) budget associated with the advection scheme
(implied numerical dissipation) and the closure (explicit dissipation).

For a tracer c with tendency G = G_adv + G_diff:

    d⟨c²⟩/dt = 2⟨c G⟩;   χ_adv = -2⟨c G_adv⟩  (implied scheme dissipation,
                          zero for a purely conservative+centered scheme),
    χ_diff = 2⟨κ |∇c|²⟩   (explicit closure dissipation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..advection import div_Uc
from ..grids.topology import LOC_CCC
from ..operators.operators import ddx, ddy, ddz


class VarianceDissipation:
    """Callable diagnostic: returns a dict of variance-budget terms.

    Usage::

        vd = VarianceDissipation(model, "c")
        sim.add_callback(lambda s: print(vd(s.model)), IterationInterval(10))
    """

    def __init__(self, model, tracer, kappa=None):
        self.model = model
        self.tracer = tracer
        self.kappa = kappa

        grid = model.grid

        def compute(fields):
            filled = model._fill_all(fields, 0.0)
            c = filled[self.tracer]
            u, v, w = filled["u"], filled["v"], \
                filled.get("w", jnp.zeros_like(filled["u"]))
            Gadv = -div_Uc(grid, model_tracer_scheme(model), u, v, w, c)
            ii = grid.interior_slices
            V = jnp.broadcast_to(jnp.asarray(grid.V(LOC_CCC), c.dtype),
                                 c.shape)[ii]
            chi_adv = -2 * jnp.sum((c * Gadv)[ii] * V)
            out = {"chi_advection": chi_adv,
                   "variance": jnp.sum((c * c)[ii] * V)}
            if self.kappa is not None:
                gx = ddx(grid, c, ("f", "c", "c"))
                gy = ddy(grid, c, ("c", "f", "c"))
                gz = ddz(grid, c, ("c", "c", "f"))
                grad2 = (gx * gx + gy * gy + gz * gz)[ii]
                out["chi_diffusion"] = 2 * self.kappa * jnp.sum(grad2 * V)
            return out

        self._compute = jax.jit(compute)

    def __call__(self, model=None):
        model = model or self.model
        out = self._compute(model.state["fields"])
        return {k: float(v) for k, v in out.items()}


def model_tracer_scheme(model):
    return getattr(model, "tracer_advection", None) or model.advection
