"""Background (mean-flow) field decomposition.

Reference semantics: src/Models/NonhydrostaticModels/background_fields.jl —
prognostic fields are PERTURBATIONS about a prescribed, possibly
time-dependent background; the tendencies gain the cross terms

    G_u += −div(U_total, u′) − div(U′, U_bg)        (momentum; kernel
           functions nonhydrostatic_tendency_kernel_functions.jl:93-94)
    G_c += −div(U_total, c′) − div(U′, c_bg)        (tracers; :292-293)

where the background's self-advection −div(U_bg, U_bg) is absent (the
background is assumed to satisfy its own balance).
"""

from __future__ import annotations

import inspect

import jax.numpy as jnp
import numpy as np

from .grids.base import broadcastable_1d


class BackgroundField:
    """A background field ``func(x, y, z, t [, parameters])`` (reference:
    background_fields.jl `BackgroundField(func; parameters)`); scalars and
    arrays are accepted too (held constant in time)."""

    def __init__(self, func_or_value, parameters=None):
        self.value = func_or_value
        self.parameters = parameters

    def evaluate(self, grid, loc, time):
        v = self.value
        if not callable(v):
            from .fields.field import set_on_padded
            return set_on_padded(grid, loc, v)
        coords = [broadcastable_1d(grid.coord_padded(ax, loc[ax]), ax)
                  for ax in range(3)]
        args = (*coords, time)
        if self.parameters is not None:
            args = args + (self.parameters,)
        return jnp.broadcast_to(jnp.asarray(v(*args), grid.dtype),
                                grid.padded_shape)


def evaluate_background(grid, loc, bg, time):
    """Evaluate a background entry — a :class:`BackgroundField`, a callable
    ``f(x, y, z)`` or ``f(x, y, z, t)``, a scalar, or an array — into a
    padded array."""
    if isinstance(bg, BackgroundField):
        return bg.evaluate(grid, loc, time)
    if callable(bg):
        try:
            n = len(inspect.signature(bg).parameters)
        except (TypeError, ValueError):
            n = 3
        if n >= 4:
            return BackgroundField(bg).evaluate(grid, loc, time)
    from .fields.field import set_on_padded
    return set_on_padded(grid, loc, bg)
