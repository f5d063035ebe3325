"""Biogeochemistry hook interface.

Reference semantics: src/Biogeochemistry.jl — `AbstractBiogeochemistry` (:57)
/ `AbstractContinuousFormBiogeochemistry` (:93): a biogeochemistry model adds
required tracers, per-tracer reaction (source/sink) terms, drift (e.g.
sinking) velocities, and an `update_biogeochemical_state!` hook.

Protocol consumed by models:

    required_tracers: tuple of names
    tracer_tendency(grid, name, fields, time) -> padded array (reactions)
    drift_velocity(name) -> (u_drift, v_drift, w_drift) scalars/arrays or None
    update_state(model) -> None (host-side hook between steps)
"""

from __future__ import annotations

import jax.numpy as jnp

from .grids.base import broadcastable_1d
from .grids.topology import LOC_CCC


class Biogeochemistry:
    """Base class: subclass and override."""

    required_tracers = ()

    def tracer_tendency(self, grid, name, fields, time):
        return 0.0

    def drift_velocity(self, name):
        return None

    def update_state(self, model):
        return None


class SimpleBiogeochemistry(Biogeochemistry):
    """Continuous-form reactions: reactions[name] is a traceable callable
    f(x, y, z, t, **tracer_values) -> source term (the analogue of
    AbstractContinuousFormBiogeochemistry); drift[name] = w_sinking."""

    def __init__(self, tracers=(), reactions=None, drift=None):
        self.required_tracers = tuple(tracers)
        self.reactions = dict(reactions or {})
        self.drift = dict(drift or {})

    def tracer_tendency(self, grid, name, fields, time):
        f = self.reactions.get(name)
        if f is None:
            return 0.0
        coords = [broadcastable_1d(grid.coord_padded(ax, "c"), ax)
                  for ax in range(3)]
        kwargs = {n: fields[n] for n in self.required_tracers if n in fields}
        return f(*coords, time, **kwargs)

    def drift_velocity(self, name):
        w = self.drift.get(name)
        if w is None:
            return None
        return (0.0, 0.0, w)
