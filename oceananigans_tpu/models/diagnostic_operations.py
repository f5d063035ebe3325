"""Diagnostic wrappers over model forcings and boundary conditions.

Reference semantics:
* src/Models/forcing_operation.jl — ``ForcingOperation(name, model)`` /
  ``ForcingField(name, model)``: evaluate ``model.forcing[name]`` at the
  model's current state as a lazy operation / computed field.
* src/Models/boundary_condition_operation.jl — ``BoundaryConditionOperation``
  / ``BoundaryConditionField``: evaluate a prognostic field's boundary
  condition on one side as a (reduced) diagnostic field.
* src/Models/boundary_mean.jl — ``BoundaryAdjacentMean``: the area-weighted
  mean of a field over its boundary-adjacent interior plane (the reference
  additionally wires this into Open BCs via ``update_boundary_condition!``;
  here the step is one jitted XLA program, so the mean is exposed as a pure
  diagnostic — a mean-outflow Open BC is expressed by passing a discrete-form
  condition instead, see PARITY.md).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..abstract_operations import AbstractOperation, ComputedField
from ..boundary_conditions.fill_halos import eval_bc

_SIDE_AXIS = {"west": 0, "east": 0, "south": 1, "north": 1,
              "bottom": 2, "top": 2}
_LEFT = {"west", "south", "bottom"}


class ForcingOperation(AbstractOperation):
    """Lazily evaluate ``model.forcing[name]`` at the model's current state
    (reference: forcing_operation.jl:66-76 builds the analogous
    KernelFunctionOperation over ``(model.clock, fields(model))``)."""

    def __init__(self, name, model):
        if name not in model.forcing:
            raise KeyError(f"model has no forcing on {name!r}")
        self.name = name
        self.model = model
        self.grid = model.grid
        self.loc = model.loc(name)

    def materialize(self):
        model = self.model
        F = model.forcing[self.name]
        fields = {n: f.data for n, f in model.fields.items()}
        out = (F(model.grid, fields, model.time) if callable(F) else F)
        return jnp.broadcast_to(jnp.asarray(out),
                                model.grid.padded_shape)


def ForcingField(name, model):
    """``Field(ForcingOperation(name, model))`` (reference:
    forcing_operation.jl:79-84)."""
    return ComputedField(ForcingOperation(name, model))


class BoundaryConditionOperation(AbstractOperation):
    """Evaluate the ``side`` boundary condition of prognostic ``name`` as a
    keep-dims boundary-plane array (reference:
    boundary_condition_operation.jl — the i,j/i,k/j,k-indexed
    KernelFunctionOperation; the normal axis is reduced to length 1, the
    analogue of the reference's ``Nothing`` location)."""

    def __init__(self, name, side, model):
        if side not in _SIDE_AXIS:
            raise ValueError(f"side must be one of {sorted(_SIDE_AXIS)}")
        self.name = name
        self.side = side
        self.model = model
        self.grid = model.grid
        self.loc = model.loc(name)
        self.axis = _SIDE_AXIS[side]

    @property
    def bc(self):
        return self.model.bcs[self.name].side(self.side)

    def materialize(self):
        grid, axis = self.grid, self.axis
        bc = self.bc
        t_axes = [ax for ax in range(3) if ax != axis]
        shape = [1, 1, 1]
        for ax in t_axes:
            shape[ax] = grid.padded_shape[ax]
        if bc is None:
            return jnp.zeros(tuple(shape))
        val = eval_bc(bc, grid, self.loc, axis, self.model.time)
        if val is None:
            val = 0.0
        return jnp.broadcast_to(jnp.asarray(val, float), tuple(shape))

    @property
    def interior(self):
        data = self.materialize()
        sl = [slice(None)] * 3
        for ax in (a for a in range(3) if a != self.axis):
            sl[ax] = slice(self.grid.H[ax], self.grid.H[ax] + self.grid.N[ax])
        return data[tuple(sl)]

    def compute(self):
        return self

    def __call__(self, model=None):
        # writer protocol
        return self


def BoundaryConditionField(name, side, model):
    """Computed-field wrapper caching the boundary-plane evaluation
    (reference: boundary_condition_operation.jl BoundaryConditionField)."""
    return ComputedField(BoundaryConditionOperation(name, side, model))


def boundary_adjacent_mean(field, side):
    """Area-weighted mean of ``field`` over the interior plane adjacent to
    ``side`` (reference: boundary_mean.jl — ``sum!(u·An)/sum!(An)`` at the
    boundary-adjacent index; face-located normal axes use the first interior
    face, index 2 in the reference's 1-based convention)."""
    if side not in _SIDE_AXIS:
        raise ValueError(f"side must be one of {sorted(_SIDE_AXIS)}")
    axis = _SIDE_AXIS[side]
    grid, loc = field.grid, field.loc
    area = {0: grid.Ax, 1: grid.Ay, 2: grid.Az}[axis](loc)
    data = field.interior
    # metrics may be scalars (regular axes) or broadcast-shaped arrays
    An = jnp.broadcast_to(jnp.asarray(area, data.dtype),
                          grid.padded_shape)[grid.interior_slices]
    # boundary-adjacent interior plane: the first interior cell (or, for a
    # face-located normal axis on the left side, the first interior face —
    # one in from the boundary face itself)
    if side in _LEFT:
        i = 1 if loc[axis] == "f" else 0
    else:
        i = data.shape[axis] - 1
        if loc[axis] == "f" and str(grid.topology[axis]) == "bounded":
            # the last interior entry IS the boundary face; boundary-
            # ADJACENT means one face in (mirror of the left-side i=1)
            i -= 1
    sl = [slice(None)] * 3
    sl[axis] = i
    plane, w = data[tuple(sl)], An[tuple(sl)]
    return jnp.sum(plane * w) / jnp.sum(w)


class BoundaryAdjacentMean:
    """Stateful diagnostic mirroring the reference's struct: calling it with
    ``(side, field)`` recomputes and stores ``value`` (boundary_mean.jl:
    95-115); calling it with no arguments returns the stored value."""

    def __init__(self):
        self.value = 0.0

    def __call__(self, side=None, field=None):
        if side is None:
            return self.value
        self.value = float(boundary_adjacent_mean(field, side))
        return self.value


def BuoyancyField(model):
    """Buoyancy at (c,c,c) from the model's buoyancy formulation and current
    tracers (reference: BuoyancyFormulations.BuoyancyField)."""
    from ..fields import Field
    from ..grids.topology import LOC_CCC
    if model.buoyancy is None:
        raise ValueError("model has no buoyancy formulation")
    tracers = {n: model.state["fields"][n] for n in model.tracer_names}
    data = model.buoyancy.buoyancy_ccc(model.grid, tracers)
    import jax.numpy as jnp
    data = jnp.broadcast_to(data, model.grid.padded_shape)
    return Field(model.grid, LOC_CCC, None, data)


def PressureField(model):
    """The model's (nonhydrostatic kinematic) pressure as a Field
    (reference: Models.PressureField)."""
    return model.field("p")
