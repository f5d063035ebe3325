"""User forcing functions.

Reference semantics: src/Forcings/ — `ContinuousForcing` (continuous_forcing.jl:
user function of (x, y, z, t, fields...) auto-interpolated to the target
location), `DiscreteForcing` (discrete_forcing.jl: f(i, j, k, grid, clock,
model_fields)), `Relaxation` with masks/targets (relaxation.jl:257),
`AdvectiveForcing` (advective_forcing.jl: forcing as a divergence of a
prescribed flux / settling velocity), `MultipleForcings` (multiple_forcings.jl).

Model protocol: every forcing is called as ``F(grid, fields, time) -> padded
array`` (already the discrete form). The classes here adapt the reference's
user-facing constructors to that protocol; all callables must be traceable."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grids.base import broadcastable_1d
from ..grids.topology import LOC_CCC
from ..operators.operators import interp_to


class Forcing:
    loc = LOC_CCC

    def __call__(self, grid, fields, time):
        raise NotImplementedError


class ContinuousForcing(Forcing):
    """f(x, y, z, t, *field_values) evaluated at the target location
    (reference: continuous_forcing.jl — `Forcing(func; field_dependencies)`).

    field_dependencies name prognostic fields passed (interpolated to the
    forcing location) as trailing arguments."""

    def __init__(self, func, loc=None, field_dependencies=(),
                 parameters=None):
        self.func = func
        # None = derive from the forced field at bind time (round-5 review:
        # face-located tendencies previously received CCC-evaluated forcing
        # with a half-cell offset)
        self.loc = tuple(loc) if loc is not None else None
        self._dep_locs = None
        if isinstance(field_dependencies, str):
            field_dependencies = (field_dependencies,)
        self.field_dependencies = tuple(field_dependencies)
        # trailing parameters argument (reference: continuous_forcing.jl
        # `Forcing(func; parameters)` — func(x, y, z, t, fields..., p))
        self.parameters = parameters

    def bind(self, name, loc=None, locs=None):
        if self.loc is None and loc is not None:
            self.loc = tuple(loc)
        if locs is not None:
            self._dep_locs = dict(locs)
        return self

    def __call__(self, grid, fields, time):
        loc = self.loc or LOC_CCC
        coords = [broadcastable_1d(grid.coord_padded(ax, loc[ax]), ax)
                  for ax in range(3)]
        deps = []
        from ..models.nonhydrostatic import PROGNOSTIC_LOCS
        dep_locs = self._dep_locs or PROGNOSTIC_LOCS
        for name in self.field_dependencies:
            src_loc = dep_locs.get(name, PROGNOSTIC_LOCS.get(name, LOC_CCC))
            deps.append(interp_to(grid, fields[name], src_loc, loc))
        if self.parameters is not None:
            deps.append(self.parameters)
        return self.func(*coords, time, *deps)


class DiscreteForcing(Forcing):
    """f(grid, fields, t[, parameters]) raw form (reference:
    discrete_forcing.jl)."""

    def __init__(self, func, parameters=None):
        self.func = func
        self.parameters = parameters

    def __call__(self, grid, fields, time):
        if self.parameters is not None:
            return self.func(grid, fields, time, self.parameters)
        return self.func(grid, fields, time)


def make_forcing(func=None, parameters=None, field_dependencies=(),
                 discrete_form=False, loc=LOC_CCC):
    """The reference's ``Forcing(func; parameters, field_dependencies,
    discrete_form)`` convenience constructor (src/Forcings/forcing.jl):
    dispatches to :class:`ContinuousForcing` or :class:`DiscreteForcing`."""
    if discrete_form:
        if field_dependencies:
            raise ValueError("field_dependencies only apply to the "
                             "continuous form (the discrete form receives "
                             "all fields)")
        return DiscreteForcing(func, parameters=parameters)
    return ContinuousForcing(func, loc=loc,
                             field_dependencies=field_dependencies,
                             parameters=parameters)


class GaussianMask:
    """exp(-(ξ-center)²/(2 width²)) mask factory (reference:
    relaxation.jl GaussianMask)."""

    def __init__(self, center, width, axis=2):
        self.center, self.width, self.axis = center, width, axis

    def __call__(self, x, y, z):
        xi = (x, y, z)[self.axis]
        return jnp.exp(-((xi - self.center) ** 2) / (2 * self.width ** 2))


class PiecewiseLinearMask:
    """Triangular mask: 1 at ``center``, linear to 0 at |ξ-center| = width
    (reference: relaxation.jl PiecewiseLinearMask)."""

    def __init__(self, center, width, axis=2):
        self.center, self.width, self.axis = center, width, axis

    def __call__(self, x, y, z):
        xi = (x, y, z)[self.axis]
        return jnp.maximum(0.0, 1 - abs(xi - self.center) / self.width)


class LinearTarget:
    """target = intercept + gradient·ξ (reference: relaxation.jl
    LinearTarget)."""

    def __init__(self, intercept=0.0, gradient=0.0, axis=2):
        self.intercept, self.gradient, self.axis = intercept, gradient, axis

    def __call__(self, x, y, z, t):
        return self.intercept + self.gradient * (x, y, z)[self.axis]


class Relaxation(Forcing):
    """F = -rate · mask(x,y,z) · (field - target) (reference:
    relaxation.jl)."""

    def __init__(self, rate, mask=None, target=0.0, field_name=None,
                 loc=None):
        self.rate = float(rate)
        self.mask = mask
        self.target = target
        self.field_name = field_name
        self.loc = tuple(loc) if loc is not None else None

    def bind(self, name, loc=None, locs=None):
        self.field_name = self.field_name or name
        if self.loc is None and loc is not None:
            # evaluate the mask/target at the FORCED FIELD's staggering
            # (round-5 review: a sponge on u was built half a cell off)
            self.loc = tuple(loc)
        return self

    def __call__(self, grid, fields, time):
        name = self.field_name
        if name is None:
            raise ValueError("Relaxation needs field_name (models bind it "
                             "automatically when passed via forcing={name: ...})")
        q = fields[name]
        loc = self.loc or LOC_CCC
        coords = [broadcastable_1d(grid.coord_padded(ax, loc[ax]), ax)
                  for ax in range(3)]
        target = self.target
        if callable(target):
            target = target(*coords, time)
        m = 1.0 if self.mask is None else self.mask(*coords)
        return -self.rate * m * (q - target)


class AdvectiveForcing(Forcing):
    """Forcing by an extra advective flux with a prescribed (e.g. settling)
    velocity: F = -∂z(w_s q) (reference: advective_forcing.jl)."""

    def __init__(self, w=0.0, u=0.0, v=0.0, field_name=None):
        self.u, self.v, self.w = u, v, w
        self.field_name = field_name

    def bind(self, name, loc=None, locs=None):
        self.field_name = self.field_name or name
        return self

    def __call__(self, grid, fields, time):
        from ..advection import Centered, div_Uc
        q = fields[self.field_name]
        shape = grid.padded_shape
        dtype = q.dtype

        def vel(v):
            if hasattr(v, "data"):      # a Field (round-5 review: passing
                # re-embed on THIS grid: a user Field may have been built on
                # the pre-halo-inflation grid, whose padding differs
                if tuple(np.shape(v.data)) != tuple(shape):
                    from ..fields.field import set_on_padded
                    return set_on_padded(grid, v.loc, jnp.asarray(v.interior))
                return v.data           # one crashed inside div_Uc
            if np.isscalar(v):
                return jnp.full(shape, v, dtype)
            return v

        return -div_Uc(grid, Centered(2), vel(self.u), vel(self.v),
                       vel(self.w), q)


class FieldTimeSeriesForcing(Forcing):
    """Forcing from a saved FieldTimeSeries, linearly interpolated in time
    INSIDE the jitted step (reference: FieldTimeSeries used directly as
    forcing/BCs, refreshed by update_model_field_time_series! —
    src/Models/Models.jl:48; here the interpolation is a traced gather so no
    host refresh is needed). ``fts`` is an
    ``oceananigans_tpu.simulation.output_readers.FieldTimeSeries`` (or any
    object with a traceable ``traced(t) -> interior array``)."""

    def __init__(self, fts, loc=None):
        self.fts = fts
        self.loc = tuple(loc) if loc is not None else None

    def bind(self, name, loc=None, locs=None):
        if self.loc is None and loc is not None:
            self.loc = tuple(loc)
        return self

    def __call__(self, grid, fields, time):
        from ..fields.field import set_on_padded
        return set_on_padded(grid, self.loc or LOC_CCC,
                             self.fts.traced(time))


class _FieldForcing(Forcing):
    """A Field used directly as a forcing array (reference:
    test_forcings.jl time_step_with_forcing_array — forcing=(u=XFaceField,
    ...)); re-embedded when the model inflated halos after the field was
    built."""

    def __init__(self, field):
        self.field = field

    def bind(self, name, loc=None, locs=None):
        return self

    def __call__(self, grid, fields, time):
        f = self.field
        if tuple(jnp.shape(f.data)) != tuple(grid.padded_shape):
            from ..fields.field import set_on_padded
            return set_on_padded(grid, f.loc, jnp.asarray(f.interior))
        return f.data


def regularize_forcing(forcing):
    """Normalize a per-field ``forcing=`` dict: tuples/lists of forcings
    collapse into :class:`MultipleForcings`; bare Fields become constant
    forcing arrays (reference: model_forcing.jl — `Forcing` tuples are
    summed, fields/arrays pass through)."""
    out = {}
    for name, F in dict(forcing or {}).items():
        if isinstance(F, (tuple, list)):
            F = MultipleForcings(*F)
        if hasattr(F, "interior") and hasattr(F, "loc"):
            F = _FieldForcing(F)
        out[name] = F
    return out


class MultipleForcings(Forcing):
    """Sum of forcings (reference: multiple_forcings.jl)."""

    def __init__(self, *forcings):
        self.forcings = forcings

    def bind(self, name, loc=None, locs=None):
        for f in self.forcings:
            if hasattr(f, "bind"):
                f.bind(name, loc, locs=locs)
        return self

    def __call__(self, grid, fields, time):
        return sum(f(grid, fields, time) for f in self.forcings)
