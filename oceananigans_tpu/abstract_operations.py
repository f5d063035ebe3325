"""AbstractOperations: lazy expression trees over Fields for diagnostics.

Reference semantics: src/AbstractOperations/ — Unary/Binary/Multiary
operations with automatic location matching (AbstractOperations.jl:41-95,
binary_operations.jl), `Derivative` (derivatives.jl), `@at` relocation
(at.jl), `KernelFunctionOperation` (kernel_function_operation.jl),
`ConditionalOperation` (conditional_operations.jl), metric reductions
`Average`/`Integral`/`CumulativeIntegral` (metric_field_reductions.jl:65-206)
and `Field(op)`+`compute!` materialization (computed_field.jl).

TPU-first: an operation is just a deferred, traceable function of padded
arrays — `compute()` evaluates the whole tree as one fused XLA program. The
layer exists purely for API parity; inside jitted model code you write plain
jnp expressions."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fields import Field
from .grids.topology import CENTER, FACE, LOC_CCC
from .operators.operators import ddx, ddy, ddz, interp_to


class AbstractOperation:
    """Lazy node: has .grid, .loc; .materialize() returns a padded array."""

    grid = None
    loc = LOC_CCC

    def materialize(self):
        raise NotImplementedError

    # -- algebra --------------------------------------------------------------

    def __add__(self, other):
        return BinaryOperation(jnp.add, self, other)

    __radd__ = __add__

    def __sub__(self, other):
        return BinaryOperation(jnp.subtract, self, other)

    def __rsub__(self, other):
        return BinaryOperation(jnp.subtract, other, self)

    def __mul__(self, other):
        return BinaryOperation(jnp.multiply, self, other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return BinaryOperation(jnp.divide, self, other)

    def __rtruediv__(self, other):
        return BinaryOperation(jnp.divide, other, self)

    def __pow__(self, other):
        return BinaryOperation(jnp.power, self, other)

    def __neg__(self):
        return UnaryOperation(jnp.negative, self)

    # -- evaluation -----------------------------------------------------------

    def compute(self):
        """Materialize into a Field (reference: Field(op) + compute!)."""
        data = self.materialize()
        return Field(self.grid, self.loc, None, data)

    @property
    def interior(self):
        return self.compute().interior


def _wrap(x):
    if isinstance(x, (AbstractOperation, Field)):
        return x
    return x  # scalar / array


def _materialize(x, grid, loc):
    if isinstance(x, AbstractOperation):
        a = x.materialize()
        src_loc = x.loc
    elif isinstance(x, Field):
        a = x.data
        src_loc = x.loc
    else:
        return x
    if src_loc != loc:
        a = interp_to(grid, a, src_loc, loc)
    return a


def _grid_loc_of(*xs):
    for x in xs:
        if isinstance(x, (AbstractOperation, Field)):
            return x.grid, x.loc
    raise ValueError("no field operand")


class UnaryOperation(AbstractOperation):
    def __init__(self, op, a, loc=None):
        self.op = op
        self.a = a
        self.grid, aloc = _grid_loc_of(a)
        self.loc = loc or aloc

    def materialize(self):
        return self.op(_materialize(self.a, self.grid, self.loc))


class BinaryOperation(AbstractOperation):
    """Locations are matched by interpolating the second operand to the
    first's location (reference: binary operation location inference)."""

    def __init__(self, op, a, b, loc=None):
        self.op = op
        self.a, self.b = a, b
        self.grid, aloc = _grid_loc_of(a, b)
        self.loc = loc or aloc

    def materialize(self):
        return self.op(_materialize(self.a, self.grid, self.loc),
                       _materialize(self.b, self.grid, self.loc))


class MultiaryOperation(AbstractOperation):
    def __init__(self, op, *args, loc=None):
        self.op = op
        self.args = args
        self.grid, aloc = _grid_loc_of(*args)
        self.loc = loc or aloc

    def materialize(self):
        return self.op(*[_materialize(a, self.grid, self.loc)
                         for a in self.args])


class Derivative(AbstractOperation):
    def __init__(self, a, axis):
        self.a = a
        self.axis = axis
        self.grid, aloc = _grid_loc_of(a)
        loc = list(aloc)
        loc[axis] = FACE if aloc[axis] == CENTER else CENTER
        self.loc = tuple(loc)

    def materialize(self):
        src = (self.a.materialize() if isinstance(self.a, AbstractOperation)
               else self.a.data)
        dd = (ddx, ddy, ddz)[self.axis]
        return dd(self.grid, src, self.loc)


def partial_x(a):
    return Derivative(a, 0)


def partial_y(a):
    return Derivative(a, 1)


def partial_z(a):
    return Derivative(a, 2)


def at(loc, a):
    """Relocate an expression (reference: @at macro, at.jl)."""
    grid, _ = _grid_loc_of(a)
    return UnaryOperation(lambda x: x, a, loc=tuple(loc))


class KernelFunctionOperation(AbstractOperation):
    """Wrap any traceable func(grid, *args) -> padded array (reference:
    kernel_function_operation.jl — func(i, j, k, grid, args...) becomes a
    whole-array function)."""

    def __init__(self, func, grid, *args, loc=LOC_CCC):
        self.func = func
        self.grid = grid
        self.args = args
        self.loc = tuple(loc)

    def materialize(self):
        args = [a.data if isinstance(a, Field)
                else (a.materialize() if isinstance(a, AbstractOperation)
                      else a)
                for a in self.args]
        return self.func(self.grid, *args)


class ConditionalOperation(AbstractOperation):
    """Mask an operand where a condition fails (reference:
    conditional_operations.jl; used by conditional reductions)."""

    def __init__(self, a, condition, mask_value=0.0):
        self.a = a
        self.condition = condition
        self.mask_value = mask_value
        self.grid, self.loc = _grid_loc_of(a)

    def materialize(self):
        data = _materialize(self.a, self.grid, self.loc)
        cond = (self.condition.materialize()
                if isinstance(self.condition, AbstractOperation)
                else (self.condition.data
                      if isinstance(self.condition, Field)
                      else self.condition))
        return jnp.where(cond, data, self.mask_value)


# -- metric reductions ---------------------------------------------------------

def _interior_and_weights(op_or_field, dims):
    if isinstance(op_or_field, Field):
        grid, loc, data = op_or_field.grid, op_or_field.loc, op_or_field.data
    else:
        grid, loc = op_or_field.grid, op_or_field.loc
        data = op_or_field.materialize()
    V = grid.V(loc)
    w = jnp.broadcast_to(jnp.asarray(V, data.dtype), data.shape)
    ii = grid.interior_slices
    return data[ii], w[ii], grid, loc


class Average(AbstractOperation):
    """Volume-weighted mean over ``dims`` (reference:
    metric_field_reductions.jl:65)."""

    def __init__(self, a, dims=(0, 1, 2)):
        self.a = a
        self.dims = tuple(dims) if np.iterable(dims) else (dims,)
        self.grid, self.loc = _grid_loc_of(a)

    def materialize(self):
        data, w, grid, loc = _interior_and_weights(self.a, self.dims)
        num = jnp.sum(data * w, axis=self.dims, keepdims=True)
        den = jnp.sum(w, axis=self.dims, keepdims=True)
        return num / den

    def compute(self):
        return self.materialize()

    @property
    def interior(self):
        return self.materialize()


class Integral(Average):
    """Volume-weighted integral (reference: metric_field_reductions.jl:144)."""

    def materialize(self):
        data, w, grid, loc = _interior_and_weights(self.a, self.dims)
        return jnp.sum(data * w, axis=self.dims, keepdims=True)


_REDUCERS = dict(sum=jnp.sum, mean=jnp.mean, maximum=jnp.max,
                 minimum=jnp.min, prod=jnp.prod)
_ACCUMULATORS = dict(cumsum=jnp.cumsum, cumprod=jnp.cumprod,
                     cummax=jax.lax.cummax, cummin=jax.lax.cummin)


class Reduction(AbstractOperation):
    """Generic (unweighted) reduction over ``dims`` (reference:
    src/Fields/scans.jl Reduction(op!, operand; dims) — e.g.
    ``Reduction("maximum", op, dims=2)``; Average/Integral are the
    metric-weighted counterparts). ``op`` is a name from sum/mean/maximum/
    minimum/prod or a jnp-style callable taking (array, axis=...)."""

    def __init__(self, op, a, dims=(0, 1, 2)):
        self.op = _REDUCERS[op] if isinstance(op, str) else op
        self.a = a
        self.dims = tuple(dims) if np.iterable(dims) else (dims,)
        self.grid, self.loc = _grid_loc_of(a)

    def materialize(self):
        data, _, grid, loc = _interior_and_weights(self.a, self.dims)
        return self.op(data, axis=self.dims, keepdims=True)

    def compute(self):
        return self.materialize()

    @property
    def interior(self):
        return self.materialize()


class Accumulation(AbstractOperation):
    """Generic accumulating scan along one dimension (reference:
    src/Fields/scans.jl Accumulation(op!, operand; dims) — e.g.
    ``Accumulation("cumsum", op, dims=2)``; CumulativeIntegral is the
    metric-weighted counterpart)."""

    def __init__(self, op, a, dims=2):
        self.op = _ACCUMULATORS[op] if isinstance(op, str) else op
        self.a = a
        self.dim = int(dims)
        self.grid, self.loc = _grid_loc_of(a)

    def materialize(self):
        data, _, grid, loc = _interior_and_weights(self.a, (self.dim,))
        return self.op(data, axis=self.dim)

    def compute(self):
        return self.materialize()

    @property
    def interior(self):
        return self.materialize()


class CumulativeIntegral(AbstractOperation):
    """∫ along one dimension, cumulative (reference:
    metric_field_reductions.jl:206)."""

    def __init__(self, a, dims=2):
        self.a = a
        self.dim = int(dims)
        self.grid, self.loc = _grid_loc_of(a)

    def materialize(self):
        data, w, grid, loc = _interior_and_weights(self.a, (self.dim,))
        return jnp.cumsum(data * w, axis=self.dim)

    def compute(self):
        return self.materialize()


# -- Field operator overloads (reference: fields participate in the operation
# algebra; broadcasting_abstract_fields.jl) --

def _field_binop(op):
    def method(self, other):
        return BinaryOperation(op, self, other)
    return method


def _field_rbinop(op):
    def method(self, other):
        return BinaryOperation(op, other, self)
    return method


Field.__add__ = _field_binop(jnp.add)
Field.__radd__ = _field_binop(jnp.add)
Field.__sub__ = _field_binop(jnp.subtract)
Field.__rsub__ = _field_rbinop(jnp.subtract)
Field.__mul__ = _field_binop(jnp.multiply)
Field.__rmul__ = _field_binop(jnp.multiply)
Field.__truediv__ = _field_binop(jnp.divide)
Field.__rtruediv__ = _field_rbinop(jnp.divide)
Field.__pow__ = _field_binop(jnp.power)
Field.__neg__ = lambda self: UnaryOperation(jnp.negative, self)


class ComputedField:
    """An operation materialized on demand with time-stamped caching
    (reference: src/AbstractOperations/computed_field.jl — ``Field(op)``
    whose ``compute!(f, t)`` is a no-op when ``f.status.time == t``).

    ``compute(time)`` re-evaluates only when ``time`` differs from the
    cached stamp, so several writers/diagnostics sharing one diagnostic at
    the same model time pay for a single evaluation. ``compute()`` with no
    argument always re-evaluates."""

    def __init__(self, op):
        self.op = op
        self.grid = op.grid
        self.loc = op.loc
        self._time = None
        self._cached = None

    def compute(self, time=None):
        if (time is None or self._cached is None
                or self._time is None or time != self._time):
            self._cached = self.op.compute()
            self._time = time
        return self._cached

    @property
    def interior(self):
        return self.compute().interior

    def __call__(self, model=None):
        # writer-protocol: fetch at the model's current time (cached)
        return self.compute(None if model is None else model.time)
