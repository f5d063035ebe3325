"""Reference free-function API surface.

src/Oceananigans.jl exports a flat list of query/driver FUNCTIONS alongside
the types (nodes, xnodes, …, xspacing, volume, interior, compute!, set!,
time_step!, run!, iteration and the stop criteria). Grids and fields here
expose the same capabilities as METHODS; this module provides the free-
function spellings so reference scripts port mechanically:

    using Oceananigans              ->  from oceananigans_tpu import *
    xnodes(grid, Center())          ->  xnodes(grid, "c")
    interior(u)                     ->  interior(u)
    time_step!(model, 60)           ->  time_step(model, 60)

Pointwise metric queries (xspacing/…/volume) take a location tuple like
("c", "c", "f") — the analogue of the reference's (Center, Center, Face)
arguments (src/Operators/spacings_and_areas_and_volumes.jl)."""

from __future__ import annotations

import jax.numpy as jnp

from .grids.topology import LOC_CCC

__all__ = [
    "nodes", "xnodes", "ynodes", "znodes", "rnodes", "lambda_nodes",
    "phi_nodes", "xspacings", "yspacings", "zspacings", "rspacings",
    "lambda_spacings", "phi_spacings", "lambda_spacing", "phi_spacing",
    "minimum_xspacing", "minimum_yspacing", "minimum_zspacing",
    "xspacing", "yspacing", "zspacing", "xarea", "yarea", "zarea", "volume",
    "interior", "compute", "set", "time_step", "run", "iteration",
    "iteration_limit_exceeded", "stop_time_exceeded",
    "wall_time_limit_exceeded",
]


def _grid_of(x):
    return getattr(x, "grid", x)


def _loc_of(x, default=LOC_CCC):
    return getattr(x, "loc", default)


# -- node queries (reference: src/Grids/nodes_and_spacings.jl) ---------------

def nodes(grid_or_field, loc=None):
    g = _grid_of(grid_or_field)
    return g.nodes(loc or _loc_of(grid_or_field))


def xnodes(grid_or_field, loc="c"):
    return _grid_of(grid_or_field).xnodes(loc)


def ynodes(grid_or_field, loc="c"):
    return _grid_of(grid_or_field).ynodes(loc)


def znodes(grid_or_field, loc="c"):
    return _grid_of(grid_or_field).znodes(loc)


# r = the grid-native vertical coordinate; identical to z on the static
# grids here (z-star models scale at evaluation time)
rnodes = znodes


def lambda_nodes(grid_or_field, loc="c"):
    return _grid_of(grid_or_field).lambda_nodes(loc)


def phi_nodes(grid_or_field, loc="c"):
    return _grid_of(grid_or_field).phi_nodes(loc)


# -- spacing queries ----------------------------------------------------------

def xspacings(grid_or_field, loc=LOC_CCC):
    """Per-cell x spacing (scalar on regular axes, 1D array on stretched)."""
    return _grid_of(grid_or_field).dx(loc)


def yspacings(grid_or_field, loc=LOC_CCC):
    return _grid_of(grid_or_field).dy(loc)


def zspacings(grid_or_field, loc=LOC_CCC):
    return _grid_of(grid_or_field).dz(loc)


rspacings = zspacings


def lambda_spacings(grid_or_field, loc="c"):
    """Angular longitude spacings in degrees on curvilinear grids
    (reference export λspacings, src/Grids/nodes_and_spacings.jl)."""
    return _grid_of(grid_or_field).lambda_spacings(loc)


def phi_spacings(grid_or_field, loc="c"):
    """Angular latitude spacings in degrees (reference export φspacings)."""
    return _grid_of(grid_or_field).phi_spacings(loc)


lambda_spacing = lambda_spacings
phi_spacing = phi_spacings


def minimum_xspacing(grid_or_field):
    return _grid_of(grid_or_field).minimum_xspacing()


def minimum_yspacing(grid_or_field):
    return _grid_of(grid_or_field).minimum_yspacing()


def minimum_zspacing(grid_or_field):
    return _grid_of(grid_or_field).minimum_zspacing()


# -- pointwise metric operators (reference exports xspacing, …, volume as
# i,j,k-functions; whole-array semantics here) --------------------------------

def xspacing(grid, loc=LOC_CCC):
    return grid.dx(loc)


def yspacing(grid, loc=LOC_CCC):
    return grid.dy(loc)


def zspacing(grid, loc=LOC_CCC):
    return grid.dz(loc)


def xarea(grid, loc=LOC_CCC):
    return grid.Ax(loc)


def yarea(grid, loc=LOC_CCC):
    return grid.Ay(loc)


def zarea(grid, loc=LOC_CCC):
    return grid.Az(loc)


def volume(grid, loc=LOC_CCC):
    return grid.V(loc)


# -- field / operation helpers -------------------------------------------------

def interior(field_or_op):
    """The interior view (reference: interior(f))."""
    return field_or_op.interior


def compute(op):
    """Materialize a lazy operation / computed field (reference: compute!)."""
    return op.compute()


# -- drivers (reference: time_step!, run!, iteration + stop criteria) ---------

def set(obj, *args, **kw):
    """Free-function spelling of ``obj.set`` (reference: set!(model; u=...),
    set!(field, value)) — dispatches to the model/field method."""
    return obj.set(*args, **kw)


def time_step(model, dt):
    """Advance a model one step in place (reference: time_step!(model, Δt))."""
    model.time_step(dt)
    return model


def run(simulation, **kw):
    """reference: run!(sim)."""
    return simulation.run(**kw)


def iteration(model_or_sim):
    m = getattr(model_or_sim, "model", model_or_sim)
    return m.iteration


def iteration_limit_exceeded(sim):
    return (sim.stop_iteration is not None
            and sim.model.iteration >= sim.stop_iteration)


def stop_time_exceeded(sim):
    return (sim.stop_time is not None
            and sim.model.time >= sim.stop_time)


def wall_time_limit_exceeded(sim):
    return (sim.wall_time_limit is not None
            and sim.run_wall_time >= sim.wall_time_limit)
