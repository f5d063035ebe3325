"""Grid serialization/reconstruction.

Reference semantics: src/Grids — ``constructor_arguments(grid)`` returns the
(args, kwargs) that rebuild a grid, and the NetCDF writer's
``reconstruct_grid`` path round-trips a grid through serialized metadata
(test/test_grid_reconstruction.jl). Used here by the Checkpointer so a
checkpoint records the full grid spec alongside the state arrays."""

from __future__ import annotations

import numpy as np

from . import topology as topo


def _coord_spec(grid, axis):
    c = grid._coords[axis]
    if grid.topology[axis] == topo.FLAT:
        return None
    if c.regular:
        h, n = c.H, c.N
        return {"interval": [float(c.xF[h]), float(c.xF[h + n])]}
    h, n = c.H, c.N
    return {"faces": [float(v) for v in c.xF[h:h + n + 1]]}


def constructor_arguments(grid):
    """JSON-able spec that :func:`reconstruct_grid` rebuilds the grid from
    (reference: Grids.constructor_arguments). Supports RectilinearGrid and
    LatitudeLongitudeGrid; raises for other grid classes."""
    from .latlon import LatitudeLongitudeGrid
    from .rectilinear import RectilinearGrid

    if type(grid) not in (RectilinearGrid, LatitudeLongitudeGrid):
        raise NotImplementedError(
            f"constructor_arguments not implemented for {type(grid).__name__}")
    base = {
        "size": [int(n) for n in grid.N],
        "halo": [int(h) for h in grid.H],
        "topology": [str(t) for t in grid.topology],
        "dtype": np.dtype(grid.dtype).name,
    }
    if type(grid) is RectilinearGrid:
        return dict(base, type="RectilinearGrid",
                    x=_coord_spec(grid, 0), y=_coord_spec(grid, 1),
                    z=_coord_spec(grid, 2))
    if type(grid) is LatitudeLongitudeGrid:
        return dict(base, type="LatitudeLongitudeGrid",
                    radius=float(grid.radius),
                    longitude=_coord_spec(grid, 0),
                    latitude=_coord_spec(grid, 1),
                    z=_coord_spec(grid, 2))
    raise NotImplementedError(
        f"constructor_arguments not implemented for {type(grid).__name__}")


def _coord_arg(spec):
    if spec is None:
        return None
    if "interval" in spec:
        return tuple(spec["interval"])
    return np.asarray(spec["faces"], float)


def reconstruct_grid(spec):
    """Rebuild a grid from :func:`constructor_arguments` output."""
    from .latlon import LatitudeLongitudeGrid
    from .rectilinear import RectilinearGrid

    kind = spec["type"]
    common = dict(size=tuple(spec["size"]), halo=tuple(spec["halo"]),
                  topology=tuple(spec["topology"]),
                  dtype=np.dtype(spec["dtype"]))
    if kind == "RectilinearGrid":
        return RectilinearGrid(x=_coord_arg(spec["x"]),
                               y=_coord_arg(spec["y"]),
                               z=_coord_arg(spec["z"]), **common)
    if kind == "LatitudeLongitudeGrid":
        return LatitudeLongitudeGrid(longitude=_coord_arg(spec["longitude"]),
                                     latitude=_coord_arg(spec["latitude"]),
                                     z=_coord_arg(spec["z"]),
                                     radius=spec["radius"], **common)
    raise ValueError(f"unknown grid type {kind!r}")
