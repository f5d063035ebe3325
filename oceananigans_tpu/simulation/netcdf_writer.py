"""NetCDF output writer.

Reference semantics: src/OutputWriters/netcdf_writer.jl (stub) + the full
implementation in ext/OceananigansNCDatasetsExt.jl (1,511 LoC): scheduled
NetCDF output of fields with coordinate variables and an unlimited time
dimension.

Here: a NetCDF-3 (classic) writer via scipy.io.netcdf_file — dependency-free
in this environment. Each output gets dimensions (time, x, y, z) with the
grid's node coordinates attached."""

from __future__ import annotations

import numpy as np

from ..utils.schedules import IterationInterval
from .output_writers import fetch_output

try:
    from scipy.io import netcdf_file
    HAVE_NETCDF = True
except Exception:  # pragma: no cover
    HAVE_NETCDF = False


class NetCDFWriter:
    def __init__(self, model, outputs, filename, schedule=None,
                 overwrite_existing=True):
        if not HAVE_NETCDF:
            raise ImportError("scipy is required for NetCDFWriter")
        self.model = model
        self.outputs = dict(outputs)
        self.filename = filename
        self.schedule = schedule or IterationInterval(1)
        self._n = 0
        self._f = netcdf_file(filename, "w", version=2)
        f = self._f
        f.createDimension("time", None)
        grid = model.grid
        self._time = f.createVariable("time", "d", ("time",))
        self._vars = {}
        self._dims_cache = {}

        def dim_for(axis, size, loc):
            # staggering is part of the key: face- and center-located
            # outputs share the interior SIZE but not the coordinates
            # (round-5 review — the cache collided on (axis, size) and
            # attached one staggering's coordinates to the other's data)
            key = (axis, size, loc)
            if key in self._dims_cache:
                return self._dims_cache[key]
            name = f"{'xyz'[axis]}_{loc}{size}"
            f.createDimension(name, size)
            var = f.createVariable(name, "d", (name,))
            try:
                var[:] = np.asarray(grid.nodes1d(axis, loc))[:size]
            except Exception:
                var[:] = np.arange(size, dtype=float)
            self._dims_cache[key] = name
            return name

        for name, spec in self.outputs.items():
            sample = fetch_output(self._resolve(spec), model)
            dims = ("time",)
            for axis, size in enumerate(sample.shape):
                loc = "c"
                fld = getattr(spec, "loc", None)
                if isinstance(spec, str):
                    fld = model.loc(spec)
                if fld is not None:
                    loc = fld[axis]
                dims = dims + (dim_for(axis, size, loc),)
            self._vars[name] = f.createVariable(name, "f", dims)

    def _resolve(self, spec):
        if isinstance(spec, str):
            return self.model.field(spec)
        return spec

    def write(self, sim):
        model = sim.model
        i = self._n
        self._time[i] = model.time
        for name, spec in self.outputs.items():
            arr = fetch_output(self._resolve(spec), model)
            self._vars[name][i] = arr.astype(np.float32)
        self._n += 1
        self._f.flush()

    def maybe_write(self, sim, force=False):
        if force or self.schedule(sim.model):
            self.write(sim)

    def close(self):
        self._f.close()
