"""OutputReaders: FieldTimeSeries.

Reference semantics: src/OutputReaders/field_time_series.jl:34-70 — a time
series of field snapshots with `InMemory` (fully loaded) or `OnDisk` (lazy,
per-index load) backends, time indexing/interpolation, and use as
time-dependent boundary conditions / forcing
(update_model_field_time_series!, src/Models/Models.jl:48).

Reads the FieldWriter directory format (series.json + <name>_<iter>.npy)."""

from __future__ import annotations

import json
import os

import numpy as np


def InMemory():
    """Backend marker (reference: field_time_series.jl InMemory/OnDisk)."""
    return "in_memory"


def OnDisk():
    return "on_disk"


class FieldTimeSeries:
    """Time series of field snapshots read from a FieldWriter directory
    (series.json + npy) or a NetCDF4Writer ``.nc`` file (HDF5 via h5py —
    the time axis, variable data, coordinate dimension scales and
    attributes all round-trip; reference:
    FieldTimeSeries-from-NetCDF in the NCDatasets ext)."""

    def __init__(self, path, name, backend="in_memory"):
        if callable(backend):
            backend = backend()
        self.path = path
        self.name = name
        self.backend = backend
        self._cache = {}
        self.coordinates = None
        self.attributes = {}
        self._nc = None
        if os.path.isfile(path) and not path.endswith(".json"):
            self._init_netcdf(path, name, backend)
            return
        index = json.load(open(os.path.join(path, "series.json")))
        if name not in index["outputs"]:
            raise KeyError(f"{name!r} not among outputs {index['outputs']}")
        self.times = np.asarray(index["times"], float)
        self.iterations = list(index["iterations"])
        if backend == "in_memory":
            self._data = np.stack([self._load(i)
                                   for i in range(len(self.iterations))])
        else:
            self._data = None
        try:
            self.grid_meta = json.load(open(os.path.join(path, "grid.json")))
        except FileNotFoundError:
            self.grid_meta = None

    def _init_netcdf(self, path, name, backend):
        import h5py
        f = h5py.File(path, "r")
        if name not in f:
            avail = [k for k in f.keys() if k != "time"]
            f.close()
            raise KeyError(f"{name!r} not among outputs {avail}")
        self.times = np.asarray(f["time"][:], float)
        self.iterations = list(range(len(self.times)))
        var = f[name]
        self.attributes = {k: v for k, v in var.attrs.items()}
        # coordinate arrays from the attached dimension scales (axis 0 is
        # the time scale)
        coords = []
        for axis in range(1, var.ndim):
            scales = var.dims[axis]
            coords.append(np.asarray(scales[0][:], float)
                          if len(scales) else None)
        self.coordinates = coords
        self.grid_meta = {k: v for k, v in f.attrs.items()
                          if not k.startswith("_")}
        if backend == "in_memory":
            self._data = np.asarray(var[:])
            f.close()
        else:
            self._data = None
            self._nc = f         # lazy per-index reads hold the file open

    def _load(self, idx):
        if self._nc is not None:
            return np.asarray(self._nc[self.name][idx])
        it = self.iterations[idx]
        return np.load(os.path.join(self.path, f"{self.name}_{it}.npy"))

    def __len__(self):
        return len(self.iterations)

    def __getitem__(self, idx):
        """Snapshot by time index."""
        if self._data is not None:
            return self._data[idx]
        if idx not in self._cache:
            self._cache[idx] = self._load(idx)
        return self._cache[idx]

    def at_time(self, t):
        """Linear interpolation in time (reference: time indexing /
        interpolation of FieldTimeSeries)."""
        times = self.times
        if t <= times[0]:
            return self[0]
        if t >= times[-1]:
            return self[len(self) - 1]
        j = int(np.searchsorted(times, t))
        i = j - 1
        w = (t - times[i]) / (times[j] - times[i])
        return (1 - w) * self[i] + w * self[j]

    def __call__(self, t):
        return self.at_time(t)

    def traced(self, t):
        """Traceable linear-in-time interpolation — usable INSIDE the jitted
        step, so a FieldTimeSeries can drive time-dependent forcing and
        boundary conditions (the analogue of the reference's
        ``update_model_field_time_series!`` hook, src/Models/Models.jl:48;
        there the interpolant is refreshed host-side each step, here it is a
        traced gather). Requires the ``in_memory`` backend."""
        import jax.numpy as jnp

        if self._data is None:
            # one-time full load (OnDisk backend used inside jit)
            self._data = np.stack([self._load(i)
                                   for i in range(len(self.iterations))])
        data = jnp.asarray(self._data)
        times = jnp.asarray(self.times)
        nt = data.shape[0]
        if nt == 1:
            # a single snapshot: constant in time (the interpolation weight
            # below would be 0/0 — round-5 review finding)
            return jnp.take(data, 0, axis=0)
        t = jnp.clip(t, times[0], times[-1])
        j = jnp.clip(jnp.searchsorted(times, t), 1, nt - 1)
        i = j - 1
        ti = times[i]
        w = (t - ti) / (times[j] - ti)
        lo = jnp.take(data, i, axis=0)
        hi = jnp.take(data, j, axis=0)
        return (1 - w) * lo + w * hi


def written_names(path):
    """Output names recorded in a FieldWriter dataset or NetCDF4Writer file
    (reference: jld2_writer.jl written_names)."""
    import json as _json
    import os as _os
    if _os.path.isfile(path) and not path.endswith(".json"):
        import h5py
        with h5py.File(path, "r") as f:
            return [k for k in f
                    if f[k].attrs.get("CLASS") != b"DIMENSION_SCALE"]
    index = _json.load(open(_os.path.join(path, "series.json")))
    return list(index["outputs"])


class FieldDataset(dict):
    """All outputs of a FieldWriter dataset as {name: FieldTimeSeries}
    (reference: OutputReaders FieldDataset). Access by item or attribute."""

    def __init__(self, path, backend="in_memory"):
        super().__init__()
        for name in written_names(path):
            self[name] = FieldTimeSeries(path, name, backend=backend)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e
