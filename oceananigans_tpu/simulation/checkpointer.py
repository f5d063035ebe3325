"""Checkpoint / resume.

Reference semantics: src/OutputWriters/checkpointer.jl:10-97 — snapshot the
grid spec, clock, prognostic fields AND (for AB2) the previous tendencies G⁻
(needed for restart continuity), with `run!(sim, pickup=true)` restoring the
latest checkpoint (src/Simulations/run.jl:59-97).

Format: one ``checkpoint_iteration{N}.npz`` per snapshot containing the whole
state pytree flattened to named arrays."""

from __future__ import annotations

import glob
import os
import re

import jax.numpy as jnp
import numpy as np

from ..utils.schedules import IterationInterval


def _flatten_state(state, prefix=""):
    out = {}
    for k, v in state.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_state(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_state(arrays):
    out = {}
    for key, v in arrays.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


class Checkpointer:
    def __init__(self, model, schedule=None, dir=".", prefix="checkpoint",
                 keep=None):
        self.model = model
        self.schedule = schedule or IterationInterval(1000)
        self.dir = dir
        self.prefix = prefix
        self.keep = keep
        os.makedirs(dir, exist_ok=True)

    def path(self, iteration):
        return os.path.join(self.dir, f"{self.prefix}_iteration{iteration}.npz")

    def write(self, sim):
        model = sim.model
        arrays = _flatten_state(model.state)
        # grid spec alongside the state (reference: checkpointer.jl
        # serializes the grid; Grids.constructor_arguments +
        # test_grid_reconstruction.jl) — best-effort: exotic grid classes
        # without a spec still checkpoint their arrays
        try:
            import json
            from ..grids.reconstruction import constructor_arguments
            arrays["__grid_spec__"] = np.frombuffer(
                json.dumps(constructor_arguments(model.grid)).encode(),
                dtype=np.uint8)
        except NotImplementedError:
            pass
        np.savez(self.path(model.iteration), **arrays)
        if self.keep:
            files = sorted(glob.glob(os.path.join(
                self.dir, f"{self.prefix}_iteration*.npz")),
                key=_iteration_of)
            for f in files[:-self.keep]:
                os.remove(f)

    def maybe_write(self, sim, force=False):
        if force:
            return  # no iteration-0 checkpoint by default
        if self.schedule(sim.model):
            self.write(sim)


def _iteration_of(path):
    m = re.search(r"iteration(\d+)\.npz$", path)
    return int(m.group(1)) if m else -1


def checkpoint_grid(path):
    """Rebuild the grid recorded in a checkpoint file (reference:
    reconstruct_grid, test_grid_reconstruction.jl). Returns None when the
    checkpoint predates grid recording or the grid class has no spec."""
    import json
    from ..grids.reconstruction import reconstruct_grid
    with np.load(path) as data:
        if "__grid_spec__" not in data.files:
            return None
        spec = json.loads(bytes(data["__grid_spec__"]).decode())
    return reconstruct_grid(spec)


def restore(model, path):
    """Restore a model's state pytree from a checkpoint file (reference:
    set!(model, path), src/Models/set_model.jl)."""
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files
                  if not k.startswith("__")}
    state = _unflatten_state(arrays)
    # merge: keep any state entries the checkpoint lacks
    merged = dict(model.state)
    for k, v in state.items():
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k] = {**merged[k], **v}
        else:
            merged[k] = v
    model.state = merged
    return model


def restore_latest(model, pickup, checkpointers=()):
    """pickup=True → newest checkpoint written by a registered Checkpointer
    (its dir/prefix; previously only cwd with the default prefix was
    searched, so Checkpointer(dir=..., prefix=...) + run(pickup=True)
    raised FileNotFoundError — round-5 review finding), falling back to the
    default pattern in cwd; pickup=<path> → that file."""
    if pickup is True:
        patterns = [os.path.join(cp.dir, f"{cp.prefix}_iteration*.npz")
                    for cp in checkpointers] or                    ["checkpoint_iteration*.npz"]
        files = []
        for pat in patterns:
            files.extend(glob.glob(pat))
        files = sorted(files, key=_iteration_of)
        if not files:
            raise FileNotFoundError(
                f"no checkpoint files found for pickup ({patterns})")
        path = files[-1]
    else:
        path = pickup
    return restore(model, path)
