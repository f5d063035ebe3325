"""Schedules controlling when callbacks / writers / diagnostics fire.

Reference semantics: src/Utils/schedules.jl — `TimeInterval` (:32-70),
`IterationInterval`, `WallTimeInterval`, `SpecifiedTimes`, `AndSchedule`/
`OrSchedule`. Schedules are host-side objects: they are consulted between
jitted steps and never traced."""

from __future__ import annotations

import time as _time

import numpy as np


class Schedule:
    def initialize(self, model):
        return None

    def aligned_time_step(self, model, dt):
        """Optionally shrink dt so the next actuation lands exactly."""
        return dt

    def __and__(self, other):
        return AndSchedule(self, other)

    def __or__(self, other):
        return OrSchedule(self, other)


class TimeInterval(Schedule):
    """Actuates every ``interval`` of model time (a number of seconds or a
    datetime.timedelta / np.timedelta64 — reference: schedules.jl +
    DateTime clocks, clock.jl)."""

    def __init__(self, interval):
        from .dateclock import interval_seconds
        self.interval = interval_seconds(interval)
        self.previous_actuation_time = None

    def initialize(self, model):
        self.previous_actuation_time = model.time

    def __call__(self, model):
        t = model.time
        if self.previous_actuation_time is None:
            self.previous_actuation_time = t
            return True
        if t >= self.previous_actuation_time + self.interval - 1e-12:
            # align to the schedule grid like the reference (schedules.jl)
            n = round((t - self.previous_actuation_time) / self.interval)
            self.previous_actuation_time += max(n, 1) * self.interval
            return True
        return False

    def aligned_time_step(self, model, dt):
        if self.previous_actuation_time is None:
            return dt
        next_t = self.previous_actuation_time + self.interval
        return min(dt, max(next_t - model.time, 1e-12))


class IterationInterval(Schedule):
    def __init__(self, interval, offset=0):
        self.interval = int(interval)
        self.offset = offset

    def __call__(self, model):
        return (model.iteration + self.offset) % self.interval == 0


class WallTimeInterval(Schedule):
    def __init__(self, interval):
        self.interval = float(interval)
        self.previous = _time.monotonic()

    def __call__(self, model):
        now = _time.monotonic()
        if now - self.previous >= self.interval:
            self.previous = now
            return True
        return False


class SpecifiedTimes(Schedule):
    """Actuates at the given model times — numbers of seconds, or datetimes
    when the model carries a ``reference_datetime``."""

    def __init__(self, *times):
        from .dateclock import is_datetime
        if len(times) == 1 and np.iterable(times[0]) \
                and not is_datetime(times[0]):
            times = tuple(times[0])
        self._raw = times
        self.times = None
        self._next = 0

    def _resolve(self, model):
        if self.times is None:
            from .dateclock import seconds_since
            ref = getattr(model, "reference_datetime", None)
            self.times = sorted(seconds_since(t, ref) for t in self._raw)
        return self.times

    def __call__(self, model):
        times = self._resolve(model)
        if self._next >= len(times):
            return False
        if model.time >= times[self._next] - 1e-12:
            self._next += 1
            return True
        return False

    def aligned_time_step(self, model, dt):
        times = self._resolve(model)
        if self._next >= len(times):
            return dt
        return min(dt, max(times[self._next] - model.time, 1e-12))


class FileSizeLimit(Schedule):
    """Actuates when the file at ``path`` reaches ``size_limit`` bytes
    (reference: src/OutputWriters/output_writer_utils.jl:21-50 — the writer
    sets/updates ``path``; also accepted as a writer's ``file_splitting``)."""

    def __init__(self, size_limit, path=""):
        self.size_limit = float(size_limit)
        self.path = path

    def __call__(self, model):
        import os
        return (bool(self.path) and os.path.exists(self.path)
                and os.path.getsize(self.path) >= self.size_limit)


class AndSchedule(Schedule):
    def __init__(self, *schedules):
        self.schedules = schedules

    def initialize(self, model):
        for s in self.schedules:
            s.initialize(model)

    def __call__(self, model):
        return all(s(model) for s in self.schedules)


class OrSchedule(Schedule):
    def __init__(self, *schedules):
        self.schedules = schedules

    def initialize(self, model):
        for s in self.schedules:
            s.initialize(model)

    def __call__(self, model):
        return any(s(model) for s in self.schedules)

    def aligned_time_step(self, model, dt):
        return min(s.aligned_time_step(model, dt) for s in self.schedules)
