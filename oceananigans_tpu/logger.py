"""Logging (reference: src/Logger.jl — OceananigansLogger with timestamped
levels)."""

from __future__ import annotations

import logging
import sys


class _Formatter(logging.Formatter):
    def format(self, record):
        record.shortlevel = record.levelname[0]
        return super().format(record)


def setup_logger(level=logging.INFO, stream=None):
    """Install a timestamped logger (the OceananigansLogger analogue)."""
    logger = logging.getLogger("oceananigans_tpu")
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler(stream or sys.stderr)
        h.setFormatter(_Formatter(
            "[%(asctime)s] %(shortlevel)s %(name)s: %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(h)
    return logger


logger = setup_logger()
