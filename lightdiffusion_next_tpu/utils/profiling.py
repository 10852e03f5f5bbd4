"""Tracing / profiling / observability.

The reference has none of this (SURVEY §5: tqdm bars and print statements).
TPU-native equivalents:
- ``trace(...)``: jax.profiler trace context around a sampler run (xprof
  -compatible output dir).
- ``compile_log``: log when a new (fn, shape-signature) compiles — the
  observable the reference's Stable-Fast "Tracing..." message provided.
- ``ProgressBar``: the util.ProgressBar analog used by tiled loops.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from typing import Optional

logger = logging.getLogger("ldt")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

PROGRESS_BAR_ENABLED = True


def set_progress_bar_enabled(enabled: bool) -> None:
    """util.PROGRESS_BAR_ENABLED parity (util.py:371)."""
    global PROGRESS_BAR_ENABLED
    PROGRESS_BAR_ENABLED = enabled


class ProgressBar:
    """Minimal it/s progress bar (util.ProgressBar parity, util.py:375-383).
    Reports the reference's README benchmark metric (iterations/second)."""

    def __init__(self, total: int, desc: str = "", stream=sys.stderr):
        self.total = total
        self.current = 0
        self.desc = desc
        self.start = time.perf_counter()
        self.stream = stream

    def update(self, n: int = 1) -> None:
        self.current += n
        if not PROGRESS_BAR_ENABLED:
            return
        dt = time.perf_counter() - self.start
        rate = self.current / dt if dt > 0 else 0.0
        self.stream.write(
            f"\r{self.desc} {self.current}/{self.total} [{rate:.2f} it/s]"
        )
        if self.current >= self.total:
            self.stream.write("\n")
        self.stream.flush()

    def update_absolute(self, value: int) -> None:
        self.update(value - self.current)

    @property
    def it_per_s(self) -> float:
        dt = time.perf_counter() - self.start
        return self.current / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def timed(label: str):
    t0 = time.perf_counter()
    yield
    logger.info("%s: %.3fs", label, time.perf_counter() - t0)


def device_memory_stats() -> dict:
    """HBM stats for the UI memory panel (Device.get_free_memory analog)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return stats


def compile_log(enabled: bool = True) -> None:
    """Log every XLA compile (function name + shape signature) — the
    observable the reference's Stable-Fast "Tracing..." message provided
    (StableFast.py:143-196). Off by default; flip on to diagnose retrace
    storms (e.g. an identity-unstable jit cache key)."""
    import jax

    jax.config.update("jax_log_compiles", bool(enabled))
