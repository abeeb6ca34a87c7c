"""Tracing/profiling + debug aids.

Reference status: ABSENT (the reference at most logs epoch wall-clock,
SURVEY.md §5.1/§5.2). TPU-native equivalents:
  * ``trace(logdir)`` — jax.profiler trace context (view in
    Perfetto/XProf; includes Pallas/Mosaic kernel timelines);
  * ``StepTimer`` — steady-state step-time / images-per-sec meters with
    warm-up skipping, used by the engine and bench;
  * ``debug_mode()`` — enables jax nan-debugging (the functional
    analogue of sanitizers: there are no data races to detect in a
    pure-functional program, SURVEY.md §5.2);
  * ``hard_sync(x)`` — force real completion of a device computation.
    Through the axon relay ``block_until_ready`` can return before
    execution finishes (observed; see bench.py methodology), so timing
    code must sync through a scalar fetch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; open the result with XProf/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode():
    """NaN checking on every jitted computation (debug builds only —
    disables some fusions)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def hard_sync(x) -> float:
    """Force completion of a device value; returns a checksum scalar."""
    leaves = jax.tree_util.tree_leaves(x)
    s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(s)


class StepTimer:
    """Steady-state step timing with warm-up skipping.

    >>> t = StepTimer(warmup=2)
    >>> for batch in loader:
    ...     with t.step(n_items=batch_size):
    ...         out = train_step(...)
    ...         hard_sync(out)
    >>> t.steps_per_sec, t.items_per_sec
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._seen = 0
        self._time = 0.0
        self._items = 0
        self._steps = 0

    @contextlib.contextmanager
    def step(self, n_items: int = 1):
        t0 = time.time()
        yield
        dt = time.time() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self._time += dt
            self._items += n_items
            self._steps += 1

    @property
    def steps_per_sec(self) -> Optional[float]:
        return self._steps / self._time if self._time > 0 else None

    @property
    def items_per_sec(self) -> Optional[float]:
        return self._items / self._time if self._time > 0 else None

    @property
    def sec_per_step(self) -> Optional[float]:
        return self._time / self._steps if self._steps else None
