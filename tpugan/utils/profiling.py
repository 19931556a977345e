"""Tracing / profiling — the observability layer.

The reference has no profiler beyond wall-clock prints; on TPU the XLA stack
gives us much better tools, wrapped here:

- ``trace(out_dir)``: context manager around ``jax.profiler`` producing
  XProf/Perfetto traces viewable in TensorBoard's profile plugin.
- ``cost_analysis(fn, *args)``: per-compilation FLOPs / bytes-accessed
  estimates straight from the compiled HLO — used to sanity-check kernel
  efficiency against the device's peak (see BASELINE.md plausibility math).
- ``Throughput``: the north-star images/sec/chip meter used by the Trainer.
- ``device_memory_stats()``: live HBM usage per device where the backend
  exposes it.

Note for this container: the tunneled PJRT backend's ``block_until_ready``
returns early (see bench.py), so wall-clock timing helpers here use a scalar
device fetch as the completion barrier.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(out_dir: str):
    """Capture an XLA profiler trace: with trace('runs/prof'): step(...)"""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / memory traffic of fn(*args) from the compiled executable."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return {k: float(v) for k, v in dict(costs or {}).items()
            if isinstance(v, (int, float))}


def sync() -> None:
    """Reliable device barrier (scalar fetch; see module note)."""
    float(jnp.zeros(()) + 0.0)


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call, with a true completion barrier."""

    def once():
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).ravel()[0]
              if hasattr(leaf, "astype") else 0.0)

    for _ in range(warmup):
        once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def device_memory_stats() -> Dict[str, Any]:
    stats = {}
    for dev in jax.devices():
        try:
            stats[str(dev)] = dev.memory_stats()
        except Exception:
            stats[str(dev)] = None
    return stats


class Throughput:
    """Images/sec/chip meter (the north-star metric) between mark() calls."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = max(n_chips, 1)
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._images = 0

    def add(self, n_images: int) -> None:
        self._images += n_images

    def mark(self) -> float:
        dt = time.perf_counter() - self._t0
        rate = self._images / max(dt, 1e-9) / self.n_chips
        self.reset()
        return rate
