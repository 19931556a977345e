"""Sanitizers — the functional-world analog of race detection.

JAX programs can't data-race (pure functions, no shared mutable state); the
failure modes that replace races are: NaN/Inf creeping through a jitted step,
tracer leaks (host Python capturing traced values), and use-after-donation
(reusing a buffer donated into the step).  This module gives the trainer and
CI one switch for the relevant JAX checking modes, and a helper that asserts
a pytree is finite on demand (cheap enough to run on logged metrics every
step).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def sanitize(nans: bool = True, leaks: bool = True):
    """Enable debug_nans + leak checking for the enclosed scope (CI mode).

    debug_nans re-runs failing computations un-jitted to localize the NaN
    producer; checking_leaks catches tracer escapes.  Both are expensive —
    meant for tests/CI and post-mortem reruns, not production steps.
    """
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if leaks:
        ctxs.append(jax.checking_leaks())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def assert_finite(tree: Any, where: str = "") -> None:
    """Raise if any leaf of the pytree contains NaN/Inf (host-side check)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                name = jax.tree_util.keystr(path)
                raise FloatingPointError(
                    f"non-finite values at {name} {where}")
