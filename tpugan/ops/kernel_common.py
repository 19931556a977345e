"""Shared pieces of the Pallas kernel family.

One definition each for the activation epilogue and the transpose-conv tap
table so the per-layer kernels (pallas_conv / pallas_convt), the fused
XLA epilogues (fused.py), and both whole-generator megakernels
(pallas_gen / pallas_gen2) cannot drift apart — a tap-offset or activation
fix lands once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ConvTranspose(4, 2, 1) as 4 phase matmuls: output parity plane d reads
# kernel rows k at input offset o (o = (2i + k - 1 paths collapsed per
# parity); input is pre-padded by 1 so offset -1 is in range).  Derivation:
# DESIGN.md kernel section / pallas_convt.py.
TAPS = {0: [(1, 0), (3, -1)], 1: [(0, 1), (2, 0)]}


def act(y, kind: str, leak: float = 0.2):
    """Activation epilogue shared by every kernel ('none' = identity)."""
    if kind == "relu":
        return jax.nn.relu(y)
    if kind == "leaky_relu":
        return jax.nn.leaky_relu(y, leak)
    if kind == "tanh":
        return jnp.tanh(y)
    if kind == "none":
        return y
    raise ValueError(f"unknown act {kind!r}")
