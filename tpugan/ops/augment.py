"""Differentiable GAN augmentation (DiffAugment / ADA), fused into the step.

The reference trains on raw (optionally h-flipped) images only; on small
datasets its discriminator memorizes and the run collapses — tpugan's own
round-3 6k-step collapse on a 2k-image set reproduced exactly that failure.
The standard modern fix is to augment EVERY image the discriminator sees —
real and generated, in both the D and G updates — with differentiable ops so
the generator's gradient flows through the augmentation and G never learns
to produce augmented images (DiffAugment, arXiv:2006.10738; ADA,
arXiv:2006.06676).

TPU-first design: every op below is a batched, statically-shaped jnp
transform (elementwise math + one gather for translation + a mask multiply
for cutout), applied INSIDE the jitted train step so XLA fuses the whole
policy into the surrounding program — zero extra HBM round-trips, no host
work, and the per-sample randomness comes from the step's own threefry
stream (reproducible, resume-exact).

Layout/range contract: NHWC images in [-1, 1] (the step's post-decode
domain).  Ops match the DiffAugment reference semantics:

- ``color``        brightness (+U[-.5,.5)), saturation (x2 U[0,2)),
                   contrast (x U[.5,1.5)) — composed in that order
- ``translation``  integer shift in [-round(H/8), +round(H/8)] per axis,
                   zero-padded (zeros = mid-gray in [-1,1])
- ``cutout``       zero a (H/2, W/2) window at a random position

``apply_policy(x, key, policy, p)`` gates each op per-sample with
probability ``p`` (ADA's execution model); ``p=1`` recovers plain
DiffAugment and skips the gating entirely.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "POLICY_NAMES",
    "apply_policy",
    "parse_policy",
    "rand_brightness",
    "rand_contrast",
    "rand_cutout",
    "rand_saturation",
    "rand_translation",
]


def rand_brightness(x: jax.Array, key: jax.Array) -> jax.Array:
    """x + U[-0.5, 0.5) per sample."""
    n = x.shape[0]
    u = jax.random.uniform(key, (n, 1, 1, 1), jnp.float32) - 0.5
    return x + u.astype(x.dtype)


def rand_saturation(x: jax.Array, key: jax.Array) -> jax.Array:
    """(x - mean_c) * U[0, 2) + mean_c — channel-mean-preserving."""
    n = x.shape[0]
    u = jax.random.uniform(key, (n, 1, 1, 1), jnp.float32) * 2.0
    mean = jnp.mean(x, axis=-1, keepdims=True)
    return (x - mean) * u.astype(x.dtype) + mean


def rand_contrast(x: jax.Array, key: jax.Array) -> jax.Array:
    """(x - mean_hwc) * U[0.5, 1.5) + mean_hwc — image-mean-preserving."""
    n = x.shape[0]
    u = jax.random.uniform(key, (n, 1, 1, 1), jnp.float32) + 0.5
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * u.astype(x.dtype) + mean


def rand_translation(x: jax.Array, key: jax.Array,
                     ratio: float = 0.125) -> jax.Array:
    """Shift each sample by integer offsets in [-round(H*ratio),
    +round(H*ratio)] (per axis, per sample), zero-filling the exposed
    border.

    TPU formulation: the shift is a per-sample one-hot "almost-permutation"
    matrix applied to each axis — ``out = P_h @ x @ P_w^T`` as two batched
    matmuls.  A gather would run on the slow path and its VJP is a
    scatter-add (measured 10.5x end-to-end step cost at 128px); one-hot
    matmuls ride the MXU in both directions, and out-of-range rows are
    all-zero so the exposed border zero-fills with no masking.  Each output
    element is a single ``1.0 * x`` product, so results are bitwise equal
    to the gather formulation."""
    n, h, w, _ = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (n, 1, 1), -sh, sh + 1)
    tw = jax.random.randint(kw, (n, 1, 1), -sw, sw + 1)
    ih = jnp.arange(h, dtype=jnp.int32)
    iw = jnp.arange(w, dtype=jnp.int32)
    # P[n, i, j] = 1 iff j == i + t_n  (rows with i + t_n outside [0, len)
    # have no matching j and stay all-zero -> zero-filled border)
    ph = (ih[None, None, :] == ih[None, :, None] + th).astype(x.dtype)
    pw = (iw[None, None, :] == iw[None, :, None] + tw).astype(x.dtype)
    # HIGHEST precision: the TPU default truncates matmul operands to
    # bf16, which would quantize every augmented pixel (and G's gradient
    # through the op) — with exact f32 passes each output element is the
    # single product 1.0 * x, keeping the bitwise-equal-to-gather contract.
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("nij,njwc->niwc", ph, x, precision=hi)
    return jnp.einsum("nkw,niwc->nikc", pw, out, precision=hi)


def rand_cutout(x: jax.Array, key: jax.Array,
                ratio: float = 0.5) -> jax.Array:
    """Zero a (H*ratio, W*ratio) window centered at a uniform position
    (window clips at the borders, matching the DiffAugment reference's
    clamped-scatter semantics).  Computed as an index-arithmetic mask —
    no scatter, just compares and one multiply."""
    n, h, w, _ = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    oy = jax.random.randint(kh, (n, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(kw, (n, 1, 1), 0, w + (1 - cw % 2))
    yy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    y0, x0 = oy - ch // 2, ox - cw // 2
    inside = ((yy >= y0) & (yy < y0 + ch) & (xx >= x0) & (xx < x0 + cw))
    return x * (1.0 - inside.astype(x.dtype))[..., None]


# A policy name maps to the ordered ops it runs (DiffAugment groups the
# three color ops under one name; each still draws its own randomness and,
# under ADA, its own per-sample execution gate).
_POLICY_OPS = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}
POLICY_NAMES = tuple(_POLICY_OPS)


def parse_policy(spec: str) -> tuple[str, ...]:
    """'color,translation,cutout' -> validated tuple of policy names."""
    names = tuple(s.strip() for s in spec.split(",") if s.strip())
    for name in names:
        if name not in _POLICY_OPS:
            raise ValueError(
                f"unknown augment op {name!r}; available: "
                f"{', '.join(POLICY_NAMES)}")
    return names


def apply_policy(x: jax.Array, key: jax.Array,
                 policy: Sequence[str], p=1.0) -> jax.Array:
    """Run the policy's ops on a batch, each gated per-sample at prob ``p``.

    ``p`` may be a Python float or a traced scalar (the ADA-adapted
    probability).  ``p=1.0`` (static) skips the bernoulli gates — the plain
    DiffAugment fast path.  Differentiable w.r.t. ``x`` throughout, so the
    generator pass backpropagates through the augmentation.
    """
    always_on = isinstance(p, (int, float)) and p >= 1.0
    n = x.shape[0]
    for name in policy:
        for op in _POLICY_OPS[name]:
            key, k_op, k_gate = jax.random.split(key, 3)
            ax = op(x, k_op)
            if always_on:
                x = ax
            else:
                gate = jax.random.bernoulli(k_gate, p, (n, 1, 1, 1))
                x = jnp.where(gate, ax, x)
    return x
