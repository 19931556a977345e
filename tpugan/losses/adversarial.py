"""Adversarial objectives over raw discriminator logits.

The reference computes BCE on sigmoid outputs via ``BCELoss``; we keep D's
output as a raw logit and use the softplus form (identical loss value,
numerically stable, and one fewer op for XLA to fuse):

    BCE(sigmoid(l), 1) = softplus(-l)        BCE(sigmoid(l), 0) = softplus(l)

All reductions are means over the batch, in fp32.

Kinds
-----
- ``bce``     non-saturating DCGAN loss (G maximizes log D(G(z)))
- ``lsgan``   least-squares with (a, b, c) = (0, 1, 1) and the ½ factors
- ``wgan``    Wasserstein critic difference (weight clipping handled by the
              trainer's post-update transform)
- ``wgan_gp`` same critic loss; the gradient penalty term is added by the
              trainer via ``losses.gradient_penalty``
- ``hinge``   geometric hinge (SNGAN's standard objective)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOSS_KINDS = ("bce", "lsgan", "wgan", "wgan_gp", "hinge")


def _f32(x):
    return x.astype(jnp.float32)


def d_loss_fn(kind: str, real_logits, fake_logits):
    """Discriminator/critic loss (to minimize)."""
    r, f = _f32(real_logits), _f32(fake_logits)
    if kind == "bce":
        return jnp.mean(jax.nn.softplus(-r)) + jnp.mean(jax.nn.softplus(f))
    if kind == "lsgan":
        return 0.5 * (jnp.mean(jnp.square(r - 1.0)) + jnp.mean(jnp.square(f)))
    if kind in ("wgan", "wgan_gp"):
        return jnp.mean(f) - jnp.mean(r)
    if kind == "hinge":
        return (jnp.mean(jax.nn.relu(1.0 - r))
                + jnp.mean(jax.nn.relu(1.0 + f)))
    raise ValueError(f"unknown loss kind {kind!r}")


def g_loss_fn(kind: str, fake_logits):
    """Generator loss (to minimize)."""
    f = _f32(fake_logits)
    if kind == "bce":
        return jnp.mean(jax.nn.softplus(-f))  # non-saturating
    if kind == "lsgan":
        return 0.5 * jnp.mean(jnp.square(f - 1.0))
    if kind in ("wgan", "wgan_gp", "hinge"):
        return -jnp.mean(f)
    raise ValueError(f"unknown loss kind {kind!r}")
