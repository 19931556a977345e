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


def _bce_with_target(logits, target: float):
    """BCE-with-logits against a soft target t:
    t*softplus(-l) + (1-t)*softplus(l). Supports label smoothing
    (e.g. real_label=0.9, the one-sided smoothing trick)."""
    if target == 1.0:
        return jnp.mean(jax.nn.softplus(-logits))
    if target == 0.0:
        return jnp.mean(jax.nn.softplus(logits))
    return jnp.mean(target * jax.nn.softplus(-logits)
                    + (1.0 - target) * jax.nn.softplus(logits))


def d_loss_real_fn(kind: str, real_logits, *, real_label: float = 1.0):
    """The real-batch term of the D/critic loss (every kind separates)."""
    r = _f32(real_logits)
    if kind == "bce":
        return _bce_with_target(r, real_label)
    if kind == "lsgan":
        return 0.5 * jnp.mean(jnp.square(r - real_label))
    if kind in ("wgan", "wgan_gp"):
        return -jnp.mean(r)
    if kind == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - r))
    raise ValueError(f"unknown loss kind {kind!r}")


def d_loss_fake_fn(kind: str, fake_logits, *, fake_label: float = 0.0):
    """The fake-batch term of the D/critic loss."""
    f = _f32(fake_logits)
    if kind == "bce":
        return _bce_with_target(f, fake_label)
    if kind == "lsgan":
        return 0.5 * jnp.mean(jnp.square(f - fake_label))
    if kind in ("wgan", "wgan_gp"):
        return jnp.mean(f)
    if kind == "hinge":
        return jnp.mean(jax.nn.relu(1.0 + f))
    raise ValueError(f"unknown loss kind {kind!r}")


def d_loss_fn(kind: str, real_logits, fake_logits, *,
              real_label: float = 1.0, fake_label: float = 0.0):
    """Discriminator/critic loss (to minimize)."""
    return (d_loss_real_fn(kind, real_logits, real_label=real_label)
            + d_loss_fake_fn(kind, fake_logits, fake_label=fake_label))


def g_loss_fn(kind: str, fake_logits, *, real_label: float = 1.0):
    """Generator loss (to minimize)."""
    f = _f32(fake_logits)
    if kind == "bce":
        return _bce_with_target(f, real_label)  # non-saturating
    if kind == "lsgan":
        return 0.5 * jnp.mean(jnp.square(f - real_label))
    if kind in ("wgan", "wgan_gp", "hinge"):
        return -jnp.mean(f)
    raise ValueError(f"unknown loss kind {kind!r}")
