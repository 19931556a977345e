"""WGAN-GP gradient penalty as nested on-device autodiff.

The reference's hottest and most delicate path: interpolate real/fake
batches, take the gradient of D at the interpolates with ``create_graph=True``,
and penalize its per-sample L2 norm's deviation from 1 — a double backward
through every conv in D when the full loss is differentiated.

In JAX the whole construction is just nested ``jax.grad`` *inside* the jitted
train step: the inner ``jax.grad`` below produces ∂D/∂x̂ on the tape, and the
outer ``jax.grad`` over the discriminator loss differentiates through it.
XLA compiles the grad-of-grad into one fused program — no graph retention or
eager double backward like the reference needs.

Numerics: the norm is computed in fp32 with an eps inside the sqrt; D may run
in bf16 internally but scores and the penalty stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_penalty(d_score_fn, real, fake, key, *, center: float = 1.0,
                     eps: float = 1e-12, alpha=None):
    """E[(‖∇_x̂ D(x̂)‖₂ − center)²] over per-sample interpolates.

    Args:
      d_score_fn: x (N,H,W,C) → scores (N,), closed over D's params/state
        (state frozen: the penalty uses the same BN/SN behaviour as the
        surrounding critic evaluation, without double-updating state).
      real, fake: image batches; fake should already be detached from G
        (pass values, not a traced function of G's params).
      key: PRNG key for the per-sample interpolation coefficients.
      center: target gradient norm (1.0 for WGAN-GP).
      alpha: optional (N,1,1,1) interpolation coefficients overriding the
        internal draw — the parity harness feeds the torch twin and this
        step bit-identical coefficients through it.

    Returns scalar penalty (WITHOUT the λ factor — the caller scales).
    """
    n = real.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(key, (n, 1, 1, 1), dtype=jnp.float32)
    else:
        alpha = alpha.reshape(n, 1, 1, 1).astype(jnp.float32)
    x_hat = alpha * real.astype(jnp.float32) + (1.0 - alpha) * fake.astype(
        jnp.float32)

    def total_score(x):
        return jnp.sum(d_score_fn(x).astype(jnp.float32))

    grads = jax.grad(total_score)(x_hat)  # (N,H,W,C)
    grads = grads.reshape(n, -1).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + eps)
    return jnp.mean(jnp.square(norms - center))
