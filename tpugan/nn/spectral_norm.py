"""Spectral normalization as functional, on-device state (SNGAN).

The reference applies ``spectral_norm`` wrappers to the discriminator's
conv/linear weights: one power-iteration per forward pass in training, with
the left singular vector ``u`` persisted across steps in a module buffer, and
W̄ = W / σ(W) used for the actual convolution where only σ's dependence on W
(not on u, v) is differentiated.

Here the same contract is functional and jit-compiled:

- ``u`` lives in the layer's *state* pytree, threaded through the train step
  and checkpointed (required for exact resume fidelity).
- The power iteration runs on-device inside the compiled step; ``u``/``v``
  enter the σ computation behind ``lax.stop_gradient``.
- Using ``stop_gradient`` rather than a ``jax.custom_vjp`` keeps the op
  differentiable at *every* order — the WGAN-GP double backward composes with
  spectrally-normalized discriminators with no extra VJP rules. (A custom_vjp
  here would forbid grad-of-grad; this formulation computes the identical
  first-order gradient.)
- In training the updated ``u`` is returned as new state (one iteration per
  forward); in eval σ is computed from the stored ``u`` without update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpugan.nn.core import Module


def _l2_normalize(x, eps=1e-12):
    return x * lax.rsqrt(jnp.sum(jnp.square(x)) + eps)


class SpectralNorm(Module):
    """Wrap a Conv/ConvTranspose/Dense module, normalizing its ``w`` by σ."""

    def __init__(self, inner: Module, n_iter: int = 1):
        self.inner = inner
        self.n_iter = n_iter

    def init(self, key):
        k_inner, k_u = jax.random.split(key)
        params, state = self.inner.init(k_inner)
        w = params["w"]
        cout = w.shape[-1]
        u = _l2_normalize(jax.random.normal(k_u, (cout,), jnp.float32))
        return params, {**state, "u": u}

    def _sigma(self, w, u, n_iter: int):
        # HWIO (or DI) weight -> matrix (d, cout); u approximates the top
        # right-singular direction in R^cout.
        w_mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
        for _ in range(n_iter):
            v = _l2_normalize(w_mat @ u)               # (d,)
            u = _l2_normalize(w_mat.T @ v)             # (cout,)
        u = lax.stop_gradient(u)
        v = lax.stop_gradient(_l2_normalize(w_mat @ u))
        sigma = v @ (w_mat @ u)  # u, v constant; d sigma/dW = v uᵀ
        return sigma, u

    def apply(self, params, state, x, *, train: bool = False):
        u = state["u"]
        # Reference eval-mode semantics (torch spectral_norm's
        # do_power_iteration=module.training): the power iteration runs in
        # TRAINING forwards only; eval computes σ from the stored u as-is.
        sigma, u_new = self._sigma(params["w"], u,
                                   self.n_iter if train else 0)
        normed = dict(params)
        normed["w"] = params["w"] / sigma
        inner_state = {k: v for k, v in state.items() if k != "u"}
        y, new_inner = self.inner.apply(normed, inner_state, x, train=train)
        new_state = dict(new_inner)
        # One power iteration per *training* forward persists; eval keeps the
        # stored vector (reference eval-mode semantics).
        new_state["u"] = u_new if train else u
        return y, new_state
