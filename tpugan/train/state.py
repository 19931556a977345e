"""The complete training state as one donated pytree.

Everything the reference keeps in Python objects and module buffers —
G/D parameters, both optimizers' moments, BatchNorm running statistics,
spectral-norm u vectors, the RNG stream, and the step counter — lives in this
single pytree. The jitted train step maps ``TrainState -> TrainState`` with
the input buffers donated, so parameters and optimizer moments update
in-place in HBM with zero host round-trips.

This pytree is also exactly what gets checkpointed: restoring it resumes
training bit-for-bit (the reference's ``state_dict`` contract, extended to
the RNG so sampled noise continues the same stream).
"""

from __future__ import annotations

from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax

from tpugan.configs import Config
from tpugan.nn.core import Module


@chex.dataclass
class TrainState:
    params_g: Any
    state_g: Any
    opt_g: Any
    params_d: Any
    state_d: Any
    opt_d: Any
    rng: jax.Array
    step: jax.Array  # int32 scalar
    # EMA of G params (None when train.ema == 0). Sampling/eval prefer these
    # when present — the standard GAN inference-quality trick.
    params_g_ema: Any = None
    # ADA state (None unless train.ada_target > 0): the adapted per-op
    # execution probability p and the running estimate of the overfitting
    # heuristic r_t = E[sign(D(real))].  Living in the donated state, the
    # adaptation loop runs entirely on-device and checkpoints/resumes with
    # everything else.
    ada_p: Any = None
    ada_rt: Any = None


def lr_schedule(cfg: Config, lr: float, every: int = 1):
    """The configured LR schedule for one optimizer — a float (constant)
    or an optax schedule callable in that optimizer's own update-count
    domain.

    Reference uses constant LR; linear decay-to-zero over the run's tail
    is the standard GAN extension (pix2pix/CycleGAN recipe).

    optax schedules are evaluated at the optimizer's own update count,
    which for G advances only on every n_critic-th trainer step (its
    update is skipped inside lax.cond otherwise).  `every` converts the
    trainer-step decay window into that optimizer's count domain so
    G's decay tracks wall steps like D's does — without it, G's count
    tops out at total/n_critic, below decay_start, and G's LR would
    never decay while D's goes to zero.

    Shared with ckpt/torch_export.py, which evaluates it at the exported
    update count so a torch-side warm resume sees the LR actually in
    effect, not the un-decayed initial value.
    """
    o = cfg.optim
    if o.schedule == "constant":
        return lr
    if o.schedule == "linear":
        total = max(cfg.train.total_steps // every, 1)
        start = int(total * o.decay_start_frac)
        return optax.linear_schedule(
            init_value=lr, end_value=0.0,
            transition_steps=max(total - start, 1),
            transition_begin=start)
    raise ValueError(f"unknown optim.schedule {o.schedule!r}")


def make_optimizers(cfg: Config):
    o = cfg.optim

    def sched(lr, every=1):
        return lr_schedule(cfg, lr, every)

    if o.optimizer == "adam":
        mk = lambda lr, every=1: optax.adam(
            sched(lr, every), b1=o.beta1, b2=o.beta2, eps=o.eps)
    elif o.optimizer == "rmsprop":
        # eps_in_sqrt=False matches the reference semantics
        # (torch.optim.RMSprop: update = g / (sqrt(v) + eps)); optax's
        # default puts eps INSIDE the sqrt, a systematic per-step numerical
        # difference that round-3 parity work isolated as the cause of the
        # wgan-clip row's above-floor generator drift (BASELINE.md).
        # decay likewise follows torch's alpha default via cfg.
        mk = lambda lr, every=1: optax.rmsprop(sched(lr, every),
                                               decay=o.rmsprop_decay,
                                               eps=o.eps,
                                               eps_in_sqrt=False)
    else:
        raise ValueError(f"unknown optimizer {o.optimizer!r}")
    return mk(o.lr_g, every=max(cfg.loss.n_critic, 1)), mk(o.lr_d)


def create_train_state(cfg: Config, g: Module, d: Module,
                       seed: int | None = None) -> TrainState:
    """Initialize params/state/optimizers from the config seed."""
    seed = cfg.train.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    k_g, k_d, k_run = jax.random.split(root, 3)
    params_g, state_g = g.init(k_g)
    params_d, state_d = d.init(k_d)
    tx_g, tx_d = make_optimizers(cfg)
    return TrainState(
        params_g=params_g,
        state_g=state_g,
        opt_g=tx_g.init(params_g),
        params_d=params_d,
        state_d=state_d,
        opt_d=tx_d.init(params_d),
        rng=k_run,
        step=jnp.zeros((), jnp.int32),
        params_g_ema=(jax.tree.map(jnp.copy, params_g)
                      if cfg.train.ema > 0 else None),
        ada_p=(jnp.zeros((), jnp.float32)
               if cfg.train.ada_target != 0 else None),
        ada_rt=(jnp.zeros((), jnp.float32)
                if cfg.train.ada_target != 0 else None),
    )
