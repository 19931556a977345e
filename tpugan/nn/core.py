"""Minimal functional module system.

tpugan's layers are *functional*: parameters and mutable state (BatchNorm
running statistics, spectral-norm power-iteration vectors) are explicit
pytrees threaded through every call.  Nothing is hidden in Python objects, so
the whole two-network alternating GAN step — including nested gradients for
the WGAN-GP penalty — jits into a single XLA program with donated buffers.

Protocol
--------
Every ``Module`` implements:

- ``init(key) -> (params, state)``: build parameter and state pytrees.
- ``apply(params, state, x, *, train) -> (y, new_state)``: pure forward.

``params`` are trainable (fp32 leaves); ``state`` is non-trainable (BN running
mean/var, SN u vectors) and is updated functionally when ``train=True``.
Compute dtype (bf16 on TPU) is applied inside layers; statistics stay fp32.

The reference framework keeps this state implicitly inside ``nn.Module``
buffers and updates it by side effect during ``forward``; here the same
information rides the train-step signature so XLA sees a pure function.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax

Params = Any  # pytree of trainable arrays
State = Any  # pytree of non-trainable arrays


class Module:
    """Base class: a named, pure (init, apply) pair."""

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        raise NotImplementedError

    def apply(self, params: Params, state: State, x, *, train: bool = False):
        raise NotImplementedError

    def __call__(self, params, state, x, *, train: bool = False):
        return self.apply(params, state, x, train=train)


class Sequential(Module):
    """Compose modules; params/state are dicts keyed by layer name.

    Stateless layers (activations) contribute no entries, keeping the pytrees
    minimal and checkpoint-stable when activation layers are added/removed.
    """

    def __init__(self, layers: Sequence[Tuple[str, Module]]):
        names = [n for n, _ in layers]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate layer names in Sequential: {names}")
        self.layers = list(layers)

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for (name, layer), k in zip(self.layers, keys):
            p, s = layer.init(k)
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        new_state = {}
        for name, layer in self.layers:
            p = params.get(name, {})
            s = state.get(name, {})
            x, ns = layer.apply(p, s, x, train=train)
            if ns:
                new_state[name] = ns
        return x, new_state
