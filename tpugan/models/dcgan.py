"""DCGAN generator/discriminator family, sizes 28/32/64/128.

Architecture (driver-verified, BASELINE.json:5): the generator is a stack of
ConvTranspose+BatchNorm+ReLU ending in Tanh; the discriminator is a stack of
strided Conv+LeakyReLU (BatchNorm on the inner layers for the CIFAR/CelebA
configs, spectral norm instead for SNGAN).  The z→4×4 head and the 4×4→logit
tail are matmuls (the reference writes them as 4×4 VALID (de)convs on 1×1
maps — identical contraction, MXU-shaped here).

Channel schedules double per halving, capped at base*8 for 64px and base*16
for 128px — the classic DCGAN progression the reference follows.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from tpugan.nn.core import Module
from tpugan.models.blocks import DBlock, DTail, GBlock, GHead


def _g_schedule(image_size: int, ngf: int) -> Tuple[int, List[int]]:
    """Return (s0, [channels per resolution, coarsest→finest])."""
    if image_size == 28:
        return 7, [ngf * 2, ngf]
    if image_size == 32:
        return 4, [ngf * 4, ngf * 2, ngf]
    if image_size == 64:
        return 4, [ngf * 8, ngf * 4, ngf * 2, ngf]
    if image_size == 128:
        return 4, [ngf * 16, ngf * 8, ngf * 4, ngf * 2, ngf]
    if image_size == 256:
        # post-parity scaling size (spatial sharding); cap stays at 16×
        return 4, [ngf * 16, ngf * 16, ngf * 8, ngf * 4, ngf * 2, ngf]
    raise ValueError(f"unsupported image_size {image_size}")


class Generator(Module):
    """z (N, nz) → image (N, S, S, C) in [-1, 1]."""

    def __init__(self, image_size: int, channels: int, nz: int, ngf: int,
                 *, batchnorm: bool = True, dtype=jnp.bfloat16,
                 head_in: int | None = None):
        self.image_size, self.channels, self.nz = image_size, channels, nz
        s0, chans = _g_schedule(image_size, ngf)
        self.head = GHead(head_in or nz, s0, chans[0], batchnorm=batchnorm,
                          dtype=dtype)
        self.blocks: List[GBlock] = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            self.blocks.append(
                GBlock(cin, cout, batchnorm=batchnorm, dtype=dtype))
        self.final = GBlock(chans[-1], channels, final=True, dtype=dtype)

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 2)
        params, state = {}, {}
        params["head"], head_state = self.head.init(keys[0])
        if head_state:
            state["head"] = head_state
        for i, blk in enumerate(self.blocks):
            p, s = blk.init(keys[i + 1])
            params[f"block{i}"] = p
            if s:
                state[f"block{i}"] = s
        params["final"], _ = self.final.init(keys[-1])
        return params, state

    def apply(self, params, state, z, *, train: bool = False):
        new_state = {}
        x, ns = self.head.apply(params["head"], state.get("head", {}), z,
                                train=train)
        if ns:
            new_state["head"] = ns
        for i, blk in enumerate(self.blocks):
            x, ns = blk.apply(params[f"block{i}"], state.get(f"block{i}", {}),
                              x, train=train)
            if ns:
                new_state[f"block{i}"] = ns
        x, _ = self.final.apply(params["final"], {}, x, train=train)
        return x, new_state


def _d_schedule(image_size: int, ndf: int) -> Tuple[int, List[int]]:
    if image_size == 28:
        return 7, [ndf, ndf * 2]
    if image_size == 32:
        return 4, [ndf, ndf * 2, ndf * 4]
    if image_size == 64:
        return 4, [ndf, ndf * 2, ndf * 4, ndf * 8]
    if image_size == 128:
        return 4, [ndf, ndf * 2, ndf * 4, ndf * 8, ndf * 16]
    if image_size == 256:
        return 4, [ndf, ndf * 2, ndf * 4, ndf * 8, ndf * 16, ndf * 16]
    raise ValueError(f"unsupported image_size {image_size}")


class Discriminator(Module):
    """image (N, S, S, C) → score/logit (N,).

    ``in_channels`` may exceed the image channels for conditional variants
    (label planes concatenated at the input).
    """

    def __init__(self, image_size: int, channels: int, ndf: int,
                 *, batchnorm: bool = True, spectral_norm: bool = False,
                 leak: float = 0.2, dtype=jnp.bfloat16,
                 in_channels: int | None = None):
        self.image_size = image_size
        s0, chans = _d_schedule(image_size, ndf)
        cin = in_channels or channels
        self.blocks: List[DBlock] = []
        for i, cout in enumerate(chans):
            self.blocks.append(DBlock(
                cin, cout,
                # first block has no BN (DCGAN idiom); SN applies everywhere
                batchnorm=batchnorm and i > 0,
                spectral_norm=spectral_norm,
                leak=leak, dtype=dtype,
            ))
            cin = cout
        self.tail = DTail(s0, chans[-1], spectral_norm=spectral_norm,
                          dtype=dtype)

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks) + 1)
        params, state = {}, {}
        for i, blk in enumerate(self.blocks):
            p, s = blk.init(keys[i])
            params[f"block{i}"] = p
            if s:
                state[f"block{i}"] = s
        params["tail"], tail_state = self.tail.init(keys[-1])
        if tail_state:
            state["tail"] = tail_state
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        new_state = {}
        for i, blk in enumerate(self.blocks):
            x, ns = blk.apply(params[f"block{i}"], state.get(f"block{i}", {}),
                              x, train=train)
            if ns:
                new_state[f"block{i}"] = ns
        logit, ns = self.tail.apply(params["tail"], state.get("tail", {}), x,
                                    train=train)
        if ns:
            new_state["tail"] = ns
        return logit, new_state
