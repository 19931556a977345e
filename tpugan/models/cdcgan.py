"""Conditional DCGAN (CelebA 128×128 config, BASELINE.json:11).

Conditioning follows the reference's embedding idiom: the class/attribute
label is embedded; for G the embedding is concatenated with z before the
dense head; for D the embedding is projected to a full-resolution plane and
concatenated with the image as an extra input channel.  (Driver-verified
description: "class/attr embedding, large convs".)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugan.nn.core import Module
from tpugan.nn.layers import Dense, Embedding
from tpugan.models.dcgan import Discriminator, Generator


class CondGenerator(Module):
    """(z (N, nz), y (N,) int) → image (N, S, S, C)."""

    def __init__(self, image_size: int, channels: int, nz: int, ngf: int,
                 n_classes: int, embed_dim: int = 50, *,
                 batchnorm: bool = True, dtype=jnp.bfloat16):
        self.embed = Embedding(n_classes, embed_dim, dtype=dtype)
        self.g = Generator(image_size, channels, nz, ngf,
                           batchnorm=batchnorm, dtype=dtype,
                           head_in=nz + embed_dim)
        self.nz = nz
        self.image_size = image_size
        self.channels = channels

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = {}, {}
        params["embed"], _ = self.embed.init(k1)
        params["g"], g_state = self.g.init(k2)
        if g_state:
            state["g"] = g_state
        return params, state

    def apply(self, params, state, zy, *, train: bool = False):
        z, y = zy
        e, _ = self.embed.apply(params["embed"], {}, y, train=train)
        zc = jnp.concatenate([z.astype(e.dtype), e], axis=-1)
        img, g_state = self.g.apply(params["g"], state.get("g", {}), zc,
                                    train=train)
        return img, ({"g": g_state} if g_state else {})


class CondDiscriminator(Module):
    """(image (N, S, S, C), y (N,) int) → logit (N,)."""

    def __init__(self, image_size: int, channels: int, ndf: int,
                 n_classes: int, embed_dim: int = 50, *,
                 batchnorm: bool = True, spectral_norm: bool = False,
                 leak: float = 0.2, dtype=jnp.bfloat16):
        self.image_size = image_size
        self.embed = Embedding(n_classes, embed_dim, dtype=dtype)
        self.proj = Dense(embed_dim, image_size * image_size, dtype=dtype)
        self.d = Discriminator(image_size, channels, ndf,
                               batchnorm=batchnorm,
                               spectral_norm=spectral_norm, leak=leak,
                               dtype=dtype, in_channels=channels + 1)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params, state = {}, {}
        params["embed"], _ = self.embed.init(k1)
        params["proj"], _ = self.proj.init(k2)
        params["d"], d_state = self.d.init(k3)
        if d_state:
            state["d"] = d_state
        return params, state

    def apply(self, params, state, xy, *, train: bool = False):
        x, y = xy
        e, _ = self.embed.apply(params["embed"], {}, y, train=train)
        plane, _ = self.proj.apply(params["proj"], {}, e, train=train)
        s = self.image_size
        plane = plane.reshape(-1, s, s, 1)
        xc = jnp.concatenate([x.astype(plane.dtype), plane], axis=-1)
        logit, d_state = self.d.apply(params["d"], state.get("d", {}), xc,
                                      train=train)
        return logit, ({"d": d_state} if d_state else {})
