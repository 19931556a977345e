"""Model construction from config."""

from __future__ import annotations

import jax.numpy as jnp

from tpugan.configs import ModelConfig
from tpugan.models.cdcgan import CondDiscriminator, CondGenerator
from tpugan.models.dcgan import Discriminator, Generator


def _dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32


def resolve_embed_dim(cfg: ModelConfig) -> int:
    """embed_dim=0 means 'use the default' (50).  Shared by build_models and
    the torch parity twins so both frameworks resolve the default the same
    way — a twin built from the raw field would get Embedding(n, 0) and
    crash the weight transplant on a shape mismatch."""
    return cfg.embed_dim or 50


def build_models(cfg: ModelConfig, precision: str = "bf16"):
    """Return (generator, discriminator) modules for a ModelConfig."""
    dtype = _dtype(precision)
    if cfg.arch == "dcgan":
        g = Generator(cfg.image_size, cfg.channels, cfg.nz, cfg.ngf,
                      batchnorm=cfg.g_batchnorm, dtype=dtype)
        d = Discriminator(cfg.image_size, cfg.channels, cfg.ndf,
                          batchnorm=cfg.d_batchnorm,
                          spectral_norm=cfg.d_spectral_norm,
                          leak=cfg.leak, dtype=dtype)
        return g, d
    if cfg.arch == "cdcgan":
        if cfg.n_classes <= 0:
            raise ValueError("cdcgan requires model.n_classes > 0")
        embed = resolve_embed_dim(cfg)
        g = CondGenerator(cfg.image_size, cfg.channels, cfg.nz, cfg.ngf,
                          cfg.n_classes, embed, batchnorm=cfg.g_batchnorm,
                          dtype=dtype)
        d = CondDiscriminator(cfg.image_size, cfg.channels, cfg.ndf,
                              cfg.n_classes, embed,
                              batchnorm=cfg.d_batchnorm,
                              spectral_norm=cfg.d_spectral_norm,
                              leak=cfg.leak, dtype=dtype)
        return g, d
    raise ValueError(f"unknown arch {cfg.arch!r}")
