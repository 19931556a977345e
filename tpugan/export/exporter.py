"""Deployment export: serialize a trained generator to a self-contained,
portable artifact.

The reference's deployment story is "torch.save the state_dict and keep the
model code around" (SURVEY.md §3.5); on TPU the idiomatic equivalent is
**ahead-of-time export through StableHLO** (``jax.export``): the generator's
eval-mode forward — weights baked in as constants — is lowered once, with a
*symbolic batch dimension*, for both CPU and TPU, and serialized into a
single ``.tpugan`` file.  A serving host needs only jax + this loader — no
model code, no checkpoint tree, no re-tracing — and gets per-seed pixel
fidelity with the training-time Sampler (the artifact ships the same
(seed, index) → noise contract).

Artifact layout (zip):
  generator.jaxexport   serialized jax.export.Exported (StableHLO + vjp-less)
  meta.json             nz / image_size / channels / n_classes / dtype /
                        format version / jax version / config snapshot
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.configs import Config
from tpugan.nn.core import Module
from tpugan.sample.sampler import seeded_labels, seeded_noise

FORMAT_VERSION = 1
_EXPORT_NAME = "generator.jaxexport"
_META_NAME = "meta.json"


def export_generator(cfg: Config, g: Module, params_g, state_g,
                     batch: Optional[int] = None,
                     platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Serialize the eval-mode generator to a self-contained artifact.

    ``batch=None`` exports with a symbolic batch dimension — one artifact
    serves any request size (each distinct runtime batch still XLA-compiles
    once on the serving host; see serve.BatchingEngine's bucketing).
    Weights are embedded as constants so the artifact needs no checkpoint.
    """
    from jax import export as jex

    conditional = cfg.model.arch == "cdcgan"
    nz = cfg.model.nz

    # Close over the weights: jit treats them as constants and they are
    # serialized into the module. Eval mode = BN running stats, frozen SN u.
    if conditional:
        def forward(z, y):
            img, _ = g.apply(params_g, state_g, (z, y), train=False)
            return img.astype(jnp.float32)
    else:
        def forward(z):
            img, _ = g.apply(params_g, state_g, z, train=False)
            return img.astype(jnp.float32)

    if batch is None:
        (b,) = jex.symbolic_shape("b")
    else:
        b = int(batch)
    z_spec = jax.ShapeDtypeStruct((b, nz), jnp.float32)
    specs = (z_spec, jax.ShapeDtypeStruct((b,), jnp.int32)) if conditional \
        else (z_spec,)
    exported = jex.export(jax.jit(forward), platforms=list(platforms))(*specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "conditional": conditional,
        "nz": nz,
        "image_size": cfg.model.image_size,
        "channels": cfg.model.channels,
        "n_classes": cfg.model.n_classes,
        "batch": batch,
        "platforms": list(platforms),
        "config": json.loads(cfg.to_json()),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_EXPORT_NAME, exported.serialize())
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
    return buf.getvalue()


def save_generator(path: str, cfg: Config, g: Module, params_g, state_g,
                   batch: Optional[int] = None,
                   platforms: Sequence[str] = ("cpu", "tpu")) -> None:
    blob = export_generator(cfg, g, params_g, state_g, batch=batch,
                            platforms=platforms)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class ExportedGenerator:
    """A deserialized artifact with the live Sampler's generation surface.

    ``generate(z[, y])`` runs the exported StableHLO on the current backend;
    ``sample(n, seed)`` reproduces the training-time Sampler's pixels for the
    same (checkpoint, seed, n) — the determinism contract survives export.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.conditional = bool(meta["conditional"])
        self.nz = int(meta["nz"])
        self.n_classes = int(meta["n_classes"])
        self.image_size = int(meta["image_size"])
        self.channels = int(meta["channels"])
        self.fixed_batch = meta.get("batch")

    def generate(self, z, y=None) -> np.ndarray:
        """Run explicit latents through the artifact, any batch size.

        A fixed-batch artifact accepts exactly one shape, so inputs are
        chunked to ``fixed_batch`` with the tail zero-padded and sliced
        back — callers (including the serving BatchingEngine) never need
        to know which kind of artifact they hold.
        """
        z = jnp.asarray(z, jnp.float32)
        if self.conditional and y is None:
            raise ValueError("conditional artifact needs labels y")
        if not self.conditional and y is not None:
            raise ValueError("unconditional artifact: labels not accepted")
        y = None if y is None else jnp.asarray(y, jnp.int32)
        n = z.shape[0]
        fb = self.fixed_batch
        if not fb:
            out = (self._exported.call(z, y) if self.conditional
                   else self._exported.call(z))
            return np.asarray(out)
        outs = []
        for start in range(0, n, fb):
            m = min(fb, n - start)
            zc = z[start:start + m]
            if m < fb:
                zc = jnp.concatenate(
                    [zc, jnp.zeros((fb - m, self.nz), jnp.float32)])
            if self.conditional:
                yc = y[start:start + m]
                if m < fb:
                    yc = jnp.concatenate(
                        [yc, jnp.zeros((fb - m,), jnp.int32)])
                outs.append(np.asarray(self._exported.call(zc, yc))[:m])
            else:
                outs.append(np.asarray(self._exported.call(zc))[:m])
        return np.concatenate(outs, axis=0)

    def sample(self, n: int, seed: int = 0, labels=None,
               batch_size: int = 0) -> np.ndarray:
        bs = batch_size or self.fixed_batch or n
        outs = []
        for start in range(0, n, bs):
            m = min(bs, n - start)
            z = seeded_noise(self.nz, m, seed, offset=start)
            if self.conditional:
                y = (jnp.asarray(labels[start:start + m])
                     if labels is not None else
                     seeded_labels(self.n_classes, m, seed, offset=start))
                outs.append(self.generate(z, y))
            else:
                outs.append(self.generate(z))
        return np.concatenate(outs, axis=0)


def load_generator(path_or_bytes) -> ExportedGenerator:
    from jax import export as jex

    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = io.BytesIO(path_or_bytes)
    else:
        buf = open(path_or_bytes, "rb")
    try:
        with zipfile.ZipFile(buf) as zf:
            meta = json.loads(zf.read(_META_NAME))
            if meta.get("format_version") != FORMAT_VERSION:
                raise ValueError(
                    f"unsupported artifact format {meta.get('format_version')}"
                    f" (loader supports {FORMAT_VERSION})")
            exported = jex.deserialize(zf.read(_EXPORT_NAME))
    finally:
        buf.close()
    return ExportedGenerator(exported, meta)
