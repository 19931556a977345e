"""Multi-chip batch-parallel inference: one endpoint over a device mesh.

Generation has no cross-request state (seeds are per-request, image ``i``
depends only on ``(seed, i)``), so inference scaling is pure data
parallelism: latents sharded over the ``('data',)`` axis, generator weights
replicated, the image batch produced sharded in place.  ``ShardedSampler``
exposes the same duck-typed surface as ``tpugan.export.ExportedGenerator``
(``generate`` / ``sample`` / ``nz`` / ``conditional`` / ...), so
``tpugan.serve.BatchingEngine`` can serve a whole mesh as one HTTP endpoint
— requests coalesce into one global batch and XLA splits it across chips.

Per-seed pixel fidelity with the single-device Sampler is preserved: the
(seed, index) → noise contract is index-based, and the replicated-weights /
batch-sharded placement computes exactly the single-program math (verified
in tests/test_export_serve.py on the 8-device virtual mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.configs import Config
from tpugan.nn.core import Module
from tpugan.parallel.mesh import batch_sharding, replicate
from tpugan.sample.sampler import seeded_labels, seeded_noise


class ShardedSampler:
    def __init__(self, cfg: Config, g: Module, params_g, state_g, mesh):
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self.conditional = cfg.model.arch == "cdcgan"
        self.nz = cfg.model.nz
        self.n_classes = cfg.model.n_classes
        self.image_size = cfg.model.image_size
        self.channels = cfg.model.channels
        self.fixed_batch = None  # duck-type parity with ExportedGenerator
        self._params = replicate(params_g, mesh)
        self._state = replicate(state_g, mesh)
        shard = batch_sharding(mesh)
        if self.conditional:
            @partial(jax.jit, out_shardings=shard)
            def fn(params, st, z, y):
                img, _ = g.apply(params, st, (z, y), train=False)
                return img.astype(jnp.float32)
        else:
            @partial(jax.jit, out_shardings=shard)
            def fn(params, st, z):
                img, _ = g.apply(params, st, z, train=False)
                return img.astype(jnp.float32)
        self._fn = fn
        self._shard = shard

    def generate(self, z, y=None) -> np.ndarray:
        """Run explicit latents across the mesh; any batch size (padded up
        to a multiple of the mesh internally, sliced after)."""
        z = np.asarray(z, np.float32)
        if self.conditional and y is None:
            raise ValueError("conditional model needs labels y")
        n = z.shape[0]
        m = -(-n // self.n_shards) * self.n_shards
        if m != n:
            z = np.concatenate(
                [z, np.zeros((m - n, z.shape[1]), np.float32)])
        zd = jax.device_put(jnp.asarray(z), self._shard)
        if self.conditional:
            y = np.asarray(y, np.int32)
            if m != n:
                y = np.concatenate([y, np.zeros((m - n,), np.int32)])
            yd = jax.device_put(jnp.asarray(y), self._shard)
            out = self._fn(self._params, self._state, zd, yd)
        else:
            out = self._fn(self._params, self._state, zd)
        return np.asarray(out)[:n]

    def sample(self, n: int, seed: int = 0, labels=None) -> np.ndarray:
        z = np.asarray(seeded_noise(self.nz, n, seed))
        if self.conditional:
            y = (np.asarray(labels, np.int32) if labels is not None else
                 np.asarray(seeded_labels(self.n_classes, n, seed)))
            return self.generate(z, y)
        return self.generate(z)
