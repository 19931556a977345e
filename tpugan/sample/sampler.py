"""The public sampler API: seeded, batched generation + sample grids.

Mirrors the reference's sampler surface (fixed-noise grid per epoch, seeded
generation for eval) with an explicit determinism contract: images are a pure
function of (checkpoint, seed, n, labels) — same seed, same pixels, on any
run. Generation runs in eval mode (BatchNorm running stats, frozen
spectral-norm u) under one jitted function.
"""

from __future__ import annotations

import warnings
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.configs import Config
from tpugan.nn.core import Module
from tpugan.utils.images import make_grid, save_png, to_uint8

# One jitted sample fn per (generator, backend) — repeated Sampler
# construction (e.g. every in-training eval point) must not recompile.
_SAMPLE_FN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def seeded_noise(nz: int, n: int, seed: int, offset: int = 0) -> jax.Array:
    """The sampler determinism contract: image i is a pure function of
    (seed, i) — invariant to batching/chunking.  Shared by the live Sampler
    and exported artifacts (tpugan/export) so a deployed generator
    reproduces the training-time sample pixels per seed."""
    root = jax.random.PRNGKey(seed)
    idx = jnp.arange(offset, offset + n)
    keys = jax.vmap(lambda i: jax.random.fold_in(root, i))(idx)
    return jax.vmap(lambda k: jax.random.normal(k, (nz,), jnp.float32))(keys)


def seeded_labels(n_classes: int, n: int, seed: int,
                  offset: int = 0) -> jax.Array:
    root = jax.random.fold_in(jax.random.PRNGKey(seed), 0x1ABE1)
    idx = jnp.arange(offset, offset + n)
    keys = jax.vmap(lambda i: jax.random.fold_in(root, i))(idx)
    return jax.vmap(lambda k: jax.random.randint(k, (), 0, n_classes))(keys)


def build_sample_fn(cfg: Config, g: Module):
    key = (cfg.train.kernels, cfg.model.arch, cfg.train.spatial_shards)
    per_g = _SAMPLE_FN_CACHE.setdefault(g, {})
    if key not in per_g:
        per_g[key] = _build_sample_fn(cfg, g)
    return per_g[key]


def _build_sample_fn(cfg: Config, g: Module):
    """Jitted eval-mode sampler: (params_g, state_g, z[, y]) -> images f32.

    With ``train.kernels == "pallas"`` the unconditional DCGAN generator runs
    as the whole-network Pallas megakernel (ops/pallas_gen.py) — activations
    stay in VMEM for the entire forward.  Unsupported shapes fall back to the
    XLA path transparently.
    """
    conditional = cfg.model.arch == "cdcgan"

    if cfg.train.spatial_shards > 0:
        # Spatially-sharded sampling/eval (SURVEY §2b SP analog, scaling
        # completeness): a ≥256px model that NEEDS sharding to fit must be
        # able to produce its own grids/FID on the same hardware it trains
        # on.  The spatial ctx is consulted at TRACE time, so entering it
        # inside the jitted body routes the eval-mode convs through the
        # halo primitives; the H-sharded output gathers on device_get.
        import numpy as _np

        from jax.sharding import Mesh as _Mesh
        from tpugan.parallel import spatial as _sp

        if _sp._CTX.mesh is not None:  # reuse the Trainer's mesh/axis
            _mesh, _axis, _dim = _sp._CTX.mesh, _sp._CTX.axis, _sp._CTX.dim
        else:  # standalone (CLI sample/eval): own 1-D space mesh
            devs = jax.devices()
            if len(devs) < cfg.train.spatial_shards:
                raise ValueError(
                    f"train.spatial_shards={cfg.train.spatial_shards} but "
                    f"only {len(devs)} device(s) are visible — a silently "
                    f"smaller mesh would change sharding (and can OOM a "
                    f"model that needs the full split)")
            devs = devs[:cfg.train.spatial_shards]
            _mesh, _axis, _dim = _Mesh(_np.array(devs), ("space",)), \
                "space", 1

        @jax.jit
        def sample_spatial(params_g, state_g, z, y=None):
            zin = (z, y) if conditional else z
            with _sp.spatial_ctx(_mesh, axis=_axis, dim=_dim):
                img, _ = g.apply(params_g, state_g, zin, train=False)
            return img.astype(jnp.float32)

        return sample_spatial

    if cfg.train.kernels == "pallas" and jax.default_backend() == "tpu":
        from tpugan.ops import pallas_gen, pallas_gen2

        @jax.jit
        def xla_fallback(params_g, state_g, z, y=None):
            zin = (z, y) if conditional else z
            img, _ = g.apply(params_g, state_g, zin, train=False)
            return img.astype(jnp.float32)

        # Mosaic compile failures on this toolchain are shape-dependent
        # (DESIGN.md §4) and surface as runtime errors from the PJRT layer —
        # treat those as "unsupported" and fall back, but never swallow
        # Python-side bugs (TypeError/AttributeError/assertion), and always
        # say which path ran: silent fallback masked real bugs in round 1.
        _compile_errors = (jax.errors.JaxRuntimeError, RuntimeError,
                           NotImplementedError, ValueError)

        def sample_pallas(params_g, state_g, z, y=None):
            # prefer the phase-separated v2 megakernel (handles conditional
            # models by folding the embedding outside the kernel); fall back
            # to v1 (unconditional only), then to the XLA path.
            try:
                out = pallas_gen2.generator_forward(
                    g, params_g, state_g, z, out_dtype=jnp.float32, y=y)
            except _compile_errors as e:
                warnings.warn(f"pallas v2 megakernel unavailable for this "
                              f"shape ({type(e).__name__}); falling back")
                out = None
            if out is None and not conditional:
                try:
                    out = pallas_gen.generator_forward(
                        g, params_g, state_g, z, out_dtype=jnp.float32)
                except _compile_errors as e:
                    warnings.warn(f"pallas v1 megakernel unavailable "
                                  f"({type(e).__name__}); using XLA sampler")
                    out = None
            if out is not None:
                return out
            return xla_fallback(params_g, state_g, z, y)

        return sample_pallas

    @jax.jit
    def sample(params_g, state_g, z, y=None):
        zin = (z, y) if conditional else z
        img, _ = g.apply(params_g, state_g, zin, train=False)
        return img.astype(jnp.float32)

    return sample


def build_unrolled_fn(cfg: Config, g: Module, u: int):
    """Fused multi-batch sampler: ``u`` generator invocations of one batch
    each, unrolled as straight-line code in a single jitted program.

    Why this exists (DESIGN.md §4 round-4 addendum): it divides the fixed
    per-dispatch host/framework overhead by ``u``, which matters when
    sampling is dispatch-bound (many small batches, remote/tunneled
    backends, tight serving loops).  On-device throughput is UNCHANGED —
    a controlled interleaved A/B on the v5e measured the unrolled chain
    indistinguishable from the looped one — so this is a dispatch
    amortization, not a kernel speedup; larger single batches are not a
    substitute because per-image rate falls past the per-batch sweet spot
    (2048 measured flat-to-slower at 64px).

    The program computes exactly ``u`` sequential sweet-spot batches, so
    the determinism contract is untouched: pixels are a function of
    (seed, index) regardless of unroll (pinned by test_sampler_data.py).
    """
    per_g = _SAMPLE_FN_CACHE.setdefault(g, {})
    key = (cfg.train.kernels, cfg.model.arch, cfg.train.spatial_shards,
           "unroll", u)
    if key not in per_g:
        inner = build_sample_fn(cfg, g)
        conditional = cfg.model.arch == "cdcgan"

        @jax.jit
        def fused(params_g, state_g, z, y=None):
            bs = z.shape[0] // u
            outs = []
            for i in range(u):
                zi = jax.lax.slice_in_dim(z, i * bs, (i + 1) * bs)
                if conditional:
                    yi = jax.lax.slice_in_dim(y, i * bs, (i + 1) * bs)
                    outs.append(inner(params_g, state_g, zi, yi))
                else:
                    outs.append(inner(params_g, state_g, zi))
            return jnp.concatenate(outs, axis=0)

        per_g[key] = fused
    return per_g[key]


class Sampler:
    def __init__(self, cfg: Config, g: Module, params_g, state_g):
        self.cfg = cfg
        self.conditional = cfg.model.arch == "cdcgan"
        self.nz = cfg.model.nz
        self.n_classes = cfg.model.n_classes
        self._g = g
        self._fn = build_sample_fn(cfg, g)
        self.params_g = params_g
        self.state_g = state_g

    def update(self, params_g, state_g) -> None:
        """Point the sampler at fresh (e.g. just-trained) weights."""
        self.params_g = params_g
        self.state_g = state_g

    def noise(self, n: int, seed: int, offset: int = 0) -> jax.Array:
        """Per-sample-index noise: image i is a function of (seed, i) only,
        so generation is invariant to batching/chunking."""
        return seeded_noise(self.nz, n, seed, offset)

    def labels(self, n: int, seed: int, offset: int = 0
               ) -> Optional[jax.Array]:
        if not self.conditional:
            return None
        return seeded_labels(self.n_classes, n, seed, offset)

    def sample(self, n: int, seed: int = 0, labels=None,
               batch_size: int = 0, unroll: int = 1) -> np.ndarray:
        """Generate n images in [-1, 1], float32 NHWC, deterministically.

        ``unroll > 1`` generates that many consecutive batches per device
        dispatch as one straight-line program — amortizes per-dispatch
        overhead when sampling is dispatch-bound (see build_unrolled_fn).
        Pixels are identical for any (batch_size, unroll) chunking.
        """
        bs = batch_size or n
        u = max(1, int(unroll))
        if u > 1 and (self.cfg.train.kernels == "pallas"
                      or self.cfg.train.spatial_shards > 0):
            # the pallas path's eager compile-fallback and the spatial
            # path's mesh ctx are per-invocation machinery; keep those
            # sequential rather than silently changing their semantics
            warnings.warn("sample(unroll>1) applies to the XLA sample path "
                          "only; generating sequentially")
            u = 1
        fused = (build_unrolled_fn(self.cfg, self._g, u) if u > 1 else None)
        outs = []
        start = 0
        while start < n:
            if u > 1 and n - start >= bs * u:
                m, fn = bs * u, fused
            else:
                m, fn = min(bs, n - start), self._fn
            z = self.noise(m, seed, offset=start)
            if self.conditional:
                y = (labels[start:start + m] if labels is not None
                     else self.labels(m, seed, offset=start))
                imgs = fn(self.params_g, self.state_g, z, jnp.asarray(y))
            else:
                imgs = fn(self.params_g, self.state_g, z)
            outs.append(np.asarray(imgs))
            start += m
        return np.concatenate(outs, axis=0)

    def sample_fixed(self, z, labels=None) -> np.ndarray:
        """Generate from caller-provided noise (the fixed-noise grid path)."""
        if self.conditional:
            return np.asarray(self._fn(self.params_g, self.state_g, z,
                                       jnp.asarray(labels)))
        return np.asarray(self._fn(self.params_g, self.state_g, z))

    def save_grid(self, path: str, n: int = 64, seed: int = 0,
                  nrow: int = 8) -> np.ndarray:
        imgs = self.sample(n, seed)
        grid = make_grid(to_uint8(imgs), nrow=nrow)
        save_png(path, grid)
        return grid

    def interpolate(self, seed_a: int, seed_b: int, steps: int = 8,
                    label=None, spherical: bool = False) -> np.ndarray:
        """Latent-space interpolation between the first noise vectors of two
        seeds.  ``spherical=True`` uses slerp (interpolates along the great
        circle — stays on the Gaussian typical-set shell, avoiding the
        low-norm midpoints of linear interpolation)."""
        za = self.noise(1, seed_a)[0]
        zb = self.noise(1, seed_b)[0]
        t = jnp.linspace(0.0, 1.0, steps)[:, None]
        if spherical:
            na = za / jnp.linalg.norm(za)
            nb = zb / jnp.linalg.norm(zb)
            omega = jnp.arccos(jnp.clip(jnp.dot(na, nb), -1 + 1e-7,
                                        1 - 1e-7))
            so = jnp.sin(omega)
            z = (jnp.sin((1 - t) * omega) / so * za[None]
                 + jnp.sin(t * omega) / so * zb[None])
        else:
            z = za[None] * (1 - t) + zb[None] * t
        if self.conditional:
            y = jnp.full((steps,), int(label or 0), jnp.int32)
            return np.asarray(self._fn(self.params_g, self.state_g, z, y))
        return np.asarray(self._fn(self.params_g, self.state_g, z))

    def sample_truncated(self, n: int, seed: int = 0, threshold: float = 1.0,
                         labels=None) -> np.ndarray:
        """Truncation-trick sampling: latent coordinates are redrawn from a
        truncated normal (|z_i| <= threshold), trading diversity for sample
        fidelity (lower threshold = safer, blander samples)."""
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x72C)
        z = jax.random.truncated_normal(
            key, -threshold, threshold, (n, self.nz), jnp.float32)
        if self.conditional:
            y = (jnp.asarray(labels) if labels is not None
                 else self.labels(n, seed))
            return np.asarray(self._fn(self.params_g, self.state_g, z, y))
        return np.asarray(self._fn(self.params_g, self.state_g, z))
