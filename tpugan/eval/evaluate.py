"""End-to-end FID/IS evaluation of a generator checkpoint.

Reproduces the reference evaluation pipeline: generate N seeded images,
extract features/probits for the generated and real sets with the same
network, compute FID and IS.  Real-set features are cached per (dataset,
backend) in memory for repeated eval calls during training.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

from tpugan.utils.cache import BoundedCache

import numpy as np

from tpugan.configs import Config
from tpugan.data import load_dataset
from tpugan.eval.features import make_extractor
from tpugan.eval.fid import (
    fid_from_features,
    inception_score,
    kid_from_features,
    prdc_from_features,
)
from tpugan.sample import Sampler

# Bounded LRU: each entry is ~fid_n x 2048 floats (~80 MB at defaults), and a
# long-lived process may evaluate several datasets/slices — cap, don't leak.
_REAL_FEAT_CACHE = BoundedCache(maxsize=4)
_cache_get = _REAL_FEAT_CACHE.get
_cache_put = _REAL_FEAT_CACHE.put


def _array_fingerprint(a: np.ndarray) -> tuple:
    """Cheap identity for a real-image set: shape/dtype + head/tail bytes.

    Lets repeated in-training eval calls (the trainer passes the same
    ``data["images"][:n]`` slice every eval point) hit the feature cache
    instead of re-extracting 10k real features each time."""
    flat = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
    h = hashlib.sha1()
    h.update(repr((a.shape, str(a.dtype))).encode())
    h.update(flat[:65536].tobytes())
    h.update(flat[-65536:].tobytes())
    return (a.shape, h.hexdigest())


def evaluate(cfg: Config, g, params_g, state_g, *, seed: int = 0,
             real_images: Optional[np.ndarray] = None) -> Dict[str, float]:
    extractor = make_extractor(cfg.model.channels, cfg.eval.metric,
                               cfg.eval.inception_weights)
    n = cfg.eval.fid_n
    bs = cfg.eval.fid_batch

    sampler = Sampler(cfg, g, params_g, state_g)
    fake = sampler.sample(n, seed=seed, batch_size=bs)  # [-1,1] f32
    feat_fake, probs_fake = extractor(fake, batch=bs)

    if real_images is None:
        # The key must pin EVERYTHING that changes either the real set or
        # the extractor: channels picks a different (random-net) extractor
        # with the same 256-dim output shape, and data_dir / the synthetic
        # (seed, size, n_classes) change the images behind the same dataset
        # name — a collision would silently compare features from two
        # different embedding spaces.
        key = ("dataset", cfg.data.dataset, cfg.data.data_dir,
               cfg.model.image_size, cfg.model.channels,
               cfg.data.synthetic_size, cfg.train.seed, cfg.model.n_classes,
               cfg.eval.metric, cfg.eval.inception_weights, n)
        if _cache_get(key) is None:
            data = load_dataset(
                cfg.data.dataset, cfg.data.data_dir,
                image_size=cfg.model.image_size, channels=cfg.model.channels,
                synthetic_size=cfg.data.synthetic_size, seed=cfg.train.seed,
                n_classes=cfg.model.n_classes,
                # honor the config's host-memory contract: a forced- or
                # auto-streaming folder dataset decodes only the n images
                # sliced below, not the whole folder
                streaming=cfg.data.streaming, max_ram_mb=cfg.data.max_ram_mb)
            imgs = data["images"]
            if hasattr(imgs, "gather"):  # streaming: decode just the slice
                imgs = np.asarray(imgs[:n])
            real_images = imgs[:n].astype(np.float32) / 127.5 - 1.0
    elif hasattr(real_images, "fingerprint"):
        # Streaming dataset: key on its identity BEFORE decoding anything —
        # a cache hit costs zero JPEG decodes (the production
        # streaming + keep_best combination evaluates every eval_every tick).
        key = ("stream", real_images.fingerprint(), min(n, len(real_images)),
               cfg.model.channels,
               cfg.eval.metric, cfg.eval.inception_weights)
        if _cache_get(key) is None:
            real_images = np.asarray(
                real_images[:n], np.float32) / 127.5 - 1.0
    else:
        real_images = np.asarray(real_images)[:n]
        key = ("passed", _array_fingerprint(real_images),
               cfg.model.channels,
               cfg.eval.metric, cfg.eval.inception_weights)
        if _cache_get(key) is None:
            real_images = real_images.astype(np.float32)
            if real_images.max() > 1.5:  # uint8-range input
                real_images = real_images / 127.5 - 1.0

    feat_real = _cache_get(key)
    if feat_real is None:
        feat_real, _ = extractor(real_images, batch=bs)
        _cache_put(key, feat_real)

    if min(len(feat_real), len(feat_fake)) < 2:
        raise ValueError(
            "evaluate() needs at least 2 real and 2 fake samples (got "
            f"{len(feat_real)} real / {len(feat_fake)} fake) — FID's "
            "covariance and KID's unbiased estimator are undefined at n<2; "
            "raise eval.fid_n or pass a larger real set")
    fid = fid_from_features(feat_real, feat_fake)
    kid, kid_std = kid_from_features(feat_real, feat_fake)
    is_mean, is_std = inception_score(probs_fake)
    out = {"fid": fid, "kid": kid, "kid_std": kid_std,
           "is_mean": is_mean, "is_std": is_std,
           "n": int(len(fake)), "backend": cfg.eval.metric}
    if cfg.eval.prdc:
        out.update(prdc_from_features(feat_real, feat_fake))
    return out


def evaluate_folders(path_a: str, path_b: str, *, image_size: int = 64,
                     channels: int = 3, metric: str = "proxy",
                     inception_weights: str = "", n: int = 0,
                     batch: int = 256, prdc: bool = False) -> Dict[str, float]:
    """FID/KID between two image FOLDERS — the reference-era two-set
    workflow (``pytorch-fid path_a path_b``), generator-free.

    Both folders are decoded at one geometry (center-crop + resize to
    ``image_size``, sorted file order — tpugan/data/datasets.py::
    load_image_folder) and featured with the same extractor, so the number
    is symmetric in its inputs up to FID's real/fake asymmetry-free form.
    ``metric="inception"`` + ``inception_weights`` gives exact pytorch-fid
    features (the network resizes to 299 internally); the default proxy
    backend is the deterministic offline stand-in (relative distances
    only — see eval/features.py).  No IS is reported: neither folder is
    designated "generated", and IS needs class probabilities of one set.
    """
    from tpugan.data.datasets import load_image_folder

    a = load_image_folder(path_a, image_size, channels, limit=n)
    b = load_image_folder(path_b, image_size, channels, limit=n)
    if min(len(a), len(b)) < 2:
        raise ValueError(
            f"evaluate_folders needs >=2 images per side (got {len(a)} in "
            f"{path_a!r}, {len(b)} in {path_b!r})")
    extractor = make_extractor(channels, metric, inception_weights)
    feat_a, _ = extractor(a.astype(np.float32) / 127.5 - 1.0, batch=batch)
    feat_b, _ = extractor(b.astype(np.float32) / 127.5 - 1.0, batch=batch)
    kid, kid_std = kid_from_features(feat_a, feat_b)
    out = {"fid": fid_from_features(feat_a, feat_b),
           "kid": kid, "kid_std": kid_std,
           "n_a": int(len(a)), "n_b": int(len(b)), "backend": metric}
    if prdc:
        out.update(prdc_from_features(feat_a, feat_b))
    return out
