"""Feature / probability extractors for FID & IS.

Two backends behind one interface:

- ``inception``: the real InceptionV3 pool3 features the reference pipeline
  uses (via pytorch-fid / torch-fidelity).  This container has no network and
  no cached weights, so this path is *weights-gated*: point
  ``eval.inception_weights`` at a pickle of
  ``{"params": pytree, "apply": ...}``-compatible arrays to enable it; until
  then requesting it raises with a clear message.
- ``proxy``: a deterministic, seeded random-feature CNN (strided convs +
  leaky-relu + global pooling + a random classifier head).  Random
  convolutional features are a recognized stand-in when Inception weights
  are unavailable; FID's *math* is unchanged and monotonic trends track the
  true FID for a fixed extractor.  Every run builds the identical network
  (fixed seed), so proxy-FID numbers are comparable across runs/machines.

Features are extracted on-device in batches via one jitted function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpugan import ops

_PROXY_SEED = 20260816
_PROXY_DIM = 256
_PROXY_CLASSES = 16  # trained-head classes (synthetic color-phase classes)


def _proxy_params(channels: int):
    """Fixed random conv stack: (C,32) s2 → (32,64) s2 → (64,128) s2 →
    (128, PROXY_DIM) s2, then a TRAINED (PROXY_DIM, PROXY_CLASSES) head.

    The conv features stay random (the recognized FID stand-in — relative
    feature distances are what FID needs); the classifier head is fit once,
    deterministically, by softmax regression on a seeded labeled synthetic
    set (see _train_proxy_head).  An UNTRAINED head's softmax ranks nothing
    — IS over it was a number with no meaning — whereas the trained head
    makes proxy-IS rank class coverage/confidence at least monotonically:
    a collapsed generator (one class) scores ~1, a diverse confident one
    scores toward PROXY_CLASSES.  Only the 'inception' backend reproduces
    the reference's actual IS.
    """
    key = jax.random.PRNGKey(_PROXY_SEED)
    chans = [channels, 32, 64, 128, _PROXY_DIM]
    params = []
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
        key, k = jax.random.split(key)
        # orthogonal-ish scaling keeps activations in range through depth
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
        w = w / jnp.sqrt(9 * cin)
        params.append(w)
    head = _train_proxy_head(params, channels)
    return params, head


def _proxy_features(convs, x):
    h = x
    for w in convs:
        h = ops.conv2d(h, w, stride=2, padding=1)
        h = jax.nn.leaky_relu(h, 0.2)
    return jnp.mean(h, axis=(1, 2))  # global average pool -> (N, D)


def _train_proxy_head(convs, channels: int, n: int = 2048,
                      image_size: int = 64, steps: int = 300):
    """Softmax regression of the synthetic class labels on the frozen
    random conv features — fully seeded, offline, a few seconds once per
    process (the extractor is cached).  Full-batch GD with momentum; the
    bias folds into the weight via a constant feature."""
    from tpugan.data.datasets import make_synthetic

    data = make_synthetic(image_size, channels, n, seed=_PROXY_SEED,
                          n_classes=_PROXY_CLASSES)
    x = jnp.asarray(data["images"], jnp.float32) / 127.5 - 1.0
    y = jnp.asarray(data["labels"])
    feats = jax.jit(_proxy_features)(convs, x)
    # standardize so one LR suits all channel configs
    mu, sd = feats.mean(0), feats.std(0) + 1e-6
    fz = (feats - mu) / sd

    def loss(w):
        logits = fz @ w
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))

    grad = jax.jit(jax.grad(loss))
    w = jnp.zeros((_PROXY_DIM, _PROXY_CLASSES), jnp.float32)
    v = jnp.zeros_like(w)
    for _ in range(steps):
        g = grad(w)
        v = 0.9 * v - 0.5 * g
        w = w + v
    # fold the standardization into the head so inference is one matmul
    # on RAW pooled features: logits = ((f - mu)/sd) @ w = f @ (w/sd) - mu…
    # the constant shift is absorbed per-class.
    w_raw = w / sd[:, None]
    b = -(mu / sd) @ w
    return np.asarray(w_raw), np.asarray(b)


from tpugan.utils.cache import BoundedCache  # noqa: E402

# inception params are ~100 MB each — bound, not leak
_EXTRACTOR_CACHE = BoundedCache(maxsize=4)


def make_extractor(channels: int, backend: str = "proxy",
                   weights_path: str = ""):
    """Return f(images_f32 in [-1,1], NHWC) -> (features, probs) on host.

    Cached (bounded LRU) per (channels, backend, weights_path) so repeated
    eval calls (e.g. every ``train.eval_every``) reuse the compiled
    feature network."""
    key = (channels, backend, weights_path)
    fn = _EXTRACTOR_CACHE.get(key)
    if fn is None:
        fn = _make_extractor(channels, backend, weights_path)
        _EXTRACTOR_CACHE.put(key, fn)
    return fn


def _make_extractor(channels: int, backend: str, weights_path: str):
    if backend == "inception":
        from tpugan.eval import inception

        if not weights_path:
            raise FileNotFoundError(
                "InceptionV3 weights unavailable in this offline container; "
                "set eval.inception_weights to a converted weight file "
                "(see eval/inception.py convert_torch_state_dict) or use "
                "the 'proxy' backend")
        params = inception.load_weights(weights_path)

        @jax.jit
        def extract_inc(x):
            if x.shape[-1] == 1:
                # grayscale -> RGB, as pytorch-fid does (InceptionV3's first
                # conv is 3-channel; without the tile 1-channel eval crashes
                # mid-training on a conv channel mismatch)
                x = jnp.repeat(x, 3, axis=-1)
            x = inception.resize_to_299(x.astype(jnp.float32))
            feat, logits = inception.forward(params, x)
            return feat, jax.nn.softmax(logits, axis=-1)

        def run_inc(images: np.ndarray, batch: int = 64):
            feats, probs = [], []
            for s in range(0, len(images), batch):
                f, p = extract_inc(jnp.asarray(images[s:s + batch],
                                               jnp.float32))
                feats.append(np.asarray(f))
                probs.append(np.asarray(p))
            return np.concatenate(feats), np.concatenate(probs)

        return run_inc
    if backend != "proxy":
        raise ValueError(f"unknown eval feature backend {backend!r}")

    convs, (head_w, head_b) = _proxy_params(channels)

    @jax.jit
    def extract(x):
        feat = _proxy_features(convs, x)
        logits = feat @ head_w + head_b
        return feat, jax.nn.softmax(logits, axis=-1)

    def run(images: np.ndarray, batch: int = 256):
        feats, probs = [], []
        for s in range(0, len(images), batch):
            f, p = extract(jnp.asarray(images[s:s + batch], jnp.float32))
            feats.append(np.asarray(f))
            probs.append(np.asarray(p))
        return np.concatenate(feats), np.concatenate(probs)

    return run
