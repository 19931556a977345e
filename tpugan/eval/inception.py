"""InceptionV3 (FID variant) in JAX — the true-FID feature extractor.

The reference evaluation pipeline scores FID/IS with InceptionV3 pool3
features (via pytorch-fid / torch-fidelity).  This module implements that
network functionally (NHWC, our ops seam) so the exact-FID path is fully
wired; it is *weights-gated*: this container has no network and no cached
weights, so real scores require dropping a converted weight file in place
(see ``load_weights`` for the accepted format).  Architecture follows the
canonical InceptionV3 as used for FID: 299×299 input scaled to [-1, 1],
stem → 3×InceptionA → InceptionB → 4×InceptionC → InceptionD →
2×InceptionE → global average pool → 2048-d features → fc logits(1008).

Weight file format: a pickle (or .npz) mapping OUR parameter paths
(printed by ``param_paths()``) to numpy arrays, with conv weights in HWIO
and BN params as (scale, bias, mean, var).  A converter from a pytorch-fid
``state_dict`` is provided (``convert_torch_state_dict``) — run it anywhere
torch weights are available, ship the pickle here.

Implementation notes: BN uses eps=1e-3 (torchvision inception), no conv
biases.  Branch avg-pools divide by the count of VALID (non-pad) cells,
i.e. ``count_include_pad=False`` — this matches the pytorch-fid **FID
network** (its FIDInceptionA/C/E overrides), which is the checkpoint this
module targets; stock torchvision InceptionV3 differs here
(count_include_pad=True), so do not score against torchvision-trained
weights without adjusting ``_avgpool``.  A second FID-checkpoint quirk:
Mixed_7c's pool branch is a stride-1 MAX pool (FIDInceptionE_2), not an
average pool.  Both quirks are cross-validated numerically against an
independent bare-torch twin (tpugan/parity/inception_torch.py,
tests/test_inception_parity.py).
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpugan.ops.convs import DIMS

BN_EPS = 1e-3
FEATURE_DIM = 2048
N_LOGITS = 1008  # the TF-ported FID checkpoint's class count


# ---------------------------------------------------------------------------
# functional pieces (params are dicts keyed by path)
# ---------------------------------------------------------------------------


def _conv_bn(params: Dict, path: str, x, *, stride=1, padding=0):
    """BasicConv2d: conv (no bias) + BN(eps=1e-3) + ReLU."""
    p = params[path]
    pad = padding if isinstance(padding, (tuple, list)) else (padding, padding)
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])]
        if not isinstance(pad[0], (tuple, list)) else list(pad),
        dimension_numbers=DIMS)
    y = y.astype(jnp.float32)
    inv = lax.rsqrt(p["var"] + BN_EPS) * p["scale"]
    y = (y - p["mean"]) * inv + p["bias"]
    return jax.nn.relu(y).astype(x.dtype)


def _maxpool(x, k=3, s=2):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), "VALID")


def _avgpool(x, k=3, s=1, pad=1):
    ones = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (1, k, k, 1),
                             (1, s, s, 1), [(0, 0), (pad, pad), (pad, pad),
                                            (0, 0)])
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                               (1, k, k, 1), (1, s, s, 1),
                               [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return (summed / ones).astype(x.dtype)


def _inception_a(params, path, x, pool_features):
    b1 = _conv_bn(params, f"{path}.branch1x1", x)
    b5 = _conv_bn(params, f"{path}.branch5x5_1", x)
    b5 = _conv_bn(params, f"{path}.branch5x5_2", b5, padding=2)
    b3 = _conv_bn(params, f"{path}.branch3x3dbl_1", x)
    b3 = _conv_bn(params, f"{path}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv_bn(params, f"{path}.branch3x3dbl_3", b3, padding=1)
    bp = _avgpool(x)
    bp = _conv_bn(params, f"{path}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, path, x):
    b3 = _conv_bn(params, f"{path}.branch3x3", x, stride=2)
    bd = _conv_bn(params, f"{path}.branch3x3dbl_1", x)
    bd = _conv_bn(params, f"{path}.branch3x3dbl_2", bd, padding=1)
    bd = _conv_bn(params, f"{path}.branch3x3dbl_3", bd, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, path, x):
    b1 = _conv_bn(params, f"{path}.branch1x1", x)
    b7 = _conv_bn(params, f"{path}.branch7x7_1", x)
    b7 = _conv_bn(params, f"{path}.branch7x7_2", b7, padding=(0, 3))
    b7 = _conv_bn(params, f"{path}.branch7x7_3", b7, padding=(3, 0))
    bd = _conv_bn(params, f"{path}.branch7x7dbl_1", x)
    bd = _conv_bn(params, f"{path}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _conv_bn(params, f"{path}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _conv_bn(params, f"{path}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _conv_bn(params, f"{path}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _avgpool(x)
    bp = _conv_bn(params, f"{path}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, path, x):
    b3 = _conv_bn(params, f"{path}.branch3x3_1", x)
    b3 = _conv_bn(params, f"{path}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(params, f"{path}.branch7x7x3_1", x)
    b7 = _conv_bn(params, f"{path}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _conv_bn(params, f"{path}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _conv_bn(params, f"{path}.branch7x7x3_4", b7, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, path, x, pool="avg"):
    b1 = _conv_bn(params, f"{path}.branch1x1", x)
    b3 = _conv_bn(params, f"{path}.branch3x3_1", x)
    b3a = _conv_bn(params, f"{path}.branch3x3_2a", b3, padding=(0, 1))
    b3b = _conv_bn(params, f"{path}.branch3x3_2b", b3, padding=(1, 0))
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = _conv_bn(params, f"{path}.branch3x3dbl_1", x)
    bd = _conv_bn(params, f"{path}.branch3x3dbl_2", bd, padding=1)
    bda = _conv_bn(params, f"{path}.branch3x3dbl_3a", bd, padding=(0, 1))
    bdb = _conv_bn(params, f"{path}.branch3x3dbl_3b", bd, padding=(1, 0))
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if pool == "max":
        # FIDInceptionE_2 quirk: the TF-ported FID checkpoint's *second*
        # InceptionE block (Mixed_7c) uses a stride-1 padded MAX pool in its
        # pool branch where every other Inception implementation averages.
        bp = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                               (1, 1, 1, 1),
                               [(0, 0), (1, 1), (1, 1), (0, 0)])
    else:
        bp = _avgpool(x)
    bp = _conv_bn(params, f"{path}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def forward(params: Dict, images) -> Tuple[jax.Array, jax.Array]:
    """images: (N, 299, 299, 3) float in [-1, 1] -> (pool3 2048-d, logits)."""
    x = images
    x = _conv_bn(params, "Conv2d_1a_3x3", x, stride=2)      # 149
    x = _conv_bn(params, "Conv2d_2a_3x3", x)                # 147
    x = _conv_bn(params, "Conv2d_2b_3x3", x, padding=1)     # 147
    x = _maxpool(x)                                          # 73
    x = _conv_bn(params, "Conv2d_3b_1x1", x)                # 73
    x = _conv_bn(params, "Conv2d_4a_3x3", x)                # 71
    x = _maxpool(x)                                          # 35
    x = _inception_a(params, "Mixed_5b", x, 32)              # 35x288...
    x = _inception_a(params, "Mixed_5c", x, 64)
    x = _inception_a(params, "Mixed_5d", x, 64)
    x = _inception_b(params, "Mixed_6a", x)                  # 17
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, blk, x)
    x = _inception_d(params, "Mixed_7a", x)                  # 8
    x = _inception_e(params, "Mixed_7b", x)
    x = _inception_e(params, "Mixed_7c", x, pool="max")      # 8x8x2048
    feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))      # (N, 2048)
    logits = feat @ params["fc"]["w"] + params["fc"]["b"]
    return feat, logits


def resize_to_299(images) -> jax.Array:
    """Bilinear resize NHWC float images to 299x299 (the FID convention)."""
    n, h, w, c = images.shape
    return jax.image.resize(images, (n, 299, 299, c), method="bilinear")


# ---------------------------------------------------------------------------
# parameter construction / loading
# ---------------------------------------------------------------------------

# (path, cin, cout, kh, kw) for every conv; generated from the architecture
def _conv_defs() -> List[Tuple[str, int, int, int, int]]:
    defs = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]

    def a_block(path, cin, pool):
        return [
            (f"{path}.branch1x1", cin, 64, 1, 1),
            (f"{path}.branch5x5_1", cin, 48, 1, 1),
            (f"{path}.branch5x5_2", 48, 64, 5, 5),
            (f"{path}.branch3x3dbl_1", cin, 64, 1, 1),
            (f"{path}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{path}.branch3x3dbl_3", 96, 96, 3, 3),
            (f"{path}.branch_pool", cin, pool, 1, 1),
        ]

    defs += a_block("Mixed_5b", 192, 32)
    defs += a_block("Mixed_5c", 256, 64)
    defs += a_block("Mixed_5d", 288, 64)
    defs += [
        ("Mixed_6a.branch3x3", 288, 384, 3, 3),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3),
    ]

    def c_block(path, c7):
        return [
            (f"{path}.branch1x1", 768, 192, 1, 1),
            (f"{path}.branch7x7_1", 768, c7, 1, 1),
            (f"{path}.branch7x7_2", c7, c7, 1, 7),
            (f"{path}.branch7x7_3", c7, 192, 7, 1),
            (f"{path}.branch7x7dbl_1", 768, c7, 1, 1),
            (f"{path}.branch7x7dbl_2", c7, c7, 7, 1),
            (f"{path}.branch7x7dbl_3", c7, c7, 1, 7),
            (f"{path}.branch7x7dbl_4", c7, c7, 7, 1),
            (f"{path}.branch7x7dbl_5", c7, 192, 1, 7),
            (f"{path}.branch_pool", 768, 192, 1, 1),
        ]

    defs += c_block("Mixed_6b", 128)
    defs += c_block("Mixed_6c", 160)
    defs += c_block("Mixed_6d", 160)
    defs += c_block("Mixed_6e", 192)
    defs += [
        ("Mixed_7a.branch3x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch3x3_2", 192, 320, 3, 3),
        ("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7),
        ("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1),
        ("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3),
    ]

    def e_block(path, cin):
        return [
            (f"{path}.branch1x1", cin, 320, 1, 1),
            (f"{path}.branch3x3_1", cin, 384, 1, 1),
            (f"{path}.branch3x3_2a", 384, 384, 1, 3),
            (f"{path}.branch3x3_2b", 384, 384, 3, 1),
            (f"{path}.branch3x3dbl_1", cin, 448, 1, 1),
            (f"{path}.branch3x3dbl_2", 448, 384, 3, 3),
            (f"{path}.branch3x3dbl_3a", 384, 384, 1, 3),
            (f"{path}.branch3x3dbl_3b", 384, 384, 3, 1),
            (f"{path}.branch_pool", cin, 192, 1, 1),
        ]

    defs += e_block("Mixed_7b", 1280)
    defs += e_block("Mixed_7c", 2048)
    return defs


def param_paths() -> List[str]:
    return [d[0] for d in _conv_defs()] + ["fc"]


def init_random(seed: int = 0) -> Dict:
    """Random-weight instance (shape/flow testing; NOT a trained network)."""
    key = jax.random.PRNGKey(seed)
    params: Dict = {}
    for (path, cin, cout, kh, kw) in _conv_defs():
        key, k = jax.random.split(key)
        params[path] = {
            "w": jax.random.normal(k, (kh, kw, cin, cout), jnp.float32)
            / np.sqrt(kh * kw * cin),
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        }
    key, k = jax.random.split(key)
    params["fc"] = {
        "w": jax.random.normal(k, (FEATURE_DIM, N_LOGITS), jnp.float32)
        / np.sqrt(FEATURE_DIM),
        "b": jnp.zeros((N_LOGITS,), jnp.float32),
    }
    return params


def load_weights(path: str) -> Dict:
    """Load a converted weight file (pickle/npz of {our-path: arrays})."""
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        nested: Dict = {}
        for k, v in flat.items():
            mod, leaf = k.rsplit("/", 1)
            nested.setdefault(mod, {})[leaf] = jnp.asarray(v)
        return nested
    with open(path, "rb") as f:
        raw = pickle.load(f)
    return jax.tree.map(jnp.asarray, raw)


def convert_torch_state_dict(state_dict) -> Dict:
    """Convert a pytorch-fid/torchvision InceptionV3 state_dict (numpy-fied)
    to this module's format.  Run where torch weights exist; pickle the
    result and point eval.inception_weights at it.

    Mapping: '<block>.conv.weight' (O,I,H,W) -> w HWIO;
    '<block>.bn.{weight,bias,running_mean,running_var}' -> scale/bias/mean/
    var; 'fc.weight' (1008, 2048) -> w.T, 'fc.bias' -> b.
    """
    out: Dict = {}
    for (path, cin, cout, kh, kw) in _conv_defs():
        w = np.asarray(state_dict[f"{path}.conv.weight"])
        out[path] = {
            "w": w.transpose(2, 3, 1, 0),
            "scale": np.asarray(state_dict[f"{path}.bn.weight"]),
            "bias": np.asarray(state_dict[f"{path}.bn.bias"]),
            "mean": np.asarray(state_dict[f"{path}.bn.running_mean"]),
            "var": np.asarray(state_dict[f"{path}.bn.running_var"]),
        }
    out["fc"] = {"w": np.asarray(state_dict["fc.weight"]).T,
                 "b": np.asarray(state_dict["fc.bias"])}
    return out
