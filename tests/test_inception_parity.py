"""Numerical cross-validation of the JAX FID-InceptionV3 vs a bare-torch twin.

The exact-FID path (tpugan/eval/inception.py) is the judged metric's feature
extractor; until trained weights exist offline, *this* is the proof that the
implementation is numerically right: an independently-written torch twin
(tpugan/parity/inception_torch.py — own channel constants, torch.nn NCHW)
is randomly initialized with non-trivial BN stats, its weights transplanted
into the JAX net, and both must agree on features/logits.

Default-suite tests cover each Inception block kind individually (cheap CPU
compiles, catches padding / pooling / BN-math bugs per block — including the
two FID-checkpoint quirks: count_include_pad=False avg pools and Mixed_7c's
max-pool branch).  Full-network tests run end-to-end at 299x299 through the
production ``convert_torch_state_dict`` converter, plus the resize_to_299
path from 32/64/128 inputs — all in the default suite.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpugan.eval import inception
from tpugan.parity import inception_torch as twin


def _to_jax_params(state_dict, n_logits=1008):
    """Minimal state_dict->params converter for *block-level* transplants
    (full-net tests use the production inception.convert_torch_state_dict)."""
    params = {}
    for k, v in state_dict.items():
        v = np.asarray(v.detach() if hasattr(v, "detach") else v)
        if k == "fc.weight":
            params.setdefault("fc", {})["w"] = v.T
        elif k == "fc.bias":
            params.setdefault("fc", {})["b"] = v
        elif k.endswith(".conv.weight"):
            path = k[: -len(".conv.weight")]
            params.setdefault(path, {})["w"] = v.transpose(2, 3, 1, 0)
        elif k.endswith(".bn.weight"):
            params.setdefault(k[: -len(".bn.weight")], {})["scale"] = v
        elif k.endswith(".bn.bias"):
            params.setdefault(k[: -len(".bn.bias")], {})["bias"] = v
        elif k.endswith(".bn.running_mean"):
            params.setdefault(k[: -len(".bn.running_mean")], {})["mean"] = v
        elif k.endswith(".bn.running_var"):
            params.setdefault(k[: -len(".bn.running_var")], {})["var"] = v
        # ignore num_batches_tracked
    return {p: {leaf: jnp.asarray(a) for leaf, a in d.items()}
            for p, d in params.items()}


_randomize_bn = twin.randomize_bn


def _compare_block(torch_block, jax_fn, path, cin, hw, seed, rtol=2e-5,
                   atol=2e-5):
    """Transplant torch_block's weights under `path`, run both on the same
    input, assert element-wise agreement."""
    _randomize_bn(torch_block, seed)
    prefixed = {f"{path}.{k}": v for k, v in torch_block.state_dict().items()}
    params = _to_jax_params(prefixed)

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
    with torch.no_grad():
        y_t = torch_block(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_j = np.asarray(jax_fn(params, jnp.asarray(x)))
    np.testing.assert_allclose(
        y_j, np.asarray(y_t).transpose(0, 2, 3, 1), rtol=rtol, atol=atol)


class TestBlockParity:
    def test_basic_conv_bn(self):
        blk = twin.BasicConv2d(8, 16, 3, stride=2)
        torch.manual_seed(1)
        with torch.no_grad():
            blk.conv.weight.normal_(0, 0.1)
        _compare_block(blk, lambda p, x: inception._conv_bn(p, "b", x, stride=2),
                       "b", 8, 11, seed=1)

    def test_inception_a(self):
        torch.manual_seed(2)
        _compare_block(twin.InceptionA(192, pool_features=32),
                       lambda p, x: inception._inception_a(p, "Mixed_5b", x, 32),
                       "Mixed_5b", 192, 9, seed=2)

    def test_inception_b(self):
        torch.manual_seed(3)
        _compare_block(twin.InceptionB(288),
                       lambda p, x: inception._inception_b(p, "Mixed_6a", x),
                       "Mixed_6a", 288, 9, seed=3)

    def test_inception_c(self):
        torch.manual_seed(4)
        _compare_block(twin.InceptionC(768, c7=128),
                       lambda p, x: inception._inception_c(p, "Mixed_6b", x),
                       "Mixed_6b", 768, 9, seed=4)

    def test_inception_d(self):
        torch.manual_seed(5)
        _compare_block(twin.InceptionD(768),
                       lambda p, x: inception._inception_d(p, "Mixed_7a", x),
                       "Mixed_7a", 768, 9, seed=5)

    def test_inception_e_avg(self):
        torch.manual_seed(6)
        _compare_block(twin.InceptionE(1280, pool_mode="avg"),
                       lambda p, x: inception._inception_e(p, "Mixed_7b", x),
                       "Mixed_7b", 1280, 8, seed=6)

    def test_inception_e_max_quirk(self):
        """Mixed_7c: FID checkpoint's max-pool branch (FIDInceptionE_2)."""
        torch.manual_seed(7)
        _compare_block(
            twin.InceptionE(2048, pool_mode="max"),
            lambda p, x: inception._inception_e(p, "Mixed_7c", x, pool="max"),
            "Mixed_7c", 2048, 8, seed=7)

    def test_avg_pool_excludes_padding(self):
        """The count_include_pad=False subtlety in isolation: corners divide
        by 4 valid cells, not 9."""
        x = np.ones((1, 5, 5, 1), np.float32)
        y = np.asarray(inception._avgpool(jnp.asarray(x)))
        np.testing.assert_allclose(y, 1.0, atol=1e-6)
        y_t = twin._fid_avg_pool(torch.ones(1, 1, 5, 5)).numpy()
        np.testing.assert_allclose(y_t, 1.0, atol=1e-6)


def test_resize_parity():
    """jax.image.resize bilinear == torch F.interpolate(align_corners=False)
    for the FID upsample geometry, at every reference input size."""
    rng = np.random.default_rng(0)
    for size in (28, 32, 64, 128):
        x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
        y_j = np.asarray(inception.resize_to_299(jnp.asarray(x)))
        y_t = twin.resize_to_299_torch(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(
            y_j, y_t.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5,
            err_msg=f"resize {size}->299 diverges")


def test_full_net_transplant_299():
    """End-to-end: random torch twin -> production converter -> JAX forward;
    pool3 features and logits must agree at 299x299."""
    net = twin.make_random_twin(seed=0)
    sd = {k: np.asarray(v) for k, v in net.state_dict().items()}
    params = inception.convert_torch_state_dict(sd)
    params = {p: {k: jnp.asarray(a) for k, a in d.items()}
              for p, d in params.items()}

    rng = np.random.default_rng(42)
    x = (rng.uniform(-1, 1, (2, 299, 299, 3))).astype(np.float32)
    with torch.no_grad():
        feat_t, logits_t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feat_j, logits_j = inception.forward(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size", [32, 64, 128])
def test_full_net_transplant_resized(size):
    """The actual eval geometry: small [-1,1] images resized to 299 in each
    framework's own resize, then scored; features must still agree."""
    net = twin.make_random_twin(seed=1)
    sd = {k: np.asarray(v) for k, v in net.state_dict().items()}
    params = inception.convert_torch_state_dict(sd)
    params = {p: {k: jnp.asarray(a) for k, a in d.items()}
              for p, d in params.items()}

    rng = np.random.default_rng(size)
    x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        feat_t, _ = net(twin.resize_to_299_torch(
            torch.from_numpy(x.transpose(0, 3, 1, 2))))
    feat_j, _ = inception.forward(
        params, inception.resize_to_299(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # full-Inception CPU compile (~70s) — the slow tier's
# charter; the per-block/full-net transplant parity stays default
def test_cli_convert_inception_roundtrip(tmp_path):
    """tpugan convert-inception: torch .pth -> pickle -> extractor scores
    match the torch twin (the full offline exact-FID workflow)."""
    from tpugan.cli import main
    from tpugan.eval.features import make_extractor

    net = twin.make_random_twin(seed=3)
    src = str(tmp_path / "fid_inception.pth")
    torch.save(net.state_dict(), src)
    out = str(tmp_path / "inception_fid.pkl")
    main(["convert-inception", "--src", src, "--out", out])

    run = make_extractor(3, "inception", out)
    rng = np.random.default_rng(9)
    imgs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    feat, probs = run(imgs, batch=2)
    with torch.no_grad():
        feat_t, _ = net(twin.resize_to_299_torch(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(feat, feat_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
