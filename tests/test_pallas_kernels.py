"""Pallas kernels vs pure-XLA reference (interpret mode on CPU).

The compiled Mosaic path is exercised on the real chip by bench.py; these
tests pin the kernel *math*: phase-decomposed transpose conv, parity-plane
strided conv, fused affine+activation epilogues, and the whole-generator
megakernel against an identical-math XLA graph.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.ops import pallas_conv, pallas_convt, pallas_gen
from tpugan.ops.convs import conv2d as xla_conv
from tpugan.ops.convs import conv_transpose2d as xla_convt


@pytest.mark.parametrize("n,h,cin,cout", [(4, 4, 32, 16), (2, 8, 16, 8),
                                          (3, 16, 8, 8)])
def test_pallas_convt_matches_xla(rng, n, h, cin, cout):
    x = jnp.asarray(rng.standard_normal((n, h, h, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)
    ref = xla_convt(x, w, stride=2, padding=1, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = pallas_convt.conv_transpose2d(x, w, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_convt_fused_epilogue(rng):
    n, h, cin, cout = 2, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((n, h, h, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)
    a = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = jax.nn.relu(
        np.asarray(xla_convt(x, w, stride=2, padding=1, impl="xla")) * a + b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_convt.convt_affine_act(x, w, a, b, act="relu",
                                            out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,h,cin,cout", [(4, 8, 16, 32), (2, 32, 3, 16)])
def test_pallas_conv_matches_xla(rng, n, h, cin, cout):
    x = jnp.asarray(rng.standard_normal((n, h, h, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)
    ref = xla_conv(x, w, stride=2, padding=1, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = pallas_conv.conv2d(x, w, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_conv_fused_leaky(rng):
    n, h, cin, cout = 2, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((n, h, h, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)
    a = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = jax.nn.leaky_relu(
        np.asarray(xla_conv(x, w, stride=2, padding=1, impl="xla")) * a + b,
        0.2)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_conv.conv_affine_act(x, w, a, b, act="leaky_relu",
                                          out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_unsupported_shapes_return_none(rng):
    x = jnp.zeros((2, 8, 8, 4))
    w3 = jnp.zeros((3, 3, 4, 8))
    assert pallas_convt.conv_transpose2d(x, w3, stride=2, padding=1) is None
    assert pallas_conv.conv2d(x, w3, stride=2, padding=1) is None
    w4 = jnp.zeros((4, 4, 4, 8))
    assert pallas_convt.conv_transpose2d(x, w4, stride=1, padding=1) is None


def test_generator_megakernel_matches_folded_xla(rng):
    """Whole-G megakernel == identical-math XLA graph (bf16 tolerance)."""
    from tpugan.ops.convs import conv_transpose2d

    cfg = get_preset("dcgan_celeba64").override(
        {"model.ngf": 16, "model.ndf": 16})
    g, _ = build_models(cfg.model, "fp32")
    params, state = g.init(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.standard_normal((8, cfg.model.nz)).astype(np.float32))
    _, state = g.apply(params, state, z, train=True)  # realistic BN stats

    (wh, ah, bh), blocks, (s0, c0) = pallas_gen.fold_generator(
        g, params, state)

    def xla_folded(zz):
        h = jnp.dot(zz.astype(jnp.bfloat16), wh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = h * ah + bh
        x = jax.nn.relu(h).reshape(-1, s0, s0, c0).astype(jnp.bfloat16)
        for i, (w, a, b) in enumerate(blocks):
            y = conv_transpose2d(x, w.astype(jnp.bfloat16), stride=2,
                                 padding=1, impl="xla")
            y = y.astype(jnp.float32) * a + b
            y = jnp.tanh(y) if i == len(blocks) - 1 else jax.nn.relu(y)
            x = y.astype(jnp.bfloat16)
        return x.astype(jnp.float32)

    ref = np.asarray(xla_folded(z))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_gen.generator_forward(
            g, params, state, z, out_dtype=jnp.float32))
    assert got.shape == (8, 64, 64, 3)
    err = np.abs(ref - got)
    # identical math up to matmul ordering; tanh slope amplifies bf16 ulps
    assert np.percentile(err, 99.9) < 1e-2
    assert err.mean() < 1e-4


def test_fold_generator_no_batchnorm(rng):
    """g_batchnorm=False: the Dense head bias is already full-size
    (s0*s0*c0) and block affines come from ConvT biases — folding used to
    re-tile the head bias into an s0^2-times-too-long affine and KeyError
    on the missing block 'bn', silently losing the Pallas path for all
    no-BN generators (the 256px SN-D recipe's G is the BN case, but
    model.g_batchnorm is a supported flag)."""
    cfg = get_preset("dcgan_celeba64").override(
        {"model.ngf": 16, "model.ndf": 16, "model.g_batchnorm": False})
    g, _ = build_models(cfg.model, "fp32")
    params, state = g.init(jax.random.PRNGKey(0))
    (wh, ah, bh), blocks, (s0, c0) = pallas_gen.fold_generator(
        g, params, state)
    assert ah.shape == bh.shape == (s0 * s0 * c0,)
    for w, a, b in blocks:
        assert a.shape == b.shape == (w.shape[-1],)
    # and the folded XLA math still reproduces the real eval forward
    z = jnp.asarray(rng.standard_normal((4, cfg.model.nz)).astype(np.float32))
    ref, _ = g.apply(params, state, z, train=False)

    def xla_folded(zz):
        h = jnp.dot(zz, wh, precision=jax.lax.Precision.HIGHEST)
        h = h * ah + bh
        x = jax.nn.relu(h).reshape(-1, s0, s0, c0)
        for i, (w, a, b) in enumerate(blocks):
            from tpugan.ops.convs import conv_transpose2d

            y = conv_transpose2d(x, w, stride=2, padding=1, impl="xla")
            y = y * a + b
            x = jnp.tanh(y) if i == len(blocks) - 1 else jax.nn.relu(y)
        return x

    np.testing.assert_allclose(np.asarray(xla_folded(z)), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_megakernel_matches_eval_apply_close(rng):
    """Megakernel vs the real eval path at realistic weight scale."""
    cfg = get_preset("dcgan_celeba64").override(
        {"model.ngf": 16, "model.ndf": 16})
    g, _ = build_models(cfg.model, "bf16")
    params, state = g.init(jax.random.PRNGKey(2))
    z = jnp.asarray(rng.standard_normal((4, cfg.model.nz)).astype(np.float32))
    _, state = g.apply(params, state, z, train=True)

    ref = np.asarray(g.apply(params, state, z, train=False)[0], np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_gen.generator_forward(
            g, params, state, z, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=5e-2)


@pytest.mark.parametrize("preset,size", [("dcgan_celeba64", 64),
                                         ("dcgan_cifar10", 32),
                                         ("dcgan_mnist", 28)])
def test_megakernel_v2_matches_eval_apply(rng, preset, size):
    """Phase-separated megakernel (pallas_gen2) == eval apply — all three
    base grids (4x4 color families and the 7x7 MNIST head)."""
    from tpugan.ops import pallas_gen2

    cfg = get_preset(preset).override({"model.ngf": 16, "model.ndf": 16})
    g, _ = build_models(cfg.model, "bf16")
    params, state = g.init(jax.random.PRNGKey(2))
    z = jnp.asarray(rng.standard_normal((8, cfg.model.nz)).astype(np.float32))
    _, state = g.apply(params, state, z, train=True)  # realistic BN stats

    ref = np.asarray(g.apply(params, state, z, train=False)[0], np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_gen2.generator_forward(
            g, params, state, z, out_dtype=jnp.float32))
    assert got.shape == (8, size, size, cfg.model.channels)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_megakernel_v2_unsupported_returns_none(rng):
    """Malformed params -> v2 declines (None), caller falls back."""
    from tpugan.ops import pallas_gen2

    cfg = get_preset("dcgan_mnist").override({"model.ngf": 8, "model.ndf": 8})
    g, _ = build_models(cfg.model, "fp32")
    z = jnp.zeros((2, cfg.model.nz), jnp.float32)
    assert pallas_gen2.generator_forward(g, {}, {}, z) is None


def test_megakernel_v2_conditional(rng):
    """cDCGAN: embedding folds outside the kernel; matches eval apply."""
    from tpugan.ops import pallas_gen2

    cfg = get_preset("cdcgan_celeba64").override(
        {"model.ngf": 8, "model.ndf": 8, "model.nz": 8, "model.embed_dim": 4})
    g, _ = build_models(cfg.model, "bf16")
    params, state = g.init(jax.random.PRNGKey(3))
    z = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    y = jnp.asarray([0, 1, 1, 0], jnp.int32)
    _, state = g.apply(params, state, (z, y), train=True)

    ref = np.asarray(g.apply(params, state, (z, y), train=False)[0],
                     np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_gen2.generator_forward(
            g, params, state, z, out_dtype=jnp.float32, y=y))
    assert got.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(got, ref, atol=5e-4)
    # missing labels -> decline (None)
    assert pallas_gen2.generator_forward(g, params, state, z) is None


def test_conv_stats_fused(rng):
    """One-pass conv + BN batch statistics == XLA conv + separate reduce."""
    from tpugan.ops.pallas_conv_stats import conv_stats

    n, h, cin, cout = 6, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((n, h, h, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)

    ref = np.asarray(xla_conv(x, w, stride=2, padding=1, impl="xla"))
    ref_mean = ref.mean(axis=(0, 1, 2))
    ref_var = ref.var(axis=(0, 1, 2))

    with pltpu.force_tpu_interpret_mode():
        y, mean, var = conv_stats(x, w, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), ref_var, rtol=1e-3,
                               atol=1e-5)
    # unsupported shapes decline
    assert conv_stats(x, jnp.zeros((3, 3, cin, cout))) is None
