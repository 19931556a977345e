"""Layer-level parity vs the reference stack (bare torch.nn, CPU).

The reference's G/D are plain Conv2d/ConvTranspose2d/BatchNorm2d stacks; we
transplant identical weights into both frameworks and require matching
outputs.  Layouts: tpugan is NHWC/HWIO, torch is NCHW; the mappings below
are the canonical transposes (documented also in tools/parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpugan.nn import BatchNorm, Conv, ConvTranspose, Dense


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("stride,padding,kernel", [(2, 1, 4), (1, 1, 3), (2, 0, 4)])
def test_conv_matches_torch(rng, stride, padding, kernel):
    n, h, w, cin, cout = 2, 16, 16, 8, 16
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    wgt = rng.standard_normal((kernel, kernel, cin, cout)).astype(np.float32) * 0.1

    layer = Conv(cin, cout, kernel, stride, padding, use_bias=False,
                 dtype=jnp.float32)
    y, _ = layer.apply({"w": jnp.asarray(wgt)}, {}, jnp.asarray(x))

    # torch conv weight: (cout, cin, kh, kw) == HWIO.transpose(3, 2, 0, 1)
    tw = torch.from_numpy(np.ascontiguousarray(wgt.transpose(3, 2, 0, 1)))
    ty = F.conv2d(_nchw(x), tw, stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ty), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,kernel,size", [(2, 1, 4, 8), (2, 0, 4, 7), (1, 0, 3, 5)])
def test_conv_transpose_matches_torch(rng, stride, padding, kernel, size):
    n, cin, cout = 2, 8, 16
    x = rng.standard_normal((n, size, size, cin)).astype(np.float32)
    wgt = rng.standard_normal((kernel, kernel, cin, cout)).astype(np.float32) * 0.1

    layer = ConvTranspose(cin, cout, kernel, stride, padding, use_bias=False,
                          dtype=jnp.float32)
    y, _ = layer.apply({"w": jnp.asarray(wgt)}, {}, jnp.asarray(x))

    # torch convT weight: (cin, cout, kh, kw) == HWIO.transpose(2, 3, 0, 1)
    tw = torch.from_numpy(np.ascontiguousarray(wgt.transpose(2, 3, 0, 1)))
    ty = F.conv_transpose2d(_nchw(x), tw, stride=stride, padding=padding)
    assert y.shape == _nhwc(ty).shape == (
        n, (size - 1) * stride - 2 * padding + kernel,
        (size - 1) * stride - 2 * padding + kernel, cout)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ty), rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch_train_and_eval(rng):
    n, h, w, c = 4, 8, 8, 16
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    scale = rng.standard_normal(c).astype(np.float32) * 0.1 + 1.0
    bias = rng.standard_normal(c).astype(np.float32) * 0.1

    bn = BatchNorm(c, dtype=jnp.float32)
    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    state = {"mean": jnp.zeros(c), "var": jnp.ones(c)}

    tbn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))

    # train mode: normalized output + running-stat updates must match
    tbn.train()
    ty = tbn(_nchw(x))
    y, new_state = bn.apply(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ty), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode: uses running stats
    tbn.eval()
    ty = tbn(_nchw(x))
    y, _ = bn.apply(params, new_state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ty), rtol=1e-4, atol=1e-4)


def test_dense_bias_and_dtype(rng):
    layer = Dense(8, 4, dtype=jnp.float32)
    p, _ = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    y, _ = layer.apply(p, {}, x)
    expect = x @ p["w"] + p["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=1e-5)


def test_bf16_layers_fp32_params(rng):
    """Precision policy: params fp32; activations bf16; BN stats fp32."""
    conv = Conv(8, 16, dtype=jnp.bfloat16)
    p, _ = conv.init(jax.random.PRNGKey(0))
    assert p["w"].dtype == jnp.float32
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    y, _ = conv.apply(p, {}, x)
    assert y.dtype == jnp.bfloat16

    bn = BatchNorm(16, dtype=jnp.bfloat16)
    bp, bs = bn.init(jax.random.PRNGKey(1))
    yb, ns = bn.apply(bp, bs, y, train=True)
    assert yb.dtype == jnp.bfloat16
    assert ns["mean"].dtype == jnp.float32 and ns["var"].dtype == jnp.float32


def test_batchnorm_near_constant_channel_no_nan():
    """E[x²]−E[x]² cancels below −eps in fp32 for a near-constant channel
    at magnitude ~31.6 (measured: −3.9e-3); unclamped, rsqrt(var+eps)
    returns NaN and poisons the step.  The clamp keeps it at exactly 0."""
    bn = BatchNorm(1, dtype=jnp.float32)
    params, state = bn.init(jax.random.PRNGKey(0))
    x = np.full((8, 16, 16, 1), 31.6227, np.float32)
    x[0, 0, 0, 0] += 1e-4
    y, new_state = bn.apply(params, state, jnp.asarray(x), train=True)
    assert np.all(np.isfinite(np.asarray(y)))
    assert float(new_state["var"][0]) >= 0.0


def test_fused_conv_stats_var_clamped_nonnegative():
    """Same cancellation guard on the fused conv+BN-stats path."""
    from tpugan.ops.pallas_conv_stats import _xla_conv_stats

    x = np.zeros((4, 8, 8, 2), np.float32)
    w = np.zeros((4, 4, 2, 3), np.float32)
    w[0, 0, 0, 0] = 31.6227 / 8.0  # near-constant conv output channel
    x[..., 0] = 8.0
    x[0, 0, 0, 0] += 1e-3
    _, _, var = _xla_conv_stats(jnp.asarray(x), jnp.asarray(w))
    assert np.all(np.asarray(var) >= 0.0)
