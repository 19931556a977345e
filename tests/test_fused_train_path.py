"""Train-path conv+BN-stats fusion (ops.conv_bn_stats + DBlock wiring).

The custom_vjp wrapper runs the SAME backward on every backend; on CPU the
primal falls back to the XLA composition, so these tests validate exactly
the VJP math and block wiring the TPU Pallas path uses (the kernel forward
itself is chip-verified in benchmarks/probe_stats2.py and covered in
interpret mode by tests/test_pallas_kernels.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan import ops
from tpugan.models.blocks import DBlock
from tpugan.ops.pallas_conv_stats import _xla_conv_stats, conv_bn_stats


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _inputs(rng, n=4, s=16, cin=8, cout=16):
    x = jnp.asarray(rng.standard_normal((n, s, s, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, cin, cout)) * 0.05,
                    jnp.float32)
    return x, w


def test_conv_bn_stats_value(rng):
    x, w = _inputs(rng)
    y, m, v = conv_bn_stats(x, w)
    yr, mr, vr = _xla_conv_stats(x, w)
    np.testing.assert_allclose(y, yr, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(m, mr, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(v, vr, rtol=1e-6, atol=1e-6)


def test_conv_bn_stats_grad_matches_unfused(rng):
    """The hand-written VJP equals autodiff of the unfused composition for a
    loss that pulls on all three outputs (y, mean, var) asymmetrically."""
    x, w = _inputs(rng)
    cw = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def loss(f):
        def inner(x, w):
            y, m, v = f(x, w)
            return (jnp.sum(jnp.tanh(y) * cw) + jnp.sum(m * cw**2)
                    + jnp.sum(jnp.sqrt(v + 1.0)))
        return inner

    gx, gw = jax.grad(loss(conv_bn_stats), argnums=(0, 1))(x, w)
    gxr, gwr = jax.grad(loss(_xla_conv_stats), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gxr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw, gwr, rtol=1e-5, atol=1e-5)


def test_dblock_fused_matches_unfused(rng):
    """DBlock train forward + grads + BN running-stat update are identical
    with fusion on and off (CPU: both XLA, fused goes through custom_vjp)."""
    blk = DBlock(8, 16, batchnorm=True, dtype=jnp.float32)
    params, state = blk.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)), jnp.float32)

    def run(params):
        out, ns = blk.apply(params, state, x, train=True)
        return jnp.sum(out**2), (out, ns)

    try:
        ops.set_fuse_stats("on")
        (l1, (o1, s1)), g1 = jax.value_and_grad(run, has_aux=True)(params)
    finally:
        ops.set_fuse_stats("off")
    (l0, (o0, s0)), g0 = jax.value_and_grad(run, has_aux=True)(params)

    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    np.testing.assert_allclose(o1, o0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s1["bn"]["mean"], s0["bn"]["mean"], rtol=1e-6)
    np.testing.assert_allclose(s1["bn"]["var"], s0["bn"]["var"], rtol=1e-6)
    # fp32 BN backward is cancellation-heavy: both paths sit ~1e-3 (rel)
    # from the f64 ground truth (fused slightly closer) — compare loosely.
    for k in ("conv", "bn"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3,
                                                    atol=1e-5),
            g1[k], g0[k])


def test_train_step_fused_matches_unfused(rng):
    """Full dcgan_cifar10 train step: identical losses/params with the
    fusion on and off."""
    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import build_train_step, create_train_state

    cfg = get_preset("dcgan_cifar10").override({
        "model.ngf": 16, "model.ndf": 16, "model.nz": 16,
        "data.batch_size": 8, "train.precision": "fp32",
        "train.steps_per_call": 1, "train.ema": 0.0,
    })
    g, d = build_models(cfg.model, cfg.train.precision)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((8, 32, 32, 3)) * 0.5, jnp.float32),
        "z_d": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
        "z_g": jnp.asarray(rng.standard_normal((8, 16)), jnp.float32),
    }

    def one(mode):
        try:
            ops.set_fuse_stats(mode)
            state = create_train_state(cfg, g, d)
            step = build_train_step(cfg, g, d)
            state, m = step(state, batch)
            return state, m
        finally:
            ops.set_fuse_stats("off")

    s1, m1 = one("on")
    s0, m0 = one("off")
    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss_g"]), float(m0["loss_g"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5),
        jax.device_get(s1.params_d), jax.device_get(s0.params_d))


def test_fuse_stats_auto_off_on_cpu():
    """"auto" never enables the fusion off-TPU (no probe, no Pallas)."""
    try:
        ops.set_fuse_stats("auto")
        if jax.default_backend() != "tpu":
            assert not ops.fuse_stats_enabled()
    finally:
        ops.set_fuse_stats("off")
