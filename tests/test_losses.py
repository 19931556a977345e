"""Loss closed-form checks + the gradient penalty on analytic functions."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpugan.losses import d_loss_fn, g_loss_fn, gradient_penalty


def test_bce_matches_torch_bce_with_logits(rng):
    r = rng.standard_normal(32).astype(np.float32)
    f = rng.standard_normal(32).astype(np.float32)
    ld = d_loss_fn("bce", jnp.asarray(r), jnp.asarray(f))
    tr, tf = torch.from_numpy(r), torch.from_numpy(f)
    expect = (F.binary_cross_entropy_with_logits(tr, torch.ones_like(tr))
              + F.binary_cross_entropy_with_logits(tf, torch.zeros_like(tf)))
    np.testing.assert_allclose(float(ld), float(expect), rtol=1e-5)

    lg = g_loss_fn("bce", jnp.asarray(f))
    expect_g = F.binary_cross_entropy_with_logits(tf, torch.ones_like(tf))
    np.testing.assert_allclose(float(lg), float(expect_g), rtol=1e-5)


def test_lsgan_closed_form(rng):
    r = rng.standard_normal(16).astype(np.float32)
    f = rng.standard_normal(16).astype(np.float32)
    ld = d_loss_fn("lsgan", jnp.asarray(r), jnp.asarray(f))
    expect = 0.5 * (np.mean((r - 1) ** 2) + np.mean(f ** 2))
    np.testing.assert_allclose(float(ld), expect, rtol=1e-5)
    lg = g_loss_fn("lsgan", jnp.asarray(f))
    np.testing.assert_allclose(float(lg), 0.5 * np.mean((f - 1) ** 2),
                               rtol=1e-5)


def test_wgan_and_hinge(rng):
    r = rng.standard_normal(16).astype(np.float32)
    f = rng.standard_normal(16).astype(np.float32)
    np.testing.assert_allclose(
        float(d_loss_fn("wgan", jnp.asarray(r), jnp.asarray(f))),
        np.mean(f) - np.mean(r), rtol=1e-5)
    np.testing.assert_allclose(
        float(g_loss_fn("wgan_gp", jnp.asarray(f))), -np.mean(f), rtol=1e-5)
    np.testing.assert_allclose(
        float(d_loss_fn("hinge", jnp.asarray(r), jnp.asarray(f))),
        np.mean(np.maximum(0, 1 - r)) + np.mean(np.maximum(0, 1 + f)),
        rtol=1e-5)


def test_gradient_penalty_analytic_linear():
    """D(x) = c * sum(x): per-sample grad is c*ones, norm = c*sqrt(HWC)."""
    n, h, w, c_dim = 4, 5, 5, 3
    real = jnp.ones((n, h, w, c_dim))
    fake = -jnp.ones((n, h, w, c_dim))
    coef = 0.25

    def d_score(x):
        return coef * jnp.sum(x, axis=(1, 2, 3))

    gp = gradient_penalty(d_score, real, fake, jax.random.PRNGKey(0))
    expect = (coef * np.sqrt(h * w * c_dim) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expect, rtol=1e-5)


def test_gradient_penalty_zero_at_unit_norm():
    """D(x) = <x, u> with ||u||=1 gives exactly unit gradient norm -> gp=0."""
    n, h, w, c_dim = 3, 4, 4, 2
    u = jnp.ones((h, w, c_dim)) / np.sqrt(h * w * c_dim)

    def d_score(x):
        return jnp.sum(x * u, axis=(1, 2, 3))

    real = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n, h, w, c_dim)), jnp.float32)
    gp = gradient_penalty(d_score, real, -real, jax.random.PRNGKey(1))
    assert float(gp) < 1e-9


def test_gradient_penalty_is_differentiable():
    """The outer grad (double backward) must flow through the penalty."""
    n, h, w, c_dim = 2, 4, 4, 1
    real = jnp.ones((n, h, w, c_dim))
    fake = jnp.zeros((n, h, w, c_dim))

    def loss(theta):
        def d_score(x):
            return theta * jnp.sum(jnp.square(x), axis=(1, 2, 3))

        return gradient_penalty(d_score, real, fake, jax.random.PRNGKey(0))

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_prdc_identical_sets_are_perfect():
    from tpugan.eval.fid import prdc_from_features

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 16))
    r = prdc_from_features(feats, feats.copy(), k=5)
    assert r["precision"] == 1.0 and r["recall"] == 1.0
    assert r["coverage"] == 1.0 and r["density"] >= 1.0


def test_prdc_detects_mode_collapse_and_shift():
    from tpugan.eval.fid import prdc_from_features

    rng = np.random.default_rng(1)
    real = rng.normal(size=(300, 8))
    # mode collapse: fakes cluster at one point -> high precision-ish,
    # terrible recall/coverage
    collapsed = rng.normal(size=(300, 8)) * 0.01
    r = prdc_from_features(real, collapsed, k=5)
    assert r["recall"] < 0.2 and r["coverage"] < 0.2
    # distribution shift far away -> everything near zero
    shifted = real + 50.0
    r2 = prdc_from_features(real, shifted, k=5)
    assert r2["precision"] < 0.05 and r2["recall"] < 0.05
    # healthy same-distribution fakes score high on all four
    healthy = rng.normal(size=(300, 8))
    r3 = prdc_from_features(real, healthy, k=5)
    assert r3["precision"] > 0.7 and r3["recall"] > 0.7
    assert r3["coverage"] > 0.7


def test_prdc_requires_enough_samples():
    import pytest

    from tpugan.eval.fid import prdc_from_features

    with pytest.raises(ValueError):
        prdc_from_features(np.zeros((4, 3)), np.zeros((10, 3)), k=5)


def test_prdc_chunked_matches_unchunked():
    """Row-chunking is a memory optimization only: every chunk size yields
    the identical four metrics (same float64 per-row arithmetic)."""
    from tpugan.eval.fid import prdc_from_features

    rng = np.random.default_rng(2)
    real = rng.normal(size=(64, 8))
    fake = rng.normal(size=(48, 8)) + 0.5
    a = prdc_from_features(real, fake, k=3, chunk=7)
    b = prdc_from_features(real, fake, k=3, chunk=4096)
    assert a == b


def test_kid_rejects_single_sample():
    """The unbiased within-set term divides by m*(m-1): m=1 must be a clear
    ValueError, not a ZeroDivisionError deep inside evaluate()."""
    import pytest

    from tpugan.eval.fid import kid_from_features

    f = np.random.default_rng(0).standard_normal((1, 8))
    with pytest.raises(ValueError, match="at least 2"):
        kid_from_features(f, f)
