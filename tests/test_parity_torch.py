"""Framework-level parity vs the torch twin (the reference stand-in).

Weight-transplanted forward equality for G and D, and a multi-step training
loss-trajectory comparison with identical data/noise streams — the strongest
offline evidence that the TPU build computes what the reference computes.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.parity import (
    TorchDiscriminator,
    TorchGenerator,
    transplant_d,
    transplant_g,
)
from tpugan.train import build_train_step, create_train_state


def _cfg(image_size=32, bn_d=True):
    cfg = get_preset("dcgan_cifar10")
    return cfg.override({
        "model.image_size": image_size, "model.ngf": 32, "model.ndf": 32,
        "model.nz": 32, "model.d_batchnorm": bn_d,
        "data.batch_size": 16, "train.precision": "fp32",
    })


def test_generator_forward_matches_torch_twin(rng):
    cfg = _cfg()
    g, d = build_models(cfg.model, "fp32")
    params, state = g.init(jax.random.PRNGKey(0))

    tg = TorchGenerator(32, 3, cfg.model.nz, cfg.model.ngf).eval()
    transplant_g(params, state, tg)

    z = rng.standard_normal((8, cfg.model.nz)).astype(np.float32)
    ours, _ = g.apply(params, state, jnp.asarray(z), train=False)
    with torch.no_grad():
        theirs = tg(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)

    # train mode too (batch statistics path)
    tg.train()
    ours_t, _ = g.apply(params, state, jnp.asarray(z), train=True)
    theirs_t = tg(torch.from_numpy(z)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours_t), theirs_t, rtol=1e-4,
                               atol=1e-4)


def test_discriminator_forward_matches_torch_twin(rng):
    cfg = _cfg()
    g, d = build_models(cfg.model, "fp32")
    params, state = d.init(jax.random.PRNGKey(1))

    td = TorchDiscriminator(32, 3, cfg.model.ndf).eval()
    transplant_d(params, state, td)

    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    ours, _ = d.apply(params, state, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4,
                               atol=1e-4)


def test_training_loss_trajectory_matches_torch(rng):
    """5 alternating D/G steps, identical weights/data/noise: per-step
    losses must track the torch reference run closely."""
    cfg = _cfg()
    nz, bsz = cfg.model.nz, cfg.data.batch_size
    g, d = build_models(cfg.model, "fp32")
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)

    tg = TorchGenerator(32, 3, nz, cfg.model.ngf).train()
    td = TorchDiscriminator(32, 3, cfg.model.ndf).train()
    transplant_g(jax.device_get(state.params_g),
                 jax.device_get(state.state_g), tg)
    transplant_d(jax.device_get(state.params_d),
                 jax.device_get(state.state_d), td)
    opt_g = torch.optim.Adam(tg.parameters(), lr=cfg.optim.lr_g,
                             betas=(cfg.optim.beta1, cfg.optim.beta2),
                             eps=cfg.optim.eps)
    opt_d = torch.optim.Adam(td.parameters(), lr=cfg.optim.lr_d,
                             betas=(cfg.optim.beta1, cfg.optim.beta2),
                             eps=cfg.optim.eps)

    losses_ours, losses_torch = [], []
    for i in range(5):
        x = rng.standard_normal((bsz, 32, 32, 3)).astype(np.float32) * 0.5
        z_d = rng.standard_normal((bsz, nz)).astype(np.float32)
        z_g = rng.standard_normal((bsz, nz)).astype(np.float32)

        batch = {"image": jnp.asarray(x), "z_d": jnp.asarray(z_d),
                 "z_g": jnp.asarray(z_g)}
        state, m = step(state, batch)
        losses_ours.append((float(m["loss_d"]), float(m["loss_g"])))

        # torch reference step (the canonical DCGAN loop)
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tzd = torch.from_numpy(z_d)
        tzg = torch.from_numpy(z_g)
        opt_d.zero_grad()
        fake = tg(tzd)
        out_real = td(tx)
        out_fake = td(fake.detach())
        err_d = (F.binary_cross_entropy_with_logits(
                     out_real, torch.ones_like(out_real))
                 + F.binary_cross_entropy_with_logits(
                     out_fake, torch.zeros_like(out_fake)))
        err_d.backward()
        opt_d.step()
        opt_g.zero_grad()
        fake_g = tg(tzg)
        out_g = td(fake_g)
        err_g = F.binary_cross_entropy_with_logits(
            out_g, torch.ones_like(out_g))
        err_g.backward()
        opt_g.step()
        losses_torch.append((err_d.item(), err_g.item()))

    ours = np.asarray(losses_ours)
    ref = np.asarray(losses_torch)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-3)


def test_conditional_forward_matches_torch_twin(rng):
    """cDCGAN G and D match the torch twin after weight transplant."""
    from tpugan.parity.torch_twin import (
        TorchCondDiscriminator,
        TorchCondGenerator,
        transplant_cond_d,
        transplant_cond_g,
    )

    cfg = get_preset("cdcgan_celeba64").override({
        "model.ngf": 16, "model.ndf": 16, "model.nz": 16,
        "model.embed_dim": 8, "train.precision": "fp32"})
    g, d = build_models(cfg.model, "fp32")
    gp, gs = g.init(jax.random.PRNGKey(0))
    dp, ds = d.init(jax.random.PRNGKey(1))

    tg = TorchCondGenerator(64, 3, 16, 16, n_classes=2, embed_dim=8).eval()
    td = TorchCondDiscriminator(64, 3, 16, n_classes=2, embed_dim=8).eval()
    transplant_cond_g(gp, gs, tg)
    transplant_cond_d(dp, ds, td)

    z = rng.standard_normal((4, 16)).astype(np.float32)
    y = np.array([0, 1, 1, 0], np.int64)
    ours, _ = g.apply(gp, gs, (jnp.asarray(z), jnp.asarray(y.astype(np.int32))),
                      train=False)
    with torch.no_grad():
        theirs = tg(torch.from_numpy(z), torch.from_numpy(y))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)

    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    ours_d, _ = d.apply(dp, ds, (jnp.asarray(x), jnp.asarray(y.astype(np.int32))),
                        train=False)
    with torch.no_grad():
        theirs_d = td(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(y))
    np.testing.assert_allclose(np.asarray(ours_d), theirs_d.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_lsgan_trajectory_matches_torch(rng):
    """LSGAN loss trajectories track torch (MSE-to-labels objective)."""
    cfg = _cfg().override({"loss.kind": "lsgan"})
    nz, bsz = cfg.model.nz, cfg.data.batch_size
    g, d = build_models(cfg.model, "fp32")
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)

    tg = TorchGenerator(32, 3, nz, cfg.model.ngf).train()
    td = TorchDiscriminator(32, 3, cfg.model.ndf).train()
    transplant_g(jax.device_get(state.params_g),
                 jax.device_get(state.state_g), tg)
    transplant_d(jax.device_get(state.params_d),
                 jax.device_get(state.state_d), td)
    opt_g = torch.optim.Adam(tg.parameters(), lr=cfg.optim.lr_g,
                             betas=(cfg.optim.beta1, cfg.optim.beta2))
    opt_d = torch.optim.Adam(td.parameters(), lr=cfg.optim.lr_d,
                             betas=(cfg.optim.beta1, cfg.optim.beta2))

    ours, ref = [], []
    for i in range(4):
        x = rng.standard_normal((bsz, 32, 32, 3)).astype(np.float32) * 0.5
        z_d = rng.standard_normal((bsz, nz)).astype(np.float32)
        z_g = rng.standard_normal((bsz, nz)).astype(np.float32)
        state, m = step(state, {"image": jnp.asarray(x),
                                "z_d": jnp.asarray(z_d),
                                "z_g": jnp.asarray(z_g)})
        ours.append((float(m["loss_d"]), float(m["loss_g"])))

        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        opt_d.zero_grad()
        fake = tg(torch.from_numpy(z_d))
        out_r, out_f = td(tx), td(fake.detach())
        # LSGAN: 1/2 E[(D(x)-1)^2] + 1/2 E[D(G(z))^2]
        err_d = 0.5 * (((out_r - 1) ** 2).mean() + (out_f ** 2).mean())
        err_d.backward(); opt_d.step()
        opt_g.zero_grad()
        out_g = td(tg(torch.from_numpy(z_g)))
        err_g = 0.5 * ((out_g - 1) ** 2).mean()
        err_g.backward(); opt_g.step()
        ref.append((err_d.item(), err_g.item()))

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_wgan_gp_trajectory_matches_torch():
    """WGAN-GP — the double-backward hot path — tracks the torch twin over
    30 steps (6 G updates at n_critic=5) with identical init/data/noise/GP
    coefficients, and the final generators agree to float precision."""
    from tpugan.parity.runners import run_convergence_parity

    r = run_convergence_parity("wgan_gp_cifar10", 30, batch_size=16,
                               width=16, nz=16, fid_n=64)
    lj, lt = r["losses_tpugan"], r["losses_torch"]
    np.testing.assert_allclose(lj[:, 0], lt[:, 0], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(lj[:, 1], lt[:, 1], rtol=2e-3, atol=2e-4)
    f = r["final"]
    assert f["pixel_mae"] < 1e-4
    assert f["rel_delta"] < 1e-3  # proxy-FID relative delta


def test_sngan_trajectory_matches_torch():
    """SNGAN — hinge loss + spectral-norm power iteration (persistent u,
    3 iterations per full step) — tracks the torch twin over 30 steps."""
    from tpugan.parity.runners import run_convergence_parity

    r = run_convergence_parity("sngan_cifar10", 30, batch_size=16,
                               width=16, nz=16, fid_n=64)
    lj, lt = r["losses_tpugan"], r["losses_torch"]
    np.testing.assert_allclose(lj[:, 0], lt[:, 0], rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(lj[:, 1], lt[:, 1], rtol=5e-3, atol=5e-4)
    f = r["final"]
    assert f["pixel_mae"] < 2e-3  # fp32 drift over 30 steps of power iter
    assert f["rel_delta"] < 5e-3


def test_cdcgan_trajectory_matches_torch():
    """Conditional DCGAN (label embedding in G and D) tracks the torch twin
    over 30 steps with identical init/data/noise/fake-label streams —
    closes trajectory parity for ALL reference configs."""
    from tpugan.parity.runners import run_convergence_parity

    r = run_convergence_parity(
        "cdcgan_celeba64", 30, batch_size=16, width=16, nz=16, fid_n=64,
        overrides={"model.image_size": 32})
    lj, lt = r["losses_tpugan"], r["losses_torch"]
    np.testing.assert_allclose(lj[:, 0], lt[:, 0], rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(lj[:, 1], lt[:, 1], rtol=5e-3, atol=5e-4)
    # 30 G updates of fp32 chaos drift (vs 6 for n_critic=5 variants)
    assert r["final"]["pixel_mae"] < 2e-2


def test_sn_sigma_matches_torch_builtin(rng):
    """Semantics vs the reference's actual builtin: after power-iteration
    convergence, tpugan's σ equals torch.nn.utils.spectral_norm's σ (both
    equal the top singular value; formulations differ only pre-convergence)."""
    import torch.nn.utils as tutils

    from tpugan.nn.layers import Conv
    from tpugan.nn.spectral_norm import SpectralNorm

    conv = SpectralNorm(Conv(8, 16, 4, 2, 1, use_bias=False,
                             dtype=jnp.float32), n_iter=50)
    params, state = conv.init(jax.random.PRNGKey(0))
    sigma_ours, _ = conv._sigma(params["w"], state["u"], conv.n_iter)

    tconv = torch.nn.Conv2d(8, 16, 4, 2, 1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.asarray(params["w"]).transpose(3, 2, 0, 1).copy()))
    tconv = tutils.spectral_norm(tconv, n_power_iterations=50)
    tconv.train()
    x = torch.zeros(1, 8, 8, 8)
    tconv(x)  # triggers the power iterations
    w_bar = tconv.weight  # W / sigma
    sigma_torch = (tconv.weight_orig.reshape(-1)[0]
                   / w_bar.reshape(-1)[0]).item()
    np.testing.assert_allclose(float(sigma_ours), sigma_torch, rtol=1e-4)


def test_wgan_clip_trajectory_matches_torch(rng):
    """Original WGAN (RMSprop + weight clipping), n_critic=1 for the test."""
    cfg = _cfg(bn_d=True).override({
        "loss.kind": "wgan", "loss.n_critic": 1, "loss.clip_value": 0.05,
        "optim.optimizer": "rmsprop", "optim.lr_g": 5e-5, "optim.lr_d": 5e-5})
    nz, bsz = cfg.model.nz, cfg.data.batch_size
    g, d = build_models(cfg.model, "fp32")
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)

    tg = TorchGenerator(32, 3, nz, cfg.model.ngf).train()
    td = TorchDiscriminator(32, 3, cfg.model.ndf).train()
    transplant_g(jax.device_get(state.params_g),
                 jax.device_get(state.state_g), tg)
    transplant_d(jax.device_get(state.params_d),
                 jax.device_get(state.state_d), td)
    # tpugan's rmsprop mirrors torch semantics exactly (alpha=0.99 default,
    # eps outside the sqrt) — torch here runs its own defaults.
    opt_g = torch.optim.RMSprop(tg.parameters(), lr=5e-5)
    opt_d = torch.optim.RMSprop(td.parameters(), lr=5e-5)

    ours, ref = [], []
    for i in range(4):
        x = rng.standard_normal((bsz, 32, 32, 3)).astype(np.float32) * 0.5
        z_d = rng.standard_normal((bsz, nz)).astype(np.float32)
        z_g = rng.standard_normal((bsz, nz)).astype(np.float32)
        state, m = step(state, {"image": jnp.asarray(x),
                                "z_d": jnp.asarray(z_d),
                                "z_g": jnp.asarray(z_g)})
        ours.append(float(m["loss_d"]))

        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        opt_d.zero_grad()
        fake = tg(torch.from_numpy(z_d))
        err_d = td(fake.detach()).mean() - td(tx).mean()
        err_d.backward(); opt_d.step()
        with torch.no_grad():
            for p in td.parameters():
                p.clamp_(-0.05, 0.05)
        opt_g.zero_grad()
        err_g = -td(tg(torch.from_numpy(z_g))).mean()
        err_g.backward(); opt_g.step()
        ref.append(err_d.item())

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=5e-2, atol=5e-3)


def test_rmsprop_matches_torch_exactly():
    """The WGAN presets optimize with RMSprop; optax's default puts eps
    inside the sqrt where torch (the reference) adds it outside — a
    per-step systematic difference that compounds over hundreds of steps.
    Pin the fixed optimizer to torch semantics on a bare quadratic."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((16,)).astype(np.float32)
    target = rng.standard_normal((16,)).astype(np.float32)

    # torch
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt_t = torch.optim.RMSprop([wt], lr=5e-3)  # torch defaults
    for _ in range(50):
        opt_t.zero_grad()
        ((wt - torch.from_numpy(target)) ** 2).sum().backward()
        opt_t.step()

    # tpugan's construction (through make_optimizers so the test covers the
    # production path, not a hand-built transform)
    from tpugan.configs import get_preset
    from tpugan.train.state import make_optimizers

    cfg = get_preset("wgan_cifar10").override({"optim.lr_g": 5e-3})
    tx, _ = make_optimizers(cfg)
    wj = jnp.asarray(w0)
    st = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum((w - jnp.asarray(target)) ** 2))
    for _ in range(50):
        up, st = tx.update(grad_fn(wj), st, wj)
        wj = optax.apply_updates(wj, up)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_twins_resolve_default_embed_dim():
    """model.embed_dim=0 means 'default 50' (registry rule): the torch twins
    must resolve it the same way — a verbatim 0 built Embedding(n, 0) and
    crashed the weight transplant on a shape mismatch."""
    from tpugan.configs import get_preset
    from tpugan.parity.runners import build_torch_twins, parity_cfg
    from tpugan.train import create_train_state

    cfg = parity_cfg(get_preset("cdcgan_celeba64"), batch_size=8,
                     width=16, nz=16).override(
        {"model.image_size": 32, "model.embed_dim": 0})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    tg, td = build_torch_twins(cfg, state)
    assert tg.embed.embedding_dim == 50
    assert td.embed.embedding_dim == 50


def test_cdcgan_wgan_gp_trajectory_matches_torch():
    """Conditional D + gradient penalty: the torch GP mirror must score the
    interpolates WITH the real-batch labels (tpugan's d_score passes y_real)
    — this combination used to crash the harness with a missing-y TypeError,
    so parity for it was asymmetrically untestable."""
    from tpugan.parity.runners import run_convergence_parity

    r = run_convergence_parity(
        "cdcgan_celeba64", 10, batch_size=8, width=16, nz=16, fid_n=64,
        overrides={"model.image_size": 32, "loss.kind": "wgan_gp",
                   "loss.n_critic": 5})
    lj, lt = r["losses_tpugan"], r["losses_torch"]
    np.testing.assert_allclose(lj[:, 0], lt[:, 0], rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(lj[:, 1], lt[:, 1], rtol=5e-3, atol=5e-4)
