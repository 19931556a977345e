"""FusedProp training mode (train.fused_prop; arxiv 2004.03335): one fake
forward shared by the D and G updates, both gradients pulled from one
linearization.  Simultaneous GD (G uses the pre-update D)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpugan.configs import get_preset
from tpugan.losses import d_loss_fake_fn, d_loss_real_fn, g_loss_fn
from tpugan.models import build_models
from tpugan.train import build_train_step, create_train_state
from tpugan.train.state import make_optimizers


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _cfg(**over):
    cfg = get_preset("dcgan_cifar10").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "data.batch_size": 8, "data.hflip": False,
        "train.precision": "fp32", "train.ema": 0.0,
        "train.steps_per_call": 1, "train.fused_prop": True,
        "train.donate": False,  # tests reuse the pre-step state
    })
    return cfg.override(over) if over else cfg


def test_fused_prop_rejects_gp_and_n_critic():
    g, d = build_models(_cfg().model, "fp32")
    with pytest.raises(ValueError, match="fused_prop"):
        build_train_step(_cfg(**{"loss.kind": "wgan_gp",
                                 "loss.n_critic": "5"}), g, d)
    with pytest.raises(ValueError, match="fused_prop"):
        build_train_step(_cfg(**{"loss.n_critic": "2"}), g, d)


def test_fused_grads_match_simultaneous_reference(rng):
    """One fused step == a hand-composed simultaneous step: identical D and
    G parameter updates (same forwards, same state threading, G's gradient
    through the pre-update D)."""
    cfg = _cfg()
    g, d = build_models(cfg.model, "fp32")
    state = create_train_state(cfg, g, d)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)) * 0.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

    step = build_train_step(cfg, g, d)
    new_state, m = step(state, {"image": x, "z_d": z})

    # --- hand-built simultaneous reference ---------------------------------
    def d_total(pd):
        r, sd = d.apply(pd, state.state_d, x, train=True)
        fake, _ = g.apply(state.params_g, state.state_g, z, train=True)
        fl, _ = d.apply(pd, sd, lax.stop_gradient(fake), train=True)
        return (d_loss_real_fn("bce", r) + d_loss_fake_fn("bce", fl))

    def g_total(pg):
        fake, _ = g.apply(pg, state.state_g, z, train=True)
        _, sd = d.apply(state.params_d, state.state_d, x, train=True)
        fl, _ = d.apply(state.params_d, sd, fake, train=True)
        return g_loss_fn("bce", fl)

    gd = jax.grad(d_total)(state.params_d)
    gg = jax.grad(g_total)(state.params_g)
    tx_g, tx_d = make_optimizers(cfg)
    ud, _ = tx_d.update(gd, state.opt_d, state.params_d)
    ug, _ = tx_g.update(gg, state.opt_g, state.params_g)
    ref_pd = jax.tree.map(jnp.add, state.params_d, ud)
    ref_pg = jax.tree.map(jnp.add, state.params_g, ug)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(new_state.params_d), jax.device_get(ref_pd))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(new_state.params_g), jax.device_get(ref_pg))
    assert np.isfinite(float(m["loss_d"]))
    assert np.isfinite(float(m["loss_g"]))


@pytest.mark.parametrize("preset,over", [
    ("dcgan_cifar10", {}),
    ("lsgan_cifar10", {}),
    ("sngan_cifar10", {}),                       # hinge + spectral norm
    ("wgan_cifar10", {"loss.n_critic": "1"}),    # clipping, critic loss
    ("cdcgan_celeba64", {"model.image_size": 32}),
])
def test_fused_prop_trains_every_supported_variant(rng, preset, over):
    cfg = get_preset(preset).override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "data.batch_size": 8, "data.hflip": False,
        "train.precision": "fp32", "train.ema": 0.0,
        "train.fused_prop": True, **over})
    g, d = build_models(cfg.model, "fp32")
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    x = jnp.asarray(rng.standard_normal(
        (8, cfg.model.image_size, cfg.model.image_size, 3)) * 0.5,
        jnp.float32)
    batch = {"image": x}
    if cfg.model.arch == "cdcgan":
        batch["label"] = jnp.asarray(rng.integers(0, 2, 8).astype(np.int32))
    p0 = jax.device_get(state.params_g)
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss_d"]))
    assert np.isfinite(float(m["loss_g"])) and float(m["loss_g"]) != 0.0
    # both networks actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        jax.device_get(state.params_g), p0)
    assert max(jax.tree.leaves(moved)) > 1e-6


def test_fused_prop_trainer_end_to_end(rng, tmp_path):
    from tpugan.train import Trainer

    cfg = _cfg(**{"data.dataset": "synthetic", "data.synthetic_size": 32,
                  "train.total_steps": 3, "train.log_every": 1,
                  "train.sample_every": 0, "train.ckpt_every": 0})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "c"), out_dir=str(tmp_path / "o")))
    m = Trainer(cfg).train()
    assert np.isfinite(m["loss_d"]) and np.isfinite(m["loss_g"])
