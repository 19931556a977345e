"""Train-step semantics: all variants step finitely; n_critic schedule;
state threading; seeded determinism; donation correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.train import build_train_step, create_train_state


def tiny(name, **over):
    cfg = get_preset(name)
    cfg = cfg.override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "model.ngf": 16, "model.ndf": 16, "model.nz": 16,
        "train.precision": "fp32", **over,
    })
    return cfg


def synth_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    batch = {"image": rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8)}
    if cfg.model.arch == "cdcgan":
        batch["label"] = rng.integers(
            0, cfg.model.n_classes, size=cfg.data.batch_size).astype(np.int32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("name", [
    "dcgan_mnist", "lsgan_cifar10", "wgan_cifar10", "wgan_gp_cifar10",
    "sngan_cifar10", "cdcgan_celeba64",
])
def test_step_runs_and_is_finite(name):
    cfg = tiny(name)
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    batch = synth_batch(cfg)
    for _ in range(3):
        state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{name}: {k} not finite"
    assert int(state.step) == 3


def test_n_critic_schedule():
    """G params change only on every n_critic-th call."""
    cfg = tiny("wgan_gp_cifar10")
    assert cfg.loss.n_critic == 5
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    batch = synth_batch(cfg)

    p0 = jax.device_get(state.params_g)
    for i in range(5):
        state, _ = step(state, batch)
        p1 = jax.device_get(state.params_g)
        changed = not np.allclose(
            jax.tree.leaves(p0)[0], jax.tree.leaves(p1)[0])
        if i < 4:
            assert not changed, f"G updated early at call {i}"
        else:
            assert changed, "G did not update on the n_critic-th call"
        p0 = p1


def test_seeded_determinism():
    """Same seed + data => bit-identical params after k steps."""
    cfg = tiny("dcgan_mnist")
    g, d = build_models(cfg.model, cfg.train.precision)
    batch = synth_batch(cfg)

    def run():
        state = create_train_state(cfg, g, d)
        step = build_train_step(cfg, g, d)
        for _ in range(3):
            state, _ = step(state, batch)
        return jax.device_get(state.params_g)

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)


def test_bn_and_sn_state_update():
    cfg = tiny("sngan_cifar10")
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    batch = synth_batch(cfg)
    s0 = jax.device_get(state.state_g)  # G BN stats
    d0 = jax.device_get(state.state_d)  # D SN u vectors
    state, _ = step(state, batch)
    s1 = jax.device_get(state.state_g)
    d1 = jax.device_get(state.state_d)
    assert any(not np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(s0), jax.tree.leaves(s1))), "BN stats frozen"
    assert any(not np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(d0), jax.tree.leaves(d1))), "SN u frozen"


def test_uint8_and_float_batches_agree():
    """Device-side normalization must equal pre-normalized input."""
    cfg = tiny("dcgan_mnist")
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b8 = synth_batch(cfg)
    bf = {"image": b8["image"].astype(jnp.float32) / 127.5 - 1.0}

    s1 = create_train_state(cfg, g, d)
    s2 = jax.tree.map(jnp.copy, s1)
    s1, m1 = step(s1, b8)
    s2, m2 = step(s2, bf)
    np.testing.assert_allclose(float(m1["loss_d"]), float(m2["loss_d"]),
                               rtol=1e-6)


def test_donation_safety():
    """After a donated step, the *returned* state must be usable (the old
    one is dead); two sequential steps through donation must work."""
    cfg = tiny("dcgan_cifar10")
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    batch = synth_batch(cfg)
    state, _ = step(state, batch)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss_d"]))


def test_wgan_weight_clipping():
    cfg = tiny("wgan_gp_cifar10")
    cfg = cfg.override({"loss.kind": "wgan", "loss.clip_value": 0.01,
                        "loss.n_critic": 1})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    state, _ = step(state, synth_batch(cfg))
    for leaf in jax.tree.leaves(jax.device_get(state.params_d)):
        assert np.max(np.abs(leaf)) <= 0.01 + 1e-7


@pytest.mark.parametrize("name", ["dcgan_mnist", "wgan_gp_cifar10",
                                  "sngan_cifar10"])
def test_bf16_training_step(name):
    """Default mixed precision must train (incl. the GP double backward);
    regression: f32-preferred conv output broke the conv VJP dtype match."""
    cfg = tiny(name, **{"train.precision": "bf16"})
    g, d = build_models(cfg.model, "bf16")
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    state, metrics = step(state, synth_batch(cfg))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{name} bf16: {k} not finite"
    # params stay fp32 master copies
    for leaf in jax.tree.leaves(state.params_g):
        assert leaf.dtype == jnp.float32


def test_ema_generator_weights():
    """EMA params update only on G steps and lag the live params."""
    cfg = tiny("dcgan_mnist", **{"train.ema": 0.5})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    assert state.params_g_ema is not None
    p0 = jax.device_get(jax.tree.leaves(state.params_g)[0])
    state, _ = step(state, synth_batch(cfg))
    live = jax.device_get(jax.tree.leaves(state.params_g)[0])
    ema = jax.device_get(jax.tree.leaves(state.params_g_ema)[0])
    expect = 0.5 * p0 + 0.5 * live
    np.testing.assert_allclose(ema, expect, rtol=1e-5, atol=1e-7)
    # disabled -> None and step still runs
    cfg2 = tiny("dcgan_mnist")
    s2 = create_train_state(cfg2, g, d)
    assert s2.params_g_ema is None
    step2 = build_train_step(cfg2, g, d)
    s2, m2 = step2(s2, synth_batch(cfg2))
    assert np.isfinite(float(m2["loss_d"]))


def test_remat_step_matches_plain():
    """jax.checkpoint'd forwards: identical numerics, same state updates."""
    cfg = tiny("dcgan_cifar10")
    g, d = build_models(cfg.model, cfg.train.precision)
    b = synth_batch(cfg)

    s1 = create_train_state(cfg, g, d)
    s1, m1 = build_train_step(cfg, g, d)(s1, b)

    cfg_r = tiny("dcgan_cifar10", **{"train.remat": True})
    s2 = create_train_state(cfg_r, g, d)
    s2, m2 = build_train_step(cfg_r, g, d)(s2, b)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m2["loss_d"]),
                               rtol=1e-6)
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(s2.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-7)


def test_device_resident_data_step():
    """On-device batch gather: finite step, deterministic given rng."""
    cfg = tiny("dcgan_cifar10", **{"data.device_resident": True})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    rng = np.random.default_rng(0)
    dataset = {"dataset_images": jnp.asarray(rng.integers(
        0, 256, size=(64, 32, 32, 3)).astype(np.uint8))}

    s1 = create_train_state(cfg, g, d)
    s2 = jax.tree.map(jnp.copy, s1)
    s1, m1 = step(s1, dataset)
    s2, m2 = step(s2, dataset)
    assert np.isfinite(float(m1["loss_d"]))
    np.testing.assert_allclose(float(m1["loss_d"]), float(m2["loss_d"]))
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params_d)),
                    jax.tree.leaves(jax.device_get(s2.params_d))):
        np.testing.assert_array_equal(a, b)


def test_multi_step_scan_with_stacked_batches():
    """K stacked host minibatches scanned per dispatch == K single steps."""
    cfg1 = tiny("dcgan_mnist")
    g, d = build_models(cfg1.model, cfg1.train.precision)
    step1 = build_train_step(cfg1, g, d)
    cfgk = tiny("dcgan_mnist", **{"train.steps_per_call": 3})
    stepk = build_train_step(cfgk, g, d)

    batches = [synth_batch(cfg1, seed=i) for i in range(3)]
    s1 = create_train_state(cfg1, g, d)
    for b in batches:
        s1, m1 = step1(s1, b)

    sk = create_train_state(cfgk, g, d)
    stacked = {key: jnp.stack([b[key] for b in batches])
               for key in batches[0]}
    sk, mk = stepk(sk, stacked)

    assert int(sk.step) == 3
    np.testing.assert_allclose(float(m1["loss_d"]), float(mk["loss_d"]),
                               rtol=1e-6)
    # scan and eager loops compile differently; equality is numerical,
    # not bitwise
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(sk.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-6)


def test_label_smoothing_wired():
    """real_label config actually changes the loss."""
    from tpugan.losses import d_loss_fn
    r = jnp.asarray([2.0, -1.0])
    f = jnp.asarray([0.5, 0.3])
    hard = float(d_loss_fn("bce", r, f))
    soft = float(d_loss_fn("bce", r, f, real_label=0.9))
    assert hard != soft
    # closed form for the smoothed real term
    import torch
    import torch.nn.functional as F
    tr = torch.tensor([2.0, -1.0])
    tf = torch.tensor([0.5, 0.3])
    expect = (F.binary_cross_entropy_with_logits(tr, torch.full_like(tr, 0.9))
              + F.binary_cross_entropy_with_logits(tf, torch.zeros_like(tf)))
    np.testing.assert_allclose(soft, float(expect), rtol=1e-5)


def test_epoch_indices_cover_each_epoch_exactly_once():
    """Device-resident 'epoch' sampling = DataLoader shuffle=True: every
    epoch visits each index exactly once, across straddling batches, and
    the order is a pure function of (seed, step) — resume-exact."""
    import jax
    import numpy as np

    from tpugan.train.steps import epoch_indices

    root = jax.random.fold_in(jax.random.PRNGKey(7), 0xDA7A)
    n, bsz = 12, 5  # bsz does not divide n -> batches straddle epochs
    steps = 12  # 60 positions = 5 epochs
    idx = np.concatenate([
        np.asarray(epoch_indices(root, jnp.int32(s), bsz, n))
        for s in range(steps)])
    for e in range(5):
        chunk = np.sort(idx[e * n:(e + 1) * n])
        np.testing.assert_array_equal(chunk, np.arange(n))
    # different epochs, different order (overwhelmingly likely)
    assert not np.array_equal(idx[:n], idx[n:2 * n])
    # determinism: same (seed, step) -> same indices
    again = np.asarray(epoch_indices(root, jnp.int32(3), bsz, n))
    np.testing.assert_array_equal(again, idx[3 * bsz:4 * bsz])


def test_device_resident_epoch_sampling_trains():
    cfg = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "data.synthetic_size": 32, "data.device_resident": True,
        "data.sampling": "epoch", "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32", "train.donate": False})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    state = create_train_state(cfg, g, d)
    data = np.random.default_rng(0).integers(
        0, 256, size=(32, 28, 28, 1)).astype(np.uint8)
    batch = {"dataset_images": jnp.asarray(data)}
    for _ in range(3):
        state, metrics = step(state, batch)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_linear_lr_schedule_decays_to_zero():
    """optim.schedule='linear': updates shrink over the run and stop at the
    end (LR hits zero), while 'constant' keeps updating."""
    import jax

    def run(schedule):
        cfg = get_preset("dcgan_mnist").override({
            "data.dataset": "synthetic", "data.batch_size": 8,
            "data.synthetic_size": 16, "model.ngf": 8, "model.ndf": 8,
            "model.nz": 8, "train.precision": "fp32", "train.donate": False,
            "train.total_steps": 8, "optim.schedule": schedule})
        g, d = build_models(cfg.model, cfg.train.precision)
        step = build_train_step(cfg, g, d)
        state = create_train_state(cfg, g, d)
        data = np.random.default_rng(0).integers(
            0, 256, size=(8, 28, 28, 1)).astype(np.uint8)
        deltas = []
        for _ in range(8):
            prev = jax.device_get(state.params_g)
            state, _ = step(state, {"image": jnp.asarray(data)})
            cur = jax.device_get(state.params_g)
            deltas.append(max(float(np.abs(a - b).max()) for a, b in zip(
                jax.tree.leaves(prev), jax.tree.leaves(cur))))
        return deltas

    lin = run("linear")
    const = run("constant")
    # decay begins at step 4 (decay_start_frac=0.5): the last executed
    # update runs at 25% LR (LR hits zero only at count == total_steps),
    # so it is well below both the pre-decay update and the constant run's
    assert lin[-1] < 0.5 * lin[4], lin
    assert lin[-1] < 0.6 * const[-1], (lin[-1], const[-1])
    # constant LR never decays
    assert const[-1] > 0.5 * const[4], const


def test_linear_lr_schedule_decays_g_under_n_critic():
    """With n_critic>1 G's optax update count advances 1/n_critic as fast as
    the trainer step; the schedule must be rescaled into that count domain or
    G's LR never reaches its decay window (it did not, pre-fix).  Assert G's
    *last* update is visibly smaller than its first under schedule='linear'
    with n_critic=5, and not under 'constant'."""
    import jax

    def g_deltas(schedule):
        cfg = get_preset("dcgan_mnist").override({
            "data.dataset": "synthetic", "data.batch_size": 8,
            "data.synthetic_size": 16, "model.ngf": 8, "model.ndf": 8,
            "model.nz": 8, "train.precision": "fp32", "train.donate": False,
            "train.total_steps": 20, "optim.schedule": schedule,
            "loss.kind": "wgan", "loss.n_critic": 5})
        g, d = build_models(cfg.model, cfg.train.precision)
        step = build_train_step(cfg, g, d)
        state = create_train_state(cfg, g, d)
        data = np.random.default_rng(0).integers(
            0, 256, size=(8, 28, 28, 1)).astype(np.uint8)
        deltas = []  # G-param step size at each of the 4 G updates
        for i in range(20):
            prev = jax.device_get(state.params_g)
            state, _ = step(state, {"image": jnp.asarray(data)})
            if i % 5 == 4:
                cur = jax.device_get(state.params_g)
                deltas.append(max(
                    float(np.abs(a - b).max()) for a, b in zip(
                        jax.tree.leaves(prev), jax.tree.leaves(cur))))
        assert len(deltas) == 4
        return deltas

    lin = g_deltas("linear")
    const = g_deltas("constant")
    # G count domain is total//5 = 4, decay begins at count 2: the 4th G
    # update runs at 50% LR while the first two run at full LR.
    assert lin[-1] < 0.75 * lin[0], lin
    assert const[-1] > 0.75 * const[0], const


def test_grad_accum_matches_full_batch():
    """train.grad_accum=4: with batchnorm off the averaged microbatch
    gradients equal the full-batch gradients exactly, so the trained params
    must match the accum=1 step to float tolerance — for the plain D/G path
    AND the WGAN-GP double-backward path (per-microbatch penalty terms)."""
    import jax

    def run(accum, kind):
        cfg = get_preset("dcgan_mnist").override({
            "data.dataset": "synthetic", "data.batch_size": 16,
            "data.synthetic_size": 16, "model.ngf": 8, "model.ndf": 8,
            "model.nz": 8, "model.g_batchnorm": False,
            "model.d_batchnorm": False, "train.precision": "fp32",
            "train.donate": False, "train.grad_accum": accum,
            "loss.kind": kind, "loss.n_critic": 1})
        g, d = build_models(cfg.model, cfg.train.precision)
        step = build_train_step(cfg, g, d)
        state = create_train_state(cfg, g, d)
        rng = np.random.default_rng(0)
        for i in range(2):
            batch = {
                "image": jnp.asarray(rng.integers(
                    0, 256, size=(16, 28, 28, 1)).astype(np.uint8)),
                "z_d": jnp.asarray(
                    rng.standard_normal((16, 8)).astype(np.float32)),
                "z_g": jnp.asarray(
                    rng.standard_normal((16, 8)).astype(np.float32)),
            }
            if kind == "wgan_gp":
                batch["gp_alpha"] = jnp.asarray(
                    rng.random((16, 1, 1, 1)).astype(np.float32))
            state, m = step(state, batch)
        return state, m

    for kind in ("bce", "wgan_gp"):
        s1, m1 = run(1, kind)
        s4, m4 = run(4, kind)
        np.testing.assert_allclose(float(m4["loss_d"]), float(m1["loss_d"]),
                                   rtol=1e-5, err_msg=kind)
        for a, b in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                        jax.tree.leaves(jax.device_get(s4.params_g))):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                       err_msg=kind)
        for a, b in zip(jax.tree.leaves(jax.device_get(s1.params_d)),
                        jax.tree.leaves(jax.device_get(s4.params_d))):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                       err_msg=kind)


def test_grad_accum_with_batchnorm_trains():
    """With batchnorm on, accumulation is the standard per-microbatch-BN
    tradeoff — assert it trains finitely (incl. under scan-fused
    steps_per_call) rather than bit-matching."""
    cfg = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32", "train.donate": False,
        "train.grad_accum": 4, "train.steps_per_call": 2,
        "data.device_resident": True})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    state = create_train_state(cfg, g, d)
    data = np.random.default_rng(0).integers(
        0, 256, size=(32, 28, 28, 1)).astype(np.uint8)
    state, m = step(state, {"dataset_images": jnp.asarray(data)})
    assert int(state.step) == 2
    assert all(np.isfinite(float(v)) for v in m.values())


def test_grad_accum_rejects_bad_combos():
    cfg0 = get_preset("dcgan_mnist").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.grad_accum": 0})
    g0, d0 = build_models(cfg0.model, cfg0.train.precision)
    with pytest.raises(ValueError, match="grad_accum must be"):
        build_train_step(cfg0, g0, d0)
    cfg = get_preset("dcgan_mnist").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "data.batch_size": 16, "train.grad_accum": 3})
    g, d = build_models(cfg.model, cfg.train.precision)
    with pytest.raises(ValueError, match="divisible"):
        build_train_step(cfg, g, d)
    cfg2 = get_preset("dcgan_mnist").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "data.batch_size": 16, "train.grad_accum": 4,
        "train.fused_prop": True})
    g2, d2 = build_models(cfg2.model, cfg2.train.precision)
    with pytest.raises(ValueError, match="grad_accum requires fused_prop"):
        build_train_step(cfg2, g2, d2)


def test_label_smoothing_rejected_for_labelless_losses():
    """wgan/wgan_gp/hinge have no label targets; configuring smoothing
    with them must fail fast, not silently no-op."""
    cfg = get_preset("wgan_gp_cifar10").override({"loss.real_label": 0.9})
    g, d = build_models(cfg.model, cfg.train.precision)
    with pytest.raises(ValueError, match="label"):
        build_train_step(cfg, g, d)
