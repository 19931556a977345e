"""Differentiable augmentation (ops/augment.py) + ADA adaptation.

Op-level invariants (shape, determinism, the DiffAugment op semantics,
gradient flow), step-level integration (all loss kinds incl. the WGAN-GP
double backward through the augmentation, fused_prop, grad_accum), the
on-device ADA control loop, DP equivalence on the 8-fake-device mesh, and
the config validation surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.ops.augment import (
    POLICY_NAMES,
    apply_policy,
    parse_policy,
    rand_brightness,
    rand_contrast,
    rand_cutout,
    rand_saturation,
    rand_translation,
)
from tpugan.parallel import batch_sharding, make_mesh, shard_train_state
from tpugan.train import build_train_step, create_train_state

FULL = "color,translation,cutout"


def tiny(name="dcgan_cifar10", **over):
    return get_preset(name).override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32", **over,
    })


def batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    b = {"image": jnp.asarray(rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}
    if cfg.model.arch == "cdcgan":
        b["label"] = jnp.asarray(rng.integers(
            0, cfg.model.n_classes, cfg.data.batch_size).astype(np.int32))
    return b


def imgs(n=4, h=32, w=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))


# ---------------------------------------------------------------------------
# op semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("op", [rand_brightness, rand_saturation,
                                rand_contrast, rand_translation, rand_cutout])
def test_op_shape_dtype_determinism(op):
    x = imgs()
    k = jax.random.PRNGKey(0)
    a, b = op(x, k), op(x, k)
    assert a.shape == x.shape and a.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = op(x, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_brightness_is_per_sample_constant_shift():
    x = imgs()
    out = rand_brightness(x, jax.random.PRNGKey(3))
    shift = np.asarray(out - x)
    for i in range(x.shape[0]):
        s = shift[i]
        assert np.allclose(s, s.flat[0], atol=1e-6)
        assert -0.5 <= s.flat[0] < 0.5


def test_saturation_preserves_channel_mean():
    x = imgs()
    out = rand_saturation(x, jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(out.mean(axis=-1)),
                               np.asarray(x.mean(axis=-1)), atol=1e-5)


def test_contrast_preserves_image_mean():
    x = imgs()
    out = rand_contrast(x, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out.mean(axis=(1, 2, 3))),
                               np.asarray(x.mean(axis=(1, 2, 3))), atol=1e-5)


def test_translation_is_a_zero_padded_shift():
    x = imgs(n=4, h=16, w=16)
    out = np.asarray(rand_translation(x, jax.random.PRNGKey(6)))
    xn = np.asarray(x)
    pad = np.pad(xn, ((0, 0), (2, 2), (2, 2), (0, 0)))
    for i in range(4):
        # the output must equal SOME in-range integer shift of the input
        matches = [
            np.array_equal(out[i], pad[i, 2 + dy:18 + dy, 2 + dx:18 + dx])
            for dy in range(-2, 3) for dx in range(-2, 3)
        ]
        assert any(matches), f"sample {i} is not a shift of the input"


def test_cutout_zeroes_one_window_only():
    x = jnp.ones((4, 32, 32, 3), jnp.float32)
    out = np.asarray(rand_cutout(x, jax.random.PRNGKey(7)))
    for i in range(4):
        changed = out[i] != 1.0
        assert np.all(out[i][changed] == 0.0)
        n_zeroed = changed[..., 0].sum()
        # full window is 16x16; at worst half clips off each axis
        assert 8 * 8 <= n_zeroed <= 16 * 16
        # the zeroed set is a rectangle: its bounding box is fully zeroed
        ys, xs = np.where(changed[..., 0])
        assert n_zeroed == (np.ptp(ys) + 1) * (np.ptp(xs) + 1)


def test_apply_policy_p0_is_identity_p1_changes_everything():
    x = imgs()
    k = jax.random.PRNGKey(8)
    np.testing.assert_array_equal(
        np.asarray(apply_policy(x, k, parse_policy(FULL), 0.0)),
        np.asarray(x))
    out = np.asarray(apply_policy(x, k, parse_policy(FULL), 1.0))
    assert not np.array_equal(out, np.asarray(x))


def test_apply_policy_gates_per_sample():
    x = imgs(n=64)
    out = np.asarray(apply_policy(x, jax.random.PRNGKey(9),
                                  ("cutout",), 0.5))
    changed = np.any(out != np.asarray(x), axis=(1, 2, 3))
    assert 8 < changed.sum() < 56  # ~Binomial(64, .5); bounds are ~5 sigma


def test_policy_is_differentiable():
    x = imgs()

    def f(x):
        out = apply_policy(x, jax.random.PRNGKey(10), parse_policy(FULL),
                           1.0)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_parse_policy_validates():
    assert parse_policy("color, cutout") == ("color", "cutout")
    with pytest.raises(ValueError, match="unknown augment op"):
        parse_policy("color,cutmix")
    assert set(POLICY_NAMES) == {"color", "translation", "cutout"}


# ---------------------------------------------------------------------------
# train-step integration
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["dcgan_cifar10", "wgan_gp_cifar10",
                                  "cdcgan_celeba64"])
def test_augmented_step_runs_finite(name):
    """All loss kinds step finitely with the full policy — including the
    WGAN-GP nested grad, whose interpolates are built from augmented
    images and double-backward through the augmentation ops."""
    cfg = tiny(name, **{"train.augment": FULL})
    g, d = build_models(cfg.model, cfg.train.precision)
    st = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)
    for _ in range(2 * max(cfg.loss.n_critic, 1)):
        st, m = step(st, b)
    assert all(np.isfinite(float(v)) for v in m.values())


def test_augmented_step_is_deterministic():
    cfg = tiny(**{"train.augment": FULL})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    def run():
        st = create_train_state(cfg, g, d)
        for _ in range(3):
            st, m = step(st, b)
        return st, m

    (s1, m1), (s2, m2) = run(), run()
    assert float(m1["loss_d"]) == float(m2["loss_d"])
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(s2.params_g))):
        np.testing.assert_array_equal(a, c)


@pytest.mark.slow  # 35s: three full-step compiles; the off-is-identity
# half is also pinned by test_augmented_step_is_deterministic (default).
def test_augmentation_changes_training_but_not_when_off():
    """augment='' must leave the step's RNG stream and numerics untouched;
    augment=FULL must actually alter the trajectory."""
    def losses(augment):
        cfg = tiny(**{"train.augment": augment})
        g, d = build_models(cfg.model, cfg.train.precision)
        st = create_train_state(cfg, g, d)
        step = build_train_step(cfg, g, d)
        b = batch(cfg)
        out = []
        for _ in range(2):
            st, m = step(st, b)
            out.append(float(m["loss_d"]))
        return out

    assert losses("") == losses("")
    assert losses("") != losses(FULL)


def test_augmented_fused_prop_step():
    cfg = tiny(**{"train.augment": FULL, "train.fused_prop": True,
                  "loss.n_critic": 1})
    g, d = build_models(cfg.model, cfg.train.precision)
    st = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)
    for _ in range(2):
        st, m = step(st, b)
    assert all(np.isfinite(float(v)) for v in m.values())


def test_augmented_grad_accum_step():
    cfg = tiny(**{"train.augment": FULL, "train.grad_accum": 2})
    g, d = build_models(cfg.model, cfg.train.precision)
    st = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)
    for _ in range(2):
        st, m = step(st, b)
    assert all(np.isfinite(float(v)) for v in m.values())


@pytest.mark.slow  # 28s: 8-device mesh compile; the driver's multichip
# gate exercises augment x DP every round (placement #1), and
# test_augmented_spatial_matches_dense keeps a mesh equivalence default.
def test_augmented_dp_matches_single_device():
    cfg = tiny(**{"train.augment": FULL, "data.batch_size": 16})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    s1 = create_train_state(cfg, g, d)
    for _ in range(2):
        s1, m1 = step(s1, b)

    mesh = make_mesh(8)
    s8 = shard_train_state(create_train_state(cfg, g, d), mesh)
    b8 = jax.device_put(b, batch_sharding(mesh))
    for _ in range(2):
        s8, m8 = step(s8, b8)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m8["loss_d"]),
                               rtol=1e-4)
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(s8.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def test_augmented_spatial_matches_dense():
    """Augmentation runs at step level (before the halo convs see the
    images), so the spatially-sharded step must match the dense one."""
    from jax.sharding import Mesh
    from tpugan.parallel.spatial import spatial_ctx

    cfg = tiny(**{"train.augment": FULL, "model.image_size": 64,
                  "data.batch_size": 4, "train.donate": False})
    g, d = build_models(cfg.model, cfg.train.precision)
    b = batch(cfg)
    step = build_train_step(cfg, g, d)

    s0 = create_train_state(cfg, g, d)
    s0, m0 = step(s0, b)

    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    s1 = create_train_state(cfg, g, d)
    with spatial_ctx(mesh):
        s1, m1 = step(s1, b)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-3)
    for a, c in zip(jax.tree.leaves(jax.device_get(s0.params_g)),
                    jax.tree.leaves(jax.device_get(s1.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# ADA
# ---------------------------------------------------------------------------


def test_ada_requires_a_policy():
    cfg = tiny(**{"train.ada_target": 0.6})
    g, d = build_models(cfg.model, cfg.train.precision)
    with pytest.raises(ValueError, match="requires train.augment"):
        build_train_step(cfg, g, d)


def test_unknown_augment_op_rejected_at_build():
    cfg = tiny(**{"train.augment": "color,mixup"})
    g, d = build_models(cfg.model, cfg.train.precision)
    with pytest.raises(ValueError, match="unknown augment op"):
        build_train_step(cfg, g, d)


@pytest.mark.parametrize("kind", ["lsgan", "wgan", "wgan_gp"])
def test_ada_rejects_uncalibrated_loss_kinds(kind):
    """r_t = E[sign(D(real))] needs a zero-calibrated logit: lsgan regresses
    D(real) toward 1.0 (sign saturates regardless of overfitting) and wgan
    critic scores have no calibrated zero — p would silently ramp to 1.0.
    Fixed-p DiffAugment (augment without ada_target) stays allowed."""
    over = {"train.augment": FULL, "train.ada_target": 0.6,
            "loss.kind": kind}
    if kind == "wgan_gp":
        over["loss.lambda_gp"] = 10.0
    cfg = tiny(**over)
    g, d = build_models(cfg.model, cfg.train.precision)
    with pytest.raises(ValueError, match="zero-calibrated"):
        build_train_step(cfg, g, d)
    # fixed-p DiffAugment with the same loss still builds
    cfg2 = tiny(**{"train.augment": FULL, "loss.kind": kind,
                   **({"loss.lambda_gp": 10.0} if kind == "wgan_gp" else {})})
    build_train_step(cfg2, g, d)


def test_ada_p_ramps_up_and_clips():
    # target = -1: sign(rt_ema - target) is +1 whenever rt_ema > -1, so p
    # climbs by bsz/(ada_kimg*1000) per step and clips at 1.
    cfg = tiny(**{"train.augment": FULL, "train.ada_target": -1.0,
                  "train.ada_kimg": 0.08})  # adj = 8/80 = 0.1/step
    g, d = build_models(cfg.model, cfg.train.precision)
    st = create_train_state(cfg, g, d)
    assert float(st.ada_p) == 0.0
    step = build_train_step(cfg, g, d)
    b = batch(cfg)
    for _ in range(5):
        st, m = step(st, b)
    np.testing.assert_allclose(float(st.ada_p), 0.5, atol=1e-6)
    assert float(m["ada_p"]) == float(st.ada_p)
    for _ in range(10):
        st, m = step(st, b)
    assert float(st.ada_p) == 1.0  # clipped


def test_ada_p_stays_floored_when_rt_below_target():
    # target = 2: rt can never exceed it, p is pushed down and clips at 0.
    cfg = tiny(**{"train.augment": FULL, "train.ada_target": 2.0,
                  "train.ada_kimg": 0.08})
    g, d = build_models(cfg.model, cfg.train.precision)
    st = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)
    for _ in range(5):
        st, m = step(st, b)
    assert float(st.ada_p) == 0.0
    assert -1.0 <= float(st.ada_rt) <= 1.0


@pytest.mark.slow  # 55s: four step compiles at different batch sizes; the
# cheaper ADA semantics tests (ramp/floor/resume) stay in the default tier.
def test_ada_rt_window_is_image_budget_scaled():
    """The r_t EMA integrates over a fixed IMAGE budget (the paper's
    convention), not a fixed step count: alpha = max(0.5, 1 - bsz/1280).
    Verified both at the formula and through a real train step — starting
    from ada_rt = 0, the first step's blended estimate must equal
    (1 - alpha(bsz)) * rt_batch."""
    from tpugan.train.steps import ada_rt_alpha

    assert ada_rt_alpha(128) == pytest.approx(0.9)  # round-4's A/B blend
    assert ada_rt_alpha(8) == pytest.approx(1.0 - 8 / 1280.0)
    assert ada_rt_alpha(4096) == 0.5  # one batch never overwrites r_t

    for bsz in (8, 16):
        cfg = tiny(**{"train.augment": FULL, "train.ada_target": 0.6,
                      "data.batch_size": bsz})
        g, d = build_models(cfg.model, cfg.train.precision)
        st = create_train_state(cfg, g, d)
        st, m = build_train_step(cfg, g, d)(st, batch(cfg))
        want = (1.0 - ada_rt_alpha(bsz)) * float(m["ada_rt_batch"])
        np.testing.assert_allclose(float(st.ada_rt), want, rtol=1e-6)


def test_ada_state_resumes_exactly():
    """Continuing from a mid-run state snapshot reproduces the uninterrupted
    trajectory — ADA's scalars live in the donated TrainState like
    everything else."""
    cfg = tiny(**{"train.augment": FULL, "train.ada_target": 0.6,
                  "train.ada_kimg": 0.8})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    st = create_train_state(cfg, g, d)
    for _ in range(4):
        st, m = step(st, b)
    straight = (float(st.ada_p), float(st.ada_rt), float(m["loss_d"]))

    st = create_train_state(cfg, g, d)
    for _ in range(2):
        st, _ = step(st, b)
    snap = jax.tree.map(jnp.copy, st)  # "checkpoint"
    for _ in range(2):
        snap, m = step(snap, b)
    resumed = (float(snap.ada_p), float(snap.ada_rt), float(m["loss_d"]))
    assert straight == resumed
