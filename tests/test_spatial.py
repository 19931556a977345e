"""Spatial (H/W) sharding end-to-end: halo primitives, ops dispatch via
spatial_ctx, full models, and the sharded train step on the fake-8-device
CPU mesh.  SURVEY §2b's SP analog (no sequence dimension in image GANs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpugan.ops.convs import conv2d, conv_transpose2d
from tpugan.parallel.spatial import (
    shard_spatial,
    spatial_conv2d,
    spatial_conv_transpose2d,
    spatial_ctx,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("space",))


@pytest.mark.parametrize("dim", [1, 2])
@pytest.mark.parametrize("n_shards", [2, 4])
def test_spatial_conv_matches_dense(rng, dim, n_shards):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 8, 16)) * 0.1, jnp.float32)
    ref = conv2d(x, w, stride=2, padding=1, impl="xla")
    mesh = _mesh(n_shards)
    got = spatial_conv2d(shard_spatial(x, mesh, dim=dim), w, mesh, dim=dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    sizes = {s.data.shape[dim] for s in got.addressable_shards}
    assert sizes == {16 // 2 // n_shards}


@pytest.mark.parametrize("dim", [1, 2])
@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_spatial_convt_matches_dense(rng, dim, n_shards):
    """ConvT halo incl. the Hs=1 edge case (extent 8 over 8 shards)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 8, 4)) * 0.1, jnp.float32)
    ref = conv_transpose2d(x, w, stride=2, padding=1, impl="xla")
    mesh = _mesh(n_shards)
    got = spatial_conv_transpose2d(shard_spatial(x, mesh, dim=dim), w, mesh,
                                   dim=dim)
    assert got.shape == ref.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dim", [1, 2])
def test_spatial_convt_grads_match_dense(rng, dim):
    """The hand-written ConvT VJP (halo-conv dx, einsum+psum dw) equals
    autodiff of the dense transpose conv."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 8, 4)) * 0.1, jnp.float32)
    mesh = _mesh(4)

    def dense(x, w):
        return jnp.sum(jnp.tanh(
            conv_transpose2d(x, w, stride=2, padding=1, impl="xla")))

    def sharded(x, w):
        return jnp.sum(jnp.tanh(
            spatial_conv_transpose2d(x, w, mesh, dim=dim)))

    gx0, gw0 = jax.grad(dense, argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(sharded, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=1e-4, atol=1e-4)


def test_ctx_dispatch_and_fallback(rng):
    """Inside spatial_ctx, qualifying convs shard; non-divisible or
    too-small extents fall back to the dense path (same numbers)."""
    mesh = _mesh(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    small = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 8, 8)) * 0.1, jnp.float32)
    ref = conv2d(x, w, stride=2, padding=1)
    ref_small = conv2d(small, w, stride=2, padding=1)
    with spatial_ctx(mesh):
        got = conv2d(x, w, stride=2, padding=1)
        got_small = conv2d(small, w, stride=2, padding=1)  # 4 < 2*4 → dense
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_small), np.asarray(ref_small),
                               rtol=1e-5, atol=1e-6)


def _models(image_size, rng_seed=0):
    from tpugan.configs import get_preset
    from tpugan.models import build_models

    cfg = get_preset("dcgan_cifar10").override({
        "model.image_size": image_size, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.batch_size": 4, "train.precision": "fp32",
        "data.dataset": "synthetic",
    })
    g, d = build_models(cfg.model, cfg.train.precision)
    return cfg, g, d


def test_generator_256_spatial_matches_dense(rng):
    """Full 256px Generator forward, spatially sharded == dense."""
    cfg, g, d = _models(256)
    params, state = g.init(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)

    ref, _ = jax.jit(lambda p, s, z: g.apply(p, s, z, train=True))(
        params, state, z)
    mesh = _mesh(8)
    with spatial_ctx(mesh):
        got, _ = jax.jit(lambda p, s, z: g.apply(p, s, z, train=True))(
            params, state, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_discriminator_256_spatial_matches_dense(rng):
    cfg, g, d = _models(256)
    params, state = d.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((2, 256, 256, 3)), jnp.float32)

    ref, _ = jax.jit(lambda p, s, x: d.apply(p, s, x, train=True))(
        params, state, x)
    mesh = _mesh(8)
    with spatial_ctx(mesh):
        xs = shard_spatial(x, mesh)
        got, _ = jax.jit(lambda p, s, x: d.apply(p, s, x, train=True))(
            params, state, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_spatial_train_step_matches_dense(rng):
    """Two full alternating train steps at 64px, 4-way H-sharded == dense."""
    from tpugan.train import build_train_step, create_train_state

    cfg, g, d = _models(64)
    batches = [{
        "image": jnp.asarray(rng.integers(0, 256, size=(4, 64, 64, 3))
                             .astype(np.uint8)),
    } for _ in range(2)]

    def run(spatial):
        state = create_train_state(cfg, g, d)
        step = build_train_step(cfg, g, d)
        if spatial:
            mesh = _mesh(4)
            with spatial_ctx(mesh):
                for b in batches:
                    state, m = step(state, b)
        else:
            for b in batches:
                state, m = step(state, b)
        return state, m

    s0, m0 = run(False)
    s1, m1 = run(True)
    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(m1["loss_g"]), float(m0["loss_g"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(jax.device_get(s0.params_g)),
                    jax.tree.leaves(jax.device_get(s1.params_g))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_trainer_spatial_wiring(tmp_path):
    """Trainer honors train.spatial_shards: full public-API run at 64px,
    4-way H-sharded, produces finite losses and samples."""
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_256_spatial").override({
        "model.image_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.dataset": "synthetic", "data.batch_size": 4,
        "data.synthetic_size": 16, "data.hflip": False,
        "train.precision": "fp32", "train.total_steps": 2,
        "train.log_every": 1, "train.sample_every": 2, "train.ckpt_every": 0,
        "train.spatial_shards": 4,
    })
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    try:
        t = Trainer(cfg)
        assert t.spatial_mesh is not None
        m = t.train()
        assert np.isfinite(m["loss_d"]) and np.isfinite(m["loss_g"])
    finally:
        from tpugan.parallel.spatial import set_spatial_mesh

        set_spatial_mesh(None)


@pytest.mark.slow
def test_spatial_256_training_smoke():
    """A ≥256px config actually trains on the 8-device mesh (SURVEY §2b)."""
    from tpugan.train import build_train_step, create_train_state

    cfg, g, d = _models(256)
    rng = np.random.default_rng(0)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    mesh = _mesh(8)
    with spatial_ctx(mesh):
        for i in range(3):
            b = {"image": jnp.asarray(rng.integers(
                0, 256, size=(4, 256, 256, 3)).astype(np.uint8))}
            state, m = step(state, b)
    assert np.isfinite(float(m["loss_d"]))
    assert np.isfinite(float(m["loss_g"]))


@pytest.mark.slow  # 50s: 2-D-mesh compile; the pure spatial-vs-dense
# equivalence stays default and the driver gate runs DP x spatial (2x2).
def test_dp_x_spatial_train_step_matches_dense(rng):
    """2-D DP x spatial: the full train step on a (2 data x 2 space) mesh
    — batch sharded over 'data', feature-map H over 'space', gradient
    psums over data, halo ppermutes over space — matches the dense
    single-device step."""
    from tpugan.parallel.spatial import make_mesh_dp_spatial, shard_spatial
    from tpugan.train import build_train_step, create_train_state

    cfg, g, d = _models(64)
    batches = [{
        "image": jnp.asarray(rng.integers(0, 256, size=(4, 64, 64, 3))
                             .astype(np.uint8)),
    } for _ in range(2)]

    def run(mesh):
        state = create_train_state(cfg, g, d)
        step = build_train_step(cfg, g, d)
        if mesh is not None:
            from tpugan.parallel import shard_train_state

            state = shard_train_state(state, mesh)
            with spatial_ctx(mesh):
                for b in batches:
                    bs = {"image": shard_spatial(b["image"], mesh)}
                    state, m = step(state, bs)
        else:
            for b in batches:
                state, m = step(state, b)
        return state, m

    s0, m0 = run(None)
    s1, m1 = run(make_mesh_dp_spatial(2, 2))
    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(m1["loss_g"]), float(m0["loss_g"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(jax.device_get(s0.params_g)),
                    jax.tree.leaves(jax.device_get(s1.params_g))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


@pytest.mark.slow  # 80s: 2-D-mesh Trainer compile; the
# dp_x_spatial step-equivalence test keeps the path in the default tier
def test_trainer_dp_x_spatial_wiring(tmp_path):
    """Trainer builds the 2-D mesh itself when both train.mesh_shape and
    train.spatial_shards are set; public-API run produces finite losses."""
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_256_spatial").override({
        "model.image_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.dataset": "synthetic", "data.batch_size": 4,
        "data.synthetic_size": 16, "data.hflip": False,
        "train.precision": "fp32", "train.total_steps": 2,
        "train.log_every": 1, "train.sample_every": 0, "train.ckpt_every": 0,
        "train.spatial_shards": 2, "train.mesh_shape": 4,
    })
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    try:
        t = Trainer(cfg)
        assert t.spatial_mesh is not None
        assert dict(t.mesh.shape) == {"data": 4, "space": 2}
        m = t.train()
        assert np.isfinite(m["loss_d"]) and np.isfinite(m["loss_g"])
        # train() must clear the global spatial context on exit (it would
        # otherwise leak into unrelated Trainer instances in this process)
        from tpugan.parallel.spatial import spatial_active

        assert not spatial_active()
    finally:
        from tpugan.parallel.spatial import set_spatial_mesh

        set_spatial_mesh(None)


@pytest.mark.slow  # 68s: two jitted 2-D-mesh Trainer compiles; the
# dp-x-spatial step/wiring equivalence tests stay default
def test_dp_x_spatial_checkpoint_resume(tmp_path):
    """Checkpoint/resume through the 2-D DP x spatial Trainer: restore
    reshards onto the ('data','space') mesh and training continues."""
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    def cfg_for(steps):
        cfg = get_preset("dcgan_256_spatial").override({
            "model.image_size": 64, "model.ngf": 8, "model.ndf": 8,
            "model.nz": 8, "data.dataset": "synthetic", "data.batch_size": 4,
            "data.synthetic_size": 16, "data.hflip": False,
            "train.precision": "fp32", "train.total_steps": steps,
            "train.log_every": 100, "train.sample_every": 0,
            "train.ckpt_every": 2, "train.spatial_shards": 2,
            "train.mesh_shape": 2,
        })
        return dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
            out_dir=str(tmp_path / "out")))

    try:
        Trainer(cfg_for(2)).train()
        cfg2 = cfg_for(4)
        cfg2 = dataclasses.replace(cfg2, train=dataclasses.replace(
            cfg2.train, resume=cfg2.train.ckpt_dir))
        t2 = Trainer(cfg2)
        m = t2.train()
        assert int(t2.state.step) == 4
        assert np.isfinite(m["loss_d"])
    finally:
        from tpugan.parallel.spatial import set_spatial_mesh

        set_spatial_mesh(None)


def test_sampler_spatial_matches_dense(rng):
    """VERDICT r2 #7: a ≥256px model samples through the spatial ctx — the
    standalone Sampler (no Trainer, no ambient ctx) builds its own 'space'
    mesh from cfg.train.spatial_shards and reproduces the dense pixels."""
    from tpugan.sample import Sampler

    cfg, g, _ = _models(256)
    params, state = g.init(jax.random.PRNGKey(0))

    dense = Sampler(cfg, g, params, state)
    sharded = Sampler(cfg.override({"train.spatial_shards": 8}), g,
                      params, state)
    a = dense.sample(4, seed=3)
    b = sharded.sample(4, seed=3)
    assert a.shape == b.shape == (4, 256, 256, 3)
    np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4)
    # chunked generation stays deterministic through the sharded path
    np.testing.assert_array_equal(sharded.sample(4, seed=3, batch_size=2), b)


def test_evaluate_spatial_sharded(rng):
    """evaluate() on a spatial config runs its generator sharded (the same
    hardware that trains a too-big-for-one-chip model can score it)."""
    import dataclasses

    from tpugan.eval import evaluate

    cfg, g, _ = _models(64)
    cfg = cfg.override({"train.spatial_shards": 4})
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, fid_n=8, fid_batch=4))
    params, state = g.init(jax.random.PRNGKey(0))
    real = rng.integers(0, 256, size=(8, 64, 64, 3)).astype(np.uint8)
    scores = evaluate(cfg, g, params, state, seed=0, real_images=real)
    assert np.isfinite(scores["fid"])


def test_sampler_rejects_insufficient_devices_for_spatial_shards():
    """The standalone spatial Sampler must not silently shard over fewer
    devices than cfg.train.spatial_shards (a smaller mesh changes sharding
    and can OOM the model that needed the full split)."""
    import pytest as _pytest

    from tpugan.sample import Sampler

    cfg, g, _ = _models(256)
    params, state = g.init(jax.random.PRNGKey(0))
    cfg16 = cfg.override({"train.spatial_shards": 16})  # only 8 visible
    with _pytest.raises(ValueError, match="spatial_shards"):
        Sampler(cfg16, g, params, state).sample(2, seed=0)
