"""Data parallelism on the 8-fake-CPU-device mesh.

The driver validates the real multi-chip path via __graft_entry__'s
dryrun_multichip; these tests check the same sharded train step locally:
it compiles, runs, matches the single-device result, and actually
distributes the batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.parallel import batch_sharding, make_mesh, shard_train_state
from tpugan.train import build_train_step, create_train_state


def tiny():
    cfg = get_preset("dcgan_cifar10")
    return cfg.override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32",
    })


def batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    return {"image": jnp.asarray(rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    # single device
    s1 = create_train_state(cfg, g, d)
    for _ in range(2):
        s1, m1 = step(s1, b)

    # 8-way data parallel: replicate state, shard batch
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


def test_batch_actually_sharded():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 8, 8, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    # each device holds 16/8 = 2 rows of the batch
    shard_shapes = {tuple(s.data.shape) for s in xs.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4


def test_mesh_over_request_rejected():
    """Asking for more devices than exist must fail, not silently truncate
    to a smaller mesh (2x per-chip batch, wrong throughput assumptions)."""
    with pytest.raises(ValueError, match="only"):
        make_mesh(999)


def test_fsdp_2d_mesh_matches_single_device():
    """(data=4, model=2) FSDP placement: same numerics, sharded weights."""
    from tpugan.parallel.fsdp import (
        batch_sharding_2d,
        make_mesh_2d,
        shard_train_state_fsdp,
    )

    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    s1 = create_train_state(cfg, g, d)
    s1, m1 = step(s1, b)

    mesh = make_mesh_2d(4, 2)
    s8 = shard_train_state_fsdp(create_train_state(cfg, g, d), mesh)
    # conv weights must actually be sharded over the model axis
    w = s8.params_g["block0"]["conv"]["w"]
    shard_shapes = {tuple(sh.data.shape) for sh in w.addressable_shards}
    assert all(s[-1] == w.shape[-1] // 2 for s in shard_shapes), shard_shapes
    b8 = jax.device_put(b, batch_sharding_2d(mesh))
    s8, m8 = step(s8, b8)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m8["loss_d"]),
                               rtol=1e-4)
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(s8.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)


def test_spatial_sharding_halo_conv_matches_dense():
    """Height-sharded conv with ppermute halo exchange == unsharded conv."""
    from jax.sharding import Mesh
    from tpugan.ops.convs import conv2d
    from tpugan.parallel.spatial import shard_spatial, spatial_conv2d

    rng = np.random.default_rng(0)
    n, h, w_dim, cin, cout = 2, 32, 16, 8, 16
    x = jnp.asarray(rng.standard_normal((n, h, w_dim, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout)).astype(np.float32) * 0.1)

    ref = conv2d(x, w, stride=2, padding=1, impl="xla")

    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    xs = shard_spatial(x, mesh)
    got = spatial_conv2d(xs, w, mesh)
    assert got.shape == (n, h // 2, w_dim // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # output is actually sharded over the mesh
    shard_h = {s.data.shape[1] for s in got.addressable_shards}
    assert shard_h == {h // 2 // 4}


def _fast_tiny(tmp, mesh_shape=0):
    """The flagship throughput preset (device-resident + FusedProp +
    scan-fused dispatch) shrunk for the virtual mesh."""
    import dataclasses

    cfg = get_preset("dcgan_celeba64_fast").override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.total_steps": 4, "train.steps_per_call": 2,
        "train.log_every": 100, "train.sample_every": 0,
        "train.ckpt_every": 0})
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=tmp + "/ckpt", out_dir=tmp + "/out"))


def test_device_resident_dp_matches_single_device(tmp_path):
    """VERDICT r2 #4: the device-resident fast path composes with a DP mesh —
    the HBM dataset is replicated onto the mesh, each gathered batch is
    sharded over 'data', and the trained params match the single-device
    fast path."""
    from tpugan.train import Trainer

    data = {"images": np.random.default_rng(0).integers(
        0, 256, size=(64, 64, 64, 3)).astype(np.uint8)}

    t1 = Trainer(_fast_tiny(str(tmp_path / "a")), data=dict(data))
    t1.train()

    t8 = Trainer(_fast_tiny(str(tmp_path / "b")), data=dict(data),
                 mesh=make_mesh(8))
    t8.train()

    assert int(t1.state.step) == int(t8.state.step) == 4
    # sharded BN/grad reductions reorder float sums: same tolerance band as
    # the other mesh-equivalence tests (2e-3), not bit-exactness
    for a, c in zip(jax.tree.leaves(jax.device_get(t1.state.params_g)),
                    jax.tree.leaves(jax.device_get(t8.state.params_g))):
        np.testing.assert_allclose(a, c, rtol=2e-3, atol=5e-5)
    for a, c in zip(jax.tree.leaves(jax.device_get(t1.state.params_d)),
                    jax.tree.leaves(jax.device_get(t8.state.params_d))):
        np.testing.assert_allclose(a, c, rtol=2e-3, atol=5e-5)


def test_device_resident_dp_actually_partitions():
    """The sharding constraint on the in-step gather makes XLA partition the
    step (gradient/BN all-reduces appear); without it the whole step would
    compile replicated (correct but 1x) — pin the partitioning, not just
    the numbers."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpugan.parallel import shard_train_state
    from tpugan.train import create_train_state

    cfg = tiny().override({"data.device_resident": True})
    g, d = build_models(cfg.model, cfg.train.precision)
    mesh = make_mesh(8)
    step = build_train_step(cfg, g, d, mesh=mesh)
    state = shard_train_state(create_train_state(cfg, g, d), mesh)
    ds = jax.device_put(
        jnp.zeros((64, cfg.model.image_size, cfg.model.image_size,
                   cfg.model.channels), jnp.uint8),
        NamedSharding(mesh, P()))
    compiled = step.lower(state, {"dataset_images": ds}).compile()
    txt = compiled.as_text()
    assert "all-reduce" in txt, "step compiled without any collective"
    # and it actually runs
    s2, m = step(state, {"dataset_images": ds})
    assert np.isfinite(float(m["loss_d"]))


@pytest.mark.slow  # 112s: two Trainer compiles + FSDP resume; the
# fsdp_2d_mesh equivalence + device_resident x FSDP composition tests
# keep FSDP gated in the default tier
def test_trainer_fsdp_wiring(tmp_path):
    """train.fsdp_shards: the Trainer builds the (data, model) mesh itself,
    params/opt actually shard over 'model', training matches the
    single-device run, and checkpoint resume restores the FSDP placement."""
    import dataclasses

    from tpugan.train import Trainer

    def make_cfg(tmp, steps, fsdp, resume=""):
        cfg = tiny().override({
            "data.synthetic_size": 64, "train.total_steps": steps,
            "train.log_every": 100, "train.sample_every": 0,
            "train.ckpt_every": 0, "train.donate": False,
            "train.mesh_shape": 4 if fsdp else None,
            "train.fsdp_shards": 2 if fsdp else 0})
        return dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ckpt_dir=tmp + "/ckpt", out_dir=tmp + "/out",
            resume=resume))

    data = {"images": np.random.default_rng(0).integers(
        0, 256, size=(64, 32, 32, 3)).astype(np.uint8)}

    t1 = Trainer(make_cfg(str(tmp_path / "a"), 4, fsdp=False),
                 data=dict(data))
    t1.train()

    t8 = Trainer(make_cfg(str(tmp_path / "b"), 4, fsdp=True),
                 data=dict(data))
    assert tuple(t8.mesh.axis_names) == ("data", "model")
    w = t8.state.params_g["block0"]["conv"]["w"]
    shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert all(s[-1] == w.shape[-1] // 2 for s in shard_shapes), shard_shapes
    t8.train()

    assert int(t8.state.step) == 4
    for a, c in zip(jax.tree.leaves(jax.device_get(t1.state.params_g)),
                    jax.tree.leaves(jax.device_get(t8.state.params_g))):
        np.testing.assert_allclose(a, c, rtol=2e-3, atol=5e-5)

    # resume restores the FSDP placement and continues
    from tpugan.ckpt import CheckpointManager

    ck = CheckpointManager(str(tmp_path / "b/ckpt"))
    t8.save_checkpoint(ck)
    ck.close()
    t9 = Trainer(make_cfg(str(tmp_path / "c"), 6, fsdp=True,
                          resume=str(tmp_path / "b/ckpt")), data=dict(data))
    t9.train()
    assert int(t9.state.step) == 6
    w9 = t9.state.params_g["block0"]["conv"]["w"]
    assert {tuple(s.data.shape) for s in w9.addressable_shards} == \
        shard_shapes


def test_trainer_fsdp_rejects_spatial_combo(tmp_path):
    import dataclasses

    from tpugan.train import Trainer

    cfg = tiny().override({"train.fsdp_shards": 2,
                           "train.spatial_shards": 2})
    with pytest.raises(ValueError, match="second mesh axis"):
        Trainer(cfg)
    # the rejection must not leak trace-time spatial dispatch state into
    # the process (validation runs before any global side effect)
    from tpugan.parallel.spatial import spatial_active

    assert not spatial_active()


def test_grad_accum_composes_with_dp():
    """grad_accum under a DP mesh: microbatches stay batch-sharded (each
    scan iteration works on B/accum rows split over 'data') and the result
    matches the single-device accumulated step."""
    cfg = tiny().override({"train.grad_accum": 2, "train.donate": False,
                           "model.g_batchnorm": False,
                           "model.d_batchnorm": False})
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    s1 = create_train_state(cfg, g, d)
    s1, m1 = step(s1, b)

    mesh = make_mesh(8)
    # the step must be built mesh-aware so the scanned microbatches carry
    # their 'data' sharding constraint (grad_accum=2 on batch 16 -> 8-row
    # microbatches over 8 devices)
    step8 = build_train_step(cfg, g, d, mesh=mesh)
    s8 = shard_train_state(create_train_state(cfg, g, d), mesh)
    b8 = jax.device_put(b, batch_sharding(mesh))
    # partitioned execution, not replicated: collectives in the compiled HLO
    txt = step8.lower(s8, b8).compile().as_text()
    assert "all-reduce" in txt
    s8, m8 = step8(s8, b8)

    np.testing.assert_allclose(float(m8["loss_d"]), float(m1["loss_d"]),
                               rtol=1e-4)
    for a, c in zip(jax.tree.leaves(jax.device_get(s1.params_g)),
                    jax.tree.leaves(jax.device_get(s8.params_g))):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
