"""Parallelism composition matrix (VERDICT r3 #4): every feature pair
either proves equivalence on the virtual 8-device mesh or fails fast with
a clear error — silence is the one wrong option.

Covered here: grad_accum x FSDP, device_resident x FSDP, grad_accum x
spatial (pure and 2-D DP x spatial), multihost x FSDP (slow tier, 2 OS
processes), and the multihost x spatial x device_resident rejection.
The previously-proven pairs live in test_parallel.py (grad_accum x DP,
device_resident x DP) and test_spatial.py (DP x spatial).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.parallel.fsdp import (
    batch_sharding_2d,
    make_mesh_2d,
    shard_train_state_fsdp,
)
from tpugan.train import Trainer, build_train_step, create_train_state


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tiny(**over):
    cfg = get_preset("dcgan_cifar10")
    return cfg.override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32", **over,
    })


def batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    return {"image": jnp.asarray(rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}


def _params_close(a, b, rtol=2e-3, atol=5e-5):
    for x, y in zip(jax.tree.leaves(jax.device_get(a)),
                    jax.tree.leaves(jax.device_get(b))):
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# grad_accum x FSDP
# ---------------------------------------------------------------------------


def test_grad_accum_composes_with_fsdp():
    """Accumulated microbatches under the (data=4, model=2) ZeRO-3 mesh:
    each scanned microbatch keeps its 'data' sharding, weights stay
    model-sharded, and the result matches the single-device accumulated
    step (BN off: accumulation is then exactly full-batch)."""
    cfg = tiny(**{"train.grad_accum": 2, "train.donate": False,
                  "model.g_batchnorm": False, "model.d_batchnorm": False})
    g, d = build_models(cfg.model, cfg.train.precision)
    b = batch(cfg)

    s1 = create_train_state(cfg, g, d)
    s1, m1 = build_train_step(cfg, g, d)(s1, b)

    mesh = make_mesh_2d(4, 2)
    step8 = build_train_step(cfg, g, d, mesh=mesh)
    s8 = shard_train_state_fsdp(create_train_state(cfg, g, d), mesh)
    b8 = jax.device_put(b, batch_sharding_2d(mesh))
    txt = step8.lower(s8, b8).compile().as_text()
    # partitioned execution: gradient reductions over 'data' AND weight
    # gathers over 'model' must both appear
    assert "all-reduce" in txt or "reduce-scatter" in txt, "no grad collective"
    assert "all-gather" in txt, "no FSDP weight gather"
    s8, m8 = step8(s8, b8)

    np.testing.assert_allclose(float(m8["loss_d"]), float(m1["loss_d"]),
                               rtol=1e-4)
    _params_close(s1.params_g, s8.params_g)
    _params_close(s1.params_d, s8.params_d)


# ---------------------------------------------------------------------------
# device_resident x FSDP
# ---------------------------------------------------------------------------


def _fsdp_fast(tmp, fsdp):
    """The device-resident + FusedProp fast preset shrunk for the mesh,
    optionally with FSDP sharding."""
    cfg = get_preset("dcgan_celeba64_fast").override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.total_steps": 4, "train.steps_per_call": 2,
        "train.log_every": 100, "train.sample_every": 0,
        "train.ckpt_every": 0,
        "train.mesh_shape": 4 if fsdp else None,
        "train.fsdp_shards": 2 if fsdp else 0})
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=tmp + "/ckpt", out_dir=tmp + "/out"))


@pytest.mark.slow  # 58s: two 2-D-mesh Trainer compiles; device_resident
# x DP and grad_accum x FSDP keep the pair's axes covered in the default
# tier, and the driver's multichip gate runs FSDP every round.
def test_device_resident_composes_with_fsdp(tmp_path):
    """The HBM-resident dataset replicates onto the (data, model) mesh, the
    in-step gathered batch shards over 'data', weights stay model-sharded,
    and training matches the single-device fast path."""
    data = {"images": np.random.default_rng(0).integers(
        0, 256, size=(64, 64, 64, 3)).astype(np.uint8)}

    t1 = Trainer(_fsdp_fast(str(tmp_path / "a"), fsdp=False),
                 data=dict(data))
    t1.train()

    t8 = Trainer(_fsdp_fast(str(tmp_path / "b"), fsdp=True),
                 data=dict(data))
    assert tuple(t8.mesh.axis_names) == ("data", "model")
    w = t8.state.params_g["block0"]["conv"]["w"]
    shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert all(s[-1] == w.shape[-1] // 2 for s in shard_shapes), shard_shapes
    t8.train()

    assert int(t1.state.step) == int(t8.state.step) == 4
    _params_close(t1.state.params_g, t8.state.params_g)
    _params_close(t1.state.params_d, t8.state.params_d)


# ---------------------------------------------------------------------------
# grad_accum x spatial
# ---------------------------------------------------------------------------


def _spatial_cfg(image_size=64, accum=2):
    return get_preset("dcgan_cifar10").override({
        "model.image_size": image_size, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "data.batch_size": 4, "train.precision": "fp32",
        "data.dataset": "synthetic", "train.grad_accum": accum,
        "train.donate": False,
    })


def test_grad_accum_composes_with_spatial(rng):
    """Accumulated microbatches with H-sharded halo convs == the dense
    accumulated step (same per-microbatch BN in both runs)."""
    from jax.sharding import Mesh
    from tpugan.parallel.spatial import spatial_ctx

    cfg = _spatial_cfg()
    g, d = build_models(cfg.model, cfg.train.precision)
    b = {"image": jnp.asarray(rng.integers(0, 256, size=(4, 64, 64, 3))
                              .astype(np.uint8))}

    step = build_train_step(cfg, g, d)
    s0 = create_train_state(cfg, g, d)
    s0, m0 = step(s0, b)

    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    s1 = create_train_state(cfg, g, d)
    with spatial_ctx(mesh):
        s1, m1 = step(s1, b)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-3)
    _params_close(s0.params_g, s1.params_g)
    _params_close(s0.params_d, s1.params_d)


@pytest.mark.slow  # 32s: 2-D-mesh compile; the pure grad_accum x spatial
# equivalence stays default, and the driver gate runs DP x spatial.
def test_grad_accum_composes_with_dp_spatial_2d(rng):
    """Accumulation on the 2-D ('data', 'space') mesh: microbatches keep
    their 'data' batch sharding (collectives in the compiled HLO — the
    previously-silent path) and the numbers match the dense step."""
    from tpugan.parallel.spatial import make_mesh_dp_spatial, spatial_ctx
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _spatial_cfg()
    g, d = build_models(cfg.model, cfg.train.precision)
    b = {"image": jnp.asarray(rng.integers(0, 256, size=(4, 64, 64, 3))
                              .astype(np.uint8))}

    step = build_train_step(cfg, g, d)
    s0 = create_train_state(cfg, g, d)
    s0, m0 = step(s0, b)

    mesh = make_mesh_dp_spatial(2, 2)
    from tpugan.parallel import shard_train_state

    with spatial_ctx(mesh):
        step2 = build_train_step(cfg, g, d, mesh=mesh)
        s1 = shard_train_state(create_train_state(cfg, g, d), mesh)
        b1 = jax.device_put(
            b, NamedSharding(mesh, P("data", None, None, None)))
        txt = step2.lower(s1, b1).compile().as_text()
        assert "all-reduce" in txt, "accum x dp-spatial compiled collective-free"
        s1, m1 = step2(s1, b1)

    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]),
                               rtol=1e-3)
    _params_close(s0.params_g, s1.params_g)
    _params_close(s0.params_d, s1.params_d)


# ---------------------------------------------------------------------------
# multihost x spatial x device_resident: loud rejection (ADVICE r3)
# ---------------------------------------------------------------------------


def test_multihost_spatial_device_resident_rejected(tmp_path, monkeypatch):
    """Under multi-host the H-sharded dataset placement would treat each
    process's full copy as a local shard (wrong global shape) — the
    trainer must refuse, not mis-shard."""
    cfg = _spatial_cfg(accum=1).override({
        "data.device_resident": True, "data.synthetic_size": 64,
        "train.spatial_shards": 2, "train.mesh_shape": 2,
        "train.total_steps": 2, "train.log_every": 10,
        "train.sample_every": 0, "train.ckpt_every": 0})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="device_resident"):
        Trainer(cfg)  # rejected at construction, before any side effect
    from tpugan.parallel.spatial import spatial_active

    assert not spatial_active()  # no trace-time dispatch state leaked
