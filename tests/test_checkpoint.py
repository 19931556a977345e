"""Checkpoint round-trip and exact-resume fidelity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.ckpt import CheckpointManager
from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.train import TrainState, build_train_step, create_train_state


def tiny():
    cfg = get_preset("dcgan_mnist")
    return cfg.override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32",
    })


def batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    return {"image": jnp.asarray(rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}


def test_roundtrip_bit_exact(tmp_path):
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    state, _ = step(state, batch(cfg))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(int(state.step), state, cfg.to_json())
    mgr.wait()

    template = create_train_state(cfg, g, d)
    restored = TrainState(**mgr.restore(dict(template)))
    for a, b in zip(jax.tree.leaves(jax.device_get(dict(state))),
                    jax.tree.leaves(jax.device_get(dict(restored)))):
        np.testing.assert_array_equal(a, b)
    mgr.close()


def test_resume_continues_identically(tmp_path):
    """train 4 == train 2 + save + restore + train 2 (bit-exact, incl RNG)."""
    cfg = tiny()
    g, d = build_models(cfg.model, cfg.train.precision)
    step = build_train_step(cfg, g, d)
    b = batch(cfg)

    s_full = create_train_state(cfg, g, d)
    for _ in range(4):
        s_full, _ = step(s_full, b)

    s_half = create_train_state(cfg, g, d)
    for _ in range(2):
        s_half, _ = step(s_half, b)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(int(s_half.step), s_half, "")
    mgr.wait()
    template = create_train_state(cfg, g, d)
    s_res = TrainState(**mgr.restore(dict(template)))
    for _ in range(2):
        s_res, _ = step(s_res, b)

    for a, c in zip(jax.tree.leaves(jax.device_get(s_full.params_g)),
                    jax.tree.leaves(jax.device_get(s_res.params_g))):
        np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(np.asarray(s_full.rng),
                                  np.asarray(s_res.rng))
    mgr.close()


def test_restore_cross_topology_fallback(tmp_path):
    """A checkpoint whose sharding metadata names foreign devices (TPU-
    trained, opened on a CPU host) makes orbax's metadata-driven restore
    raise ValueError; the manager then retries with explicit
    single-device shardings.  Wire-level test: force the first restore
    attempt to fail the same way and assert the fallback returns the
    saved state."""
    from tpugan.ckpt import CheckpointManager
    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    cfg = get_preset("dcgan_mnist").override({
        "model.ngf": 8, "model.ndf": 8, "model.nz": 8,
        "train.precision": "fp32"})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    ck = CheckpointManager(str(tmp_path / "c"))
    ck.save(1, state)
    ck.close()

    ck2 = CheckpointManager(str(tmp_path / "c"))
    orig = ck2.mgr.restore
    calls = {"n": 0}

    def flaky_restore(step, args=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError(
                "sharding passed to deserialization should be specified, "
                "concrete and an instance of `jax.sharding.Sharding`.")
        return orig(step, args=args)

    ck2.mgr.restore = flaky_restore
    restored = ck2.restore(dict(state))
    ck2.close()
    assert calls["n"] == 2  # fallback path actually ran
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params_g)),
                    jax.tree.leaves(restored["params_g"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_json_written_atomically(tmp_path):
    """The self-describing config.json lands via tmp+rename (one writer,
    never a torn file) and leaves no .tmp behind."""
    import json as _json
    import os as _os

    from tpugan.ckpt import CheckpointManager
    from tpugan.configs import get_preset

    cfg = get_preset("dcgan_mnist")
    mgr = CheckpointManager(str(tmp_path / "c"), async_save=False)
    mgr.save(0, {"x": np.zeros(2, np.float32)}, cfg.to_json())
    mgr.close()
    path = tmp_path / "c" / "config.json"
    assert path.exists() and not _os.path.exists(str(path) + ".tmp")
    assert _json.loads(path.read_text())["name"] == "dcgan_mnist"
