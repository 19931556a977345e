"""tpugan -> torch .pth export (the return leg of the migration story).

``ckpt/torch_export.py`` is the inverse of ``ckpt/torch_import.py``:
a model trained here must load back into the reference's framework with
identical semantics.  Proven by round-tripping a state whose BatchNorm
running stats and spectral-norm u buffers have actually MOVED (a few real
train steps), through export -> import, and requiring bit-exact equality.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpugan.ckpt.torch_export import export_torch_checkpoint
from tpugan.ckpt.torch_import import import_torch_state
from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.train import build_train_step, create_train_state


def _cfg(preset, **over):
    base = {"model.ngf": 16, "model.ndf": 16, "model.nz": 16,
            "data.dataset": "synthetic", "data.batch_size": 8,
            "train.precision": "fp32"}
    base.update(over)
    return get_preset(preset).override(base)


def _stepped_state(cfg, n=2, seed=0):
    """A TrainState after ``n`` real train steps, so BN running stats and
    SN u buffers hold loop values, not inits."""
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    rng = np.random.default_rng(seed)
    s, c = cfg.model.image_size, cfg.model.channels
    for i in range(n):
        batch = {"image": jnp.asarray(rng.integers(
            0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}
        if cfg.model.arch == "cdcgan":
            batch["label"] = jnp.asarray(rng.integers(
                0, cfg.model.n_classes,
                size=cfg.data.batch_size).astype(np.int32))
        state, _ = step(state, batch)
    return state


def _assert_tree_equal(path, a, b):
    if isinstance(b, dict):
        assert isinstance(a, dict) and set(a) == set(b), path
        for k in b:
            _assert_tree_equal(f"{path}.{k}" if path else k, a[k], b[k])
    else:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=path)


# BN-in-D, spectral-norm u buffers, and conditional (embed + proj) cover
# every distinct storage surface the exporter touches
PRESETS = ["dcgan_cifar10", "sngan_cifar10", "cdcgan_celeba64"]


@pytest.mark.parametrize("preset", PRESETS)
def test_export_import_round_trip_bit_exact(preset):
    """export (jax->torch) then import (torch->jax) reproduces params,
    BN stats, and SN u exactly — the maps are true inverses in this
    direction too (test_torch_import proves torch->jax->torch)."""
    cfg = _cfg(preset)
    state = _stepped_state(cfg)
    out = export_torch_checkpoint(cfg, state)
    assert out["step"] == 2
    back = import_torch_state(cfg, out["G"], out["D"], step=out["step"])
    for name in ("params_g", "state_g", "params_d", "state_d"):
        _assert_tree_equal(name, getattr(back, name), getattr(state, name))


def test_export_moved_buffers():
    """The exported state_dict carries LOOP values: BN running stats off
    their init and (for SN) u buffers present — guards against an exporter
    that silently reinitializes buffers."""
    cfg = _cfg("sngan_cifar10")
    out = export_torch_checkpoint(cfg, _stepped_state(cfg))
    moved = [k for k, v in out["G"].items()
             if k.endswith("running_mean") and float(v.abs().max()) > 1e-6]
    assert moved, "G BN running_mean still at init after train steps"
    assert any(k.endswith(".u") for k in out["D"]), "no SN u buffers in D"


def test_export_ema_selects_ema_weights():
    cfg = _cfg("dcgan_cifar10", **{"train.ema": 0.9})
    state = _stepped_state(cfg)
    raw = export_torch_checkpoint(cfg, state)
    ema = export_torch_checkpoint(cfg, state, use_ema=True)
    # EMA lags the raw weights after two steps — the two exports differ,
    # and the EMA one matches params_g_ema exactly
    assert not torch.equal(raw["G"]["final.weight"], ema["G"]["final.weight"])
    exp = np.asarray(state.params_g_ema["final"]["conv"]["w"]).transpose(
        2, 3, 0, 1)
    np.testing.assert_array_equal(ema["G"]["final.weight"].numpy(), exp)

    no_ema_cfg = _cfg("dcgan_cifar10")
    with pytest.raises(ValueError, match="no EMA"):
        export_torch_checkpoint(no_ema_cfg, _stepped_state(no_ema_cfg),
                                use_ema=True)


def test_export_torch_cli_round_trip(tmp_path):
    """checkpoint dir -> `tpugan export-torch` -> .pth loadable by torch
    AND by `tpugan import-torch` (full there-and-back through both CLIs)."""
    from tpugan.ckpt import CheckpointManager
    from tpugan.cli import main as cli_main
    from tpugan.train import TrainState

    cfg = _cfg("dcgan_mnist")
    state = _stepped_state(cfg)
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(int(state.step), state, cfg.to_json())
    mgr.close()

    pth = str(tmp_path / "model.pth")
    cli_main(["export-torch", "--ckpt", ckpt_dir, "--out", pth])
    loaded = torch.load(pth, map_location="cpu", weights_only=True)
    assert set(loaded) == {"G", "D", "step"} and loaded["step"] == 2
    direct = export_torch_checkpoint(cfg, state)
    for net in ("G", "D"):
        assert set(loaded[net]) == set(direct[net])
        for k in loaded[net]:
            np.testing.assert_array_equal(loaded[net][k].numpy(),
                                          direct[net][k].numpy(),
                                          err_msg=f"{net}:{k}")

    back_dir = str(tmp_path / "ckpt_back")
    cli_main(["import-torch", "dcgan_mnist",
              "--set", "model.ngf=16", "--set", "model.ndf=16",
              "--set", "model.nz=16", "--set", "train.precision=fp32",
              "--ckpt", pth, "--out", back_dir])
    g, d = build_models(cfg.model, cfg.train.precision)
    template = create_train_state(cfg, g, d)
    back = TrainState(**CheckpointManager(back_dir).restore(dict(template)))
    for name in ("params_g", "state_g", "params_d", "state_d"):
        _assert_tree_equal(name, getattr(back, name), getattr(state, name))
