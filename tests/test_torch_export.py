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
    assert set(loaded) == {"G", "D", "step", "ema", "opt_G", "opt_D",
                           "tpugan_export"}
    assert loaded["step"] == 2 and loaded["ema"] is False
    assert loaded["tpugan_export"]["optimizer"] == "adam"
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
    # the CLI path recognizes its own export and restores the moments warm
    _assert_opt_equal(back, state)


# ---------------------------------------------------------------------------
# Optimizer-state round trip (tpugan -> torch -> tpugan resumes warm)
# ---------------------------------------------------------------------------

def _assert_opt_equal(a, b, names=("opt_g", "opt_d")):
    import jax

    for name in names:
        la, lb = (jax.tree.leaves(getattr(a, name)),
                  jax.tree.leaves(getattr(b, name)))
        assert len(la) == len(lb), name
        for i, (x, y) in enumerate(zip(la, lb)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{name}[{i}]")


# adam (mu+nu+count), rmsprop (nu only), conditional (embed/proj params
# ride in the same order contract), and spectral-norm D (u buffers must
# stay OUT of parameters() or every later D moment misaligns) cover the
# exporter's moment surfaces
@pytest.mark.parametrize("preset", ["dcgan_cifar10", "wgan_cifar10",
                                    "cdcgan_celeba64", "sngan_cifar10"])
def test_optimizer_state_round_trip_bit_exact(preset, tmp_path):
    """tpugan's own export defines the torch param order, so Adam/RMSprop
    moments survive tpugan -> .pth -> tpugan losslessly (round-4 VERDICT
    directive: resume fine-tuning warm on both sides)."""
    from tpugan.ckpt.torch_import import (
        extract_export_meta,
        import_optimizer_state,
    )

    cfg = _cfg(preset)
    state = _stepped_state(cfg, n=3)
    out = export_torch_checkpoint(cfg, state)
    pth = str(tmp_path / "m.pth")
    torch.save(out, pth)
    loaded = torch.load(pth, map_location="cpu", weights_only=True)

    # D's moments must have actually moved, or the equality is vacuous
    # (G's may legitimately be zero under wgan's n_critic=5 in 3 steps)
    assert any(float(v.abs().max()) > 0
               for e in loaded["opt_D"]["state"].values()
               for k, v in e.items() if k != "step")

    meta, opt_g_sd, opt_d_sd = extract_export_meta(loaded)
    assert meta is not None and meta["optimizer"] == cfg.optim.optimizer
    back = import_torch_state(cfg, loaded["G"], loaded["D"],
                              step=loaded["step"])
    back = import_optimizer_state(cfg, back, opt_g_sd, opt_d_sd)
    _assert_opt_equal(back, state)


def test_exported_opt_loads_into_torch_optimizer():
    """The torch side resumes warm too: a torch.optim.Adam over the twin
    loads the exported state_dict (moments intact) and steps."""
    from tpugan.parity.runners import build_torch_twins

    cfg = _cfg("dcgan_cifar10")
    state = _stepped_state(cfg)
    out = export_torch_checkpoint(cfg, state)
    tg, td = build_torch_twins(cfg, state)
    for twin, key, lr in ((tg, "opt_G", cfg.optim.lr_g),
                          (td, "opt_D", cfg.optim.lr_d)):
        opt = torch.optim.Adam(twin.parameters(), lr=lr,
                               betas=(cfg.optim.beta1, cfg.optim.beta2),
                               eps=cfg.optim.eps)
        opt.load_state_dict(out[key])
        got = opt.state_dict()["state"]
        for i, entry in out[key]["state"].items():
            assert torch.equal(got[i]["exp_avg"], entry["exp_avg"]), (key, i)
        loss = sum((p * p).sum() for p in twin.parameters())
        loss.backward()
        opt.step()  # a warm fine-tune step runs


def test_optimizer_mismatch_refused():
    """Moments exported under one update rule never land in another: the
    rmsprop export has no exp_avg column, and import fails loudly rather
    than guessing."""
    from tpugan.ckpt.torch_import import import_optimizer_state

    cfg = _cfg("wgan_cifar10")  # rmsprop
    state = _stepped_state(cfg, n=3)
    out = export_torch_checkpoint(cfg, state)
    adam_cfg = _cfg("wgan_cifar10", **{"optim.optimizer": "adam"})
    with pytest.raises(ValueError, match="optimizer rule mismatch"):
        import_optimizer_state(adam_cfg, state, out["opt_G"], out["opt_D"])


def test_override_drops_that_nets_moments(tmp_path, capsys):
    """`import-torch --ckpt export.pth --g other.pth` must NOT warm-restore
    the export's G moments onto the other file's weights — overriding a
    net's weights drops that net's moments (D's, untouched, stay warm)."""
    from tpugan.ckpt import CheckpointManager
    from tpugan.cli import main as cli_main
    from tpugan.train import TrainState

    cfg = _cfg("dcgan_mnist")
    state = _stepped_state(cfg, n=3)
    pth = str(tmp_path / "export.pth")
    torch.save(export_torch_checkpoint(cfg, state), pth)
    other = str(tmp_path / "other_g.pth")
    torch.save({"G": export_torch_checkpoint(
        cfg, _stepped_state(cfg, seed=9))["G"]}, other)

    out_dir = str(tmp_path / "back")
    cli_main(["import-torch", "dcgan_mnist",
              "--set", "model.ngf=16", "--set", "model.ndf=16",
              "--set", "model.nz=16", "--set", "train.precision=fp32",
              "--ckpt", pth, "--g", other, "--out", out_dir])
    assert "restored warm for D" in capsys.readouterr().out

    g, d = build_models(cfg.model, cfg.train.precision)
    template = create_train_state(cfg, g, d)
    back = TrainState(**CheckpointManager(out_dir).restore(dict(template)))
    import jax
    # G moments fresh (adam inits mu/nu to zero; count 0)...
    assert all(float(np.abs(np.asarray(x)).max()) == 0.0
               for x in jax.tree.leaves(back.opt_g))
    # ...while D's round-tripped warm from the export
    _assert_opt_equal(back, state, names=("opt_d",))


def test_ema_export_self_describes_and_round_trips():
    """`export --ema` marks the .pth (round-4 VERDICT: an unmarked EMA
    export loses provenance); importing it seeds BOTH the raw and the EMA
    weights, so the Sampler (EMA-preferring) reproduces the original EMA
    sampler output bit-exactly."""
    from tpugan.models import build_models as _bm
    from tpugan.sample import Sampler

    cfg = _cfg("dcgan_cifar10", **{"train.ema": 0.9})
    state = _stepped_state(cfg)
    out = export_torch_checkpoint(cfg, state, use_ema=True)
    assert out["ema"] is True and out["tpugan_export"]["ema"] is True
    assert export_torch_checkpoint(cfg, state)["ema"] is False

    back = import_torch_state(cfg, out["G"], out["D"], step=out["step"])
    _assert_tree_equal("params_g", back.params_g, state.params_g_ema)
    _assert_tree_equal("params_g_ema", back.params_g_ema,
                       state.params_g_ema)

    g, _ = _bm(cfg.model, cfg.train.precision)
    want = Sampler(cfg, g, state.params_g_ema, state.state_g).sample(
        4, seed=7)
    got = Sampler(cfg, g, back.params_g_ema, back.state_g).sample(4, seed=7)
    np.testing.assert_array_equal(got, want)


def test_export_lr_is_schedule_effective():
    """Under optim.schedule='linear' the exported param_groups carry the
    LR in effect at the exported count, not the initial value — torch's
    load_state_dict overrides the constructor LR with the saved group's,
    so an initial-LR export would make a warm fine-tune step at the
    un-decayed rate on a decayed model (round-5 review)."""
    from tpugan.train.state import lr_schedule

    cfg = _cfg("dcgan_cifar10", **{"optim.schedule": "linear",
                                   "train.total_steps": 4})
    state = _stepped_state(cfg, n=3)  # past decay_start_frac=0.5 of 4
    out = export_torch_checkpoint(cfg, state)
    exp_g = float(lr_schedule(cfg, cfg.optim.lr_g)(3))
    exp_d = float(lr_schedule(cfg, cfg.optim.lr_d)(3))
    assert exp_g < cfg.optim.lr_g  # the test is vacuous unless decayed
    assert out["opt_G"]["param_groups"][0]["lr"] == pytest.approx(exp_g)
    assert out["opt_D"]["param_groups"][0]["lr"] == pytest.approx(exp_d)
    # constant schedule still exports the configured LR verbatim
    cfg2 = _cfg("dcgan_cifar10")
    out2 = export_torch_checkpoint(cfg2, _stepped_state(cfg2))
    assert out2["opt_G"]["param_groups"][0]["lr"] == cfg2.optim.lr_g


def test_foreign_alias_opt_keys_not_trusted():
    """A merged dict carrying the tpugan_export marker next to a FOREIGN
    optimizer key ('optimizerG' etc.) must not warm-restore: only the
    exporter's own opt_G/opt_D spellings are harvested, because foreign
    optimizers never promised the twin's parameters() order."""
    from tpugan.ckpt.torch_import import extract_export_meta

    cfg = _cfg("dcgan_cifar10")
    out = export_torch_checkpoint(cfg, _stepped_state(cfg))
    merged = {"G": out["G"], "D": out["D"],
              "tpugan_export": out["tpugan_export"],
              "optimizerG": out["opt_G"], "optimizer_d": out["opt_D"]}
    meta, opt_g, opt_d = extract_export_meta(merged)
    assert meta is not None and opt_g is None and opt_d is None
    meta, opt_g, opt_d = extract_export_meta(out)
    assert opt_g is not None and opt_d is not None


# ---- CLI provenance guards (round-5 review findings) ----------------------

_CLI_SETS = ["--set", "model.ngf=16", "--set", "model.ndf=16",
             "--set", "model.nz=16", "--set", "train.precision=fp32"]


def test_cli_foreign_ema_dict_does_not_flag_provenance(tmp_path, capsys):
    """Many torch repos save {'G': raw_sd, 'ema': ema_state_dict}: a
    non-bool 'ema' entry must not mark the imported (raw) G weights as
    EMA, and the ignored dict is called out so the user can --g it."""
    from tpugan.cli import main as cli_main

    cfg = _cfg("dcgan_cifar10")
    state = _stepped_state(cfg)
    raw = export_torch_checkpoint(cfg, state, include_opt=False)
    # foreign-style checkpoint: no tpugan_export marker, EMA as a dict
    foreign = {"G": raw["G"], "D": raw["D"], "step": 5,
               "ema": dict(raw["G"])}
    pth = str(tmp_path / "foreign.pth")
    torch.save(foreign, pth)
    cli_main(["import-torch", "dcgan_cifar10", *_CLI_SETS,
              "--ckpt", pth, "--out", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "marks its G weights as EMA" not in out
    assert "pass that state_dict via --g" in out


def test_cli_g_override_clears_ema_provenance(tmp_path, capsys):
    """--g replaces the generator weights, so --ckpt's EMA flag (like its
    G moments) no longer describes what was imported."""
    from tpugan.cli import main as cli_main

    cfg = _cfg("dcgan_cifar10", **{"train.ema": 0.9})
    state = _stepped_state(cfg)
    ema_pth = str(tmp_path / "ema.pth")
    torch.save(export_torch_checkpoint(cfg, state, use_ema=True), ema_pth)
    g_pth = str(tmp_path / "g.pth")
    torch.save(export_torch_checkpoint(cfg, state,
                                       include_opt=False)["G"], g_pth)
    cli_main(["import-torch", "dcgan_cifar10", *_CLI_SETS,
              "--set", "train.ema=0.9",
              "--ckpt", ema_pth, "--g", g_pth,
              "--out", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "marks its G weights as EMA" not in out
    # D's moments still ride from --ckpt; G's were dropped with its weights
    assert "optimizer moments restored warm for D" in out


def test_cli_version_gate_refuses_future_export(tmp_path, capsys):
    """A future export format must not be parsed under v1 assumptions:
    moments stay fresh with a loud note (weights still import)."""
    from tpugan.ckpt.torch_export import EXPORT_VERSION
    from tpugan.cli import main as cli_main

    cfg = _cfg("dcgan_cifar10")
    state = _stepped_state(cfg)
    out_d = export_torch_checkpoint(cfg, state)
    out_d["tpugan_export"]["version"] = EXPORT_VERSION + 1
    pth = str(tmp_path / "future.pth")
    torch.save(out_d, pth)
    cli_main(["import-torch", "dcgan_cifar10", *_CLI_SETS,
              "--ckpt", pth, "--out", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "moment layout not trusted" in out
    assert "optimizer moments restored" not in out
