"""Trainer-loop behaviours: cadence firing under scan fusion, CLI mesh."""

import dataclasses
import json
import os

import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.train import Trainer


def _cfg(tmp, **over):
    cfg = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.log_every": 8, "train.sample_every": 8,
        "train.ckpt_every": 8, "train.total_steps": 24, **over})
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=os.path.join(tmp, "ckpt"),
        out_dir=os.path.join(tmp, "out")))


@pytest.mark.parametrize("k", [1, 4])
def test_cadences_fire_once_per_window(tmp_path, k):
    """Every log/sample/ckpt cadence fires exactly once per window whether
    steps advance singly or k at a time (scan-fused)."""
    cfg = _cfg(str(tmp_path), **{
        "data.device_resident": k > 1, "train.steps_per_call": k})
    t = Trainer(cfg)
    t.train()
    out = cfg.train.out_dir
    samples = [f for f in os.listdir(out) if f.startswith("samples_")]
    assert len(samples) == 3, samples  # steps 8, 16, 24
    with open(os.path.join(out, "metrics.jsonl")) as f:
        logged = [json.loads(line)["step"] for line in f]
    assert len(logged) == 3 and logged == sorted(logged)
    ckpts = [d for d in os.listdir(cfg.train.ckpt_dir) if d.isdigit()]
    assert sorted(map(int, ckpts)) == [8, 16, 24]


def test_host_pipeline_resume_matches_uninterrupted_run(tmp_path):
    """Public-API resume through the HOST pipeline (device_resident=false)
    is bit-exact vs an uninterrupted run: the data stream fast-forwards to
    the checkpoint step instead of replaying epoch 0's batches (which
    silently diverged before the pipeline grew start_step)."""
    import jax

    base = {"train.log_every": 100, "train.sample_every": 0,
            "train.ckpt_every": 8, "train.total_steps": 8}
    # 32 imgs / batch 8 = 4 steps/epoch: step 8 is one full epoch past the
    # step-4 checkpoint, so a replayed stream WOULD differ
    cfg_full = _cfg(str(tmp_path / "full"), **base)
    Trainer(cfg_full).train()
    full = Trainer(cfg_full)  # fresh instance just to restore
    full.restore(cfg_full.train.ckpt_dir)

    cfg_half = _cfg(str(tmp_path / "half"),
                    **{**base, "train.total_steps": 4,
                       "train.ckpt_every": 4})
    Trainer(cfg_half).train()
    cfg_res = cfg_half.override({"train.total_steps": 8,
                                 "train.ckpt_every": 8,
                                 "train.resume": cfg_half.train.ckpt_dir})
    t_res = Trainer(cfg_res)
    t_res.train()

    for a, b in zip(jax.tree.leaves(jax.device_get(full.state.params_g)),
                    jax.tree.leaves(jax.device_get(t_res.state.params_g))):
        np.testing.assert_array_equal(a, b)


def test_cli_train_with_mesh_shape(tmp_path, capsys):
    """--set train.mesh_shape=4 builds a 4-device DP mesh (coercion fix)."""
    from tpugan import cli

    cli.main(["train", "dcgan_mnist",
              "--set", "data.dataset=synthetic",
              "--set", "data.batch_size=8",
              "--set", "data.synthetic_size=32",
              "--set", "model.ngf=8", "--set", "model.ndf=8",
              "--set", "model.nz=8",
              "--set", "train.mesh_shape=4",
              "--set", "train.total_steps=2",
              "--set", "train.log_every=2",
              "--set", "train.sample_every=0",
              "--set", "train.ckpt_every=0",
              "--set", "train.precision=fp32",
              "--out", str(tmp_path / "run")])
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(final["final"]["loss_d"])


def test_fast_preset_flag_combination(tmp_path):
    """dcgan_celeba64_fast combines FusedProp + device-resident data +
    scan-fused dispatch; the full Trainer runs the combination."""
    import dataclasses

    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset("dcgan_celeba64_fast").override({
        "data.dataset": "synthetic", "data.synthetic_size": 32,
        "data.batch_size": 8, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.steps_per_call": 2, "train.total_steps": 4,
        "train.log_every": 2, "train.sample_every": 0,
        "train.ckpt_every": 0})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    m = Trainer(cfg).train()
    assert np.isfinite(m["loss_d"]) and np.isfinite(m["loss_g"])


def test_log_every_zero_means_off(tmp_path):
    """log_every=0 disables logging (like sample/eval/ckpt_every=0)
    instead of crashing with ZeroDivisionError at the first dispatch."""
    cfg = _cfg(str(tmp_path), **{"train.log_every": 0,
                                 "train.total_steps": 4,
                                 "train.sample_every": 0,
                                 "train.ckpt_every": 0})
    Trainer(cfg).train()
    path = os.path.join(cfg.train.out_dir, "metrics.jsonl")
    # the logger opens the file eagerly; "off" means zero rows logged
    assert not os.path.exists(path) or os.path.getsize(path) == 0


def test_total_steps_must_divide_by_steps_per_call(tmp_path):
    """A partial last dispatch would silently overshoot total_steps by up
    to k-1 optimizer updates — rejected at construction."""
    cfg = _cfg(str(tmp_path), **{"train.steps_per_call": 5,
                                 "data.device_resident": True})
    with pytest.raises(ValueError, match="steps_per_call"):
        Trainer(cfg)  # 24 % 5 != 0


def test_epoch_sampling_rejects_int32_overflow_horizon(tmp_path):
    """step*batch_size is computed in on-device int32; a horizon that
    overflows it must fail fast, not silently corrupt the permutation."""
    cfg = _cfg(str(tmp_path), **{"data.sampling": "epoch",
                                 "data.device_resident": True,
                                 "train.total_steps": 2 ** 25,
                                 "data.batch_size": 128})
    with pytest.raises(ValueError, match="int32"):
        Trainer(cfg)


def test_trainer_rejects_insufficient_devices_for_spatial_shards(tmp_path):
    """Pure-spatial Trainer mesh must fail like make_mesh instead of
    silently building a smaller mesh (double per-shard HBM footprint)."""
    cfg = _cfg(str(tmp_path), **{"train.spatial_shards": 16})
    with pytest.raises(ValueError, match="spatial_shards"):
        Trainer(cfg)


def test_fuse_stats_mode_reasserted_at_train_time(tmp_path):
    """fuse_stats is a process-global TRACE-time switch; constructing a
    second Trainer must not flip the mode under the first one's train()
    (the step traces at its first dispatch, not in __init__)."""
    from tpugan import ops

    cfg_on = _cfg(str(tmp_path) + "/a", **{"train.fuse_stats": "on",
                                           "train.total_steps": 2,
                                           "train.log_every": 2,
                                           "train.sample_every": 0,
                                           "train.ckpt_every": 0})
    cfg_off = _cfg(str(tmp_path) + "/b", **{"train.fuse_stats": "off"})
    a = Trainer(cfg_on)
    Trainer(cfg_off)  # flips the global to 'off' pre-trace
    assert not ops.fuse_stats_enabled()
    a.train()  # must re-assert 'on' before its first trace
    assert ops.fuse_stats_enabled()


def test_conditional_training_rejects_all_zero_labels(tmp_path):
    """Dataset loaders fall back to zero labels when the label file is
    missing; a conditional model trained on that is silently garbage —
    the Trainer must reject it."""
    cfg = get_preset("cdcgan_celeba64").override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "model.image_size": 32, "train.precision": "fp32",
        "train.total_steps": 2, "train.log_every": 2,
        "train.sample_every": 0, "train.ckpt_every": 0})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out")))
    n = 32
    data = {"images": np.zeros((n, 32, 32, 3), np.uint8),
            "labels": np.zeros(n, np.int32)}
    with pytest.raises(ValueError, match="labels are all zero"):
        Trainer(cfg, data=data).train()
