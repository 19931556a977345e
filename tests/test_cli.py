"""CLI surface tests (in-process: subprocesses would re-dial the TPU relay)."""

import json
import os

import numpy as np
import pytest

from tpugan import cli


def run_cli(capsys, *argv):
    cli.main(list(argv))
    return capsys.readouterr().out


def test_presets_lists_all(capsys):
    out = run_cli(capsys, "presets")
    for name in ("dcgan_mnist", "wgan_gp_cifar10", "sngan_cifar10",
                 "cdcgan_celeba128", "wgan_cifar10"):
        assert name in out


def test_train_sample_eval_roundtrip(tmp_path, capsys):
    out_dir = str(tmp_path / "run")
    run_cli(capsys, "train", "dcgan_mnist",
            "--set", "data.dataset=synthetic",
            "--set", "data.batch_size=8",
            "--set", "data.synthetic_size=32",
            "--set", "model.ngf=8", "--set", "model.ndf=8",
            "--set", "model.nz=8",
            "--set", "train.total_steps=3",
            "--set", "train.log_every=3",
            "--set", "train.sample_every=0",
            "--set", "train.ckpt_every=3",
            "--set", "train.precision=fp32",
            "--out", out_dir)
    ckpt = os.path.join(out_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt, "config.json"))

    grid = str(tmp_path / "g.png")
    out = run_cli(capsys, "sample", "--ckpt", ckpt, "--n", "4",
                  "--seed", "5", "--out", grid)
    assert "wrote" in out and os.path.exists(grid)

    out = run_cli(capsys, "eval", "--ckpt", ckpt, "--fid-n", "16")
    result = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["fid"]) and result["backend"] == "proxy"

    # sample --outdir (individual PNGs) + the two-folder fid command —
    # the reference-era `pytorch-fid path_a path_b` workflow end-to-end
    d1, d2 = str(tmp_path / "set_a"), str(tmp_path / "set_b")
    run_cli(capsys, "sample", "--ckpt", ckpt, "--n", "8", "--seed", "1",
            "--outdir", d1)
    run_cli(capsys, "sample", "--ckpt", ckpt, "--n", "8", "--seed", "2",
            "--outdir", d2)
    assert sorted(os.listdir(d1))[0] == "sample_000000.png"
    assert len(os.listdir(d2)) == 8
    out = run_cli(capsys, "fid", d1, d2, "--image-size", "28",
                  "--channels", "1", "--batch", "8")
    r = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(r["fid"]) and r["n_a"] == 8 and r["n_b"] == 8
    assert "is_mean" not in r  # no set is "generated"; IS is not reported


def test_bad_override_is_actionable(tmp_path):
    with pytest.raises(KeyError, match="model.nfg"):
        cli.main(["train", "dcgan_mnist", "--set", "model.nfg=8",
                  "--out", str(tmp_path)])


def test_sample_without_config_errors(tmp_path):
    with pytest.raises(SystemExit, match="config.json"):
        cli.main(["sample", "--ckpt", str(tmp_path), "--out", "x.png"])


def test_profile_reports_costs_and_rate(capsys):
    out = run_cli(capsys, "profile", "dcgan_cifar10",
                  "--set", "model.ngf=8", "--set", "model.ndf=8",
                  "--set", "model.nz=8", "--set", "data.batch_size=16",
                  "--set", "train.precision=fp32", "--iters", "2")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["flops_per_step"] > 1e6          # XLA cost analysis present
    assert rec["bytes_accessed"] > 0
    assert rec["ms_per_step"] > 0
    assert rec["images_per_sec"] > 0


def test_profile_conditional_preset(capsys):
    out = run_cli(capsys, "profile", "cdcgan_celeba128",
                  "--set", "model.image_size=32", "--set", "model.ngf=8",
                  "--set", "model.ndf=8", "--set", "model.nz=8",
                  "--set", "data.batch_size=8",
                  "--set", "train.precision=fp32", "--iters", "1")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["flops_per_step"] > 1e6 and rec["ms_per_step"] > 0


def test_override_name_and_optional_unset():
    """--set name=... must stick (it used to be silently discarded), and
    'none' on an Optional field unsets it instead of leaving the string."""
    from tpugan.configs import get_preset

    cfg = get_preset("dcgan_mnist")
    assert cfg.override({"name": "myrun"}).name == "myrun"
    c2 = cfg.override({"train.mesh_shape": "4"})
    assert c2.train.mesh_shape == 4
    assert c2.override({"train.mesh_shape": "none"}).train.mesh_shape is None
