"""End-to-end convergence: adversarial training actually learns.

400 DCGAN steps on the deterministic synthetic dataset must cut proxy-FID
by >5x from init (measured run: 0.377 -> 0.0135, ~28x).  Fully seeded, so
this is reproducible, not flaky — the margin is wide on purpose.
"""

import dataclasses

import pytest

from tpugan.configs import get_preset
from tpugan.eval import evaluate
from tpugan.train import Trainer


@pytest.mark.slow
def test_dcgan_reduces_fid(tmp_path):
    cfg = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.synthetic_size": 2048,
        "data.batch_size": 64, "model.ngf": 32, "model.ndf": 32,
        "train.total_steps": 400, "train.log_every": 400,
        "train.sample_every": 0, "train.ckpt_every": 0,
        "train.precision": "fp32",
        "eval.fid_n": 512, "eval.fid_batch": 256})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "c"), out_dir=str(tmp_path / "o")))
    trainer = Trainer(cfg)
    real = trainer._dataset()["images"][:512]

    fid0 = evaluate(cfg, trainer.g, trainer.state.params_g,
                    trainer.state.state_g, real_images=real)["fid"]
    trainer.train()
    fid1 = evaluate(cfg, trainer.g, trainer.state.params_g,
                    trainer.state.state_g, real_images=real)["fid"]
    assert fid1 < fid0 / 5, f"no convergence: {fid0} -> {fid1}"
