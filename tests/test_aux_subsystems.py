"""Auxiliary subsystems: profiling, sanitizers, fault-injection recovery."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.configs import get_preset
from tpugan.train import Trainer
from tpugan.utils.debug import assert_finite, sanitize
from tpugan.utils.profiling import Throughput, cost_analysis, timeit


def test_cost_analysis_reports_flops():
    def f(x):
        return x @ x

    x = jnp.ones((128, 128))
    costs = cost_analysis(f, x)
    assert costs.get("flops", 0) >= 2 * 128 ** 3 * 0.9


def test_timeit_returns_positive():
    def f(x):
        return x * 2.0

    assert timeit(f, jnp.ones((64, 64)), iters=3, warmup=1) > 0


def test_throughput_meter():
    m = Throughput(n_chips=2)
    m.add(100)
    rate = m.mark()
    assert rate > 0
    m.add(10)
    assert m.mark() > 0


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, np.nan])}, where="test")


def test_sanitize_catches_nan():
    import jax

    with pytest.raises(FloatingPointError):
        with sanitize(nans=True, leaks=False):
            jax.jit(lambda x: 0.0 / x)(jnp.zeros(())).block_until_ready()


def _tiny_cfg(tmp, steps):
    cfg = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.total_steps": steps, "train.log_every": 100,
        "train.sample_every": 0, "train.ckpt_every": 2,
        "train.precision": "fp32",
    })
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=os.path.join(tmp, "ckpt"),
        out_dir=os.path.join(tmp, "out")))


def test_fault_injection_crash_and_resume(tmp_path):
    """Simulated crash mid-training: a fresh process-equivalent Trainer
    resumes from the last checkpoint and continues to completion."""
    tmp = str(tmp_path)
    cfg = _tiny_cfg(tmp, steps=4)
    t1 = Trainer(cfg)
    t1.train()  # checkpoints at steps 2 and 4
    # "crash": discard t1 entirely; recover in a new Trainer
    cfg2 = _tiny_cfg(tmp, steps=8)
    cfg2 = dataclasses.replace(cfg2, train=dataclasses.replace(
        cfg2.train, resume=cfg2.train.ckpt_dir))
    t2 = Trainer(cfg2)
    metrics = t2.train()
    assert int(t2.state.step) == 8
    assert all(np.isfinite(v) for v in metrics.values())
