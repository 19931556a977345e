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


@pytest.mark.slow  # 38s: two Trainer lifecycles; graceful preemption and
# the keep_best watermark-survives-resume contract stay default.
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


@pytest.mark.slow
def test_graceful_preemption_sigterm(tmp_path):
    """Production preemption contract (full fidelity, -m slow; the quick
    in-process variant below runs in the default suite): SIGTERM
    mid-training -> the trainer
    finishes the in-flight dispatch, saves a checkpoint, exits cleanly
    (rc 0), and the run resumes from that checkpoint to completion."""
    import signal
    import subprocess
    import sys
    import time as _time

    tmp = str(tmp_path)
    script = f"""
import sys; sys.path.insert(0, {repr(os.getcwd())})
import dataclasses, os
from tpugan.configs import get_preset
from tpugan.train import Trainer
cfg = get_preset("dcgan_mnist").override({{
    "data.dataset": "synthetic", "data.batch_size": 8,
    "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
    "model.nz": 8, "train.total_steps": 100000, "train.log_every": 5,
    "train.sample_every": 0, "train.ckpt_every": 0,
    "train.precision": "fp32"}})
cfg = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, ckpt_dir={repr(tmp)} + "/ckpt", out_dir={repr(tmp)} + "/out"))
Trainer(cfg).train()
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.Popen([sys.executable, "-c", script], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    # wait until training is demonstrably under way (first metrics logged)
    metrics_path = os.path.join(tmp, "out", "metrics.jsonl")
    deadline = _time.time() + 300
    while _time.time() < deadline:
        if os.path.exists(metrics_path) and os.path.getsize(metrics_path):
            break
        if proc.poll() is not None:
            raise AssertionError(
                f"trainer died early: {proc.communicate()[1][-2000:]}")
        _time.sleep(0.25)
    else:
        proc.kill()
        raise AssertionError("trainer never started logging")
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"expected clean exit, got rc=" \
        f"{proc.returncode}\n{err[-2000:]}"
    assert "preempted at step" in out
    # the checkpoint it saved resumes to completion
    cfg2 = get_preset("dcgan_mnist").override({
        "data.dataset": "synthetic", "data.batch_size": 8,
        "data.synthetic_size": 32, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.log_every": 100, "train.sample_every": 0,
        "train.ckpt_every": 0, "train.precision": "fp32"})
    import dataclasses as _dc
    cfg2 = _dc.replace(cfg2, train=_dc.replace(
        cfg2.train, ckpt_dir=tmp + "/ckpt", out_dir=tmp + "/out2",
        resume=tmp + "/ckpt"))
    t = Trainer(cfg2)
    t.restore(tmp + "/ckpt")
    saved_step = int(t.state.step)
    assert saved_step > 0
    t2 = Trainer(_dc.replace(cfg2, train=_dc.replace(
        cfg2.train, total_steps=saved_step + 4)))
    metrics = t2.train()
    assert int(t2.state.step) == saved_step + 4
    assert all(np.isfinite(v) for v in metrics.values())


def test_halt_on_nonfinite_saves_checkpoint_and_raises(tmp_path):
    """Divergence guard: a NaN in the logged metrics saves a checkpoint and
    halts with NonFiniteLossError instead of training on garbage."""
    from tpugan.train import NonFiniteLossError

    tmp = str(tmp_path)
    cfg = _tiny_cfg(tmp, steps=6)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, log_every=2, ckpt_every=0, halt_on_nonfinite=True))
    t = Trainer(cfg)
    real_step = t.step_fn

    def poisoned(state, batch):
        state, metrics = real_step(state, batch)
        if int(state.step) >= 4:  # diverge on the 4th step
            metrics = dict(metrics, loss_d=jnp.float32(float("nan")))
        return state, metrics

    t.step_fn = poisoned
    with pytest.raises(NonFiniteLossError, match="loss_d"):
        t.train()
    # the checkpoint from the halt is restorable at the halt step
    t2 = Trainer(_tiny_cfg(tmp, steps=6))
    assert t2.restore(cfg.train.ckpt_dir) == 4


def test_graceful_preemption_in_process(tmp_path):
    """Quick preemption check: a SIGTERM delivered to this process while
    train() runs trips the guard — the loop stops early, a checkpoint is
    saved, and train() returns instead of raising."""
    import signal
    import threading

    tmp = str(tmp_path)
    cfg = _tiny_cfg(tmp, steps=2)
    Trainer(cfg).train()  # warm compile so the timed part is fast
    cfg2 = _tiny_cfg(tmp, steps=500)
    cfg2 = dataclasses.replace(cfg2, train=dataclasses.replace(
        cfg2.train, resume=cfg2.train.ckpt_dir, ckpt_every=0))
    t = Trainer(cfg2)
    timer = threading.Timer(0.5, lambda: os.kill(os.getpid(),
                                                 signal.SIGTERM))
    timer.start()
    try:
        t.train()  # returns (no exception) despite the signal
    finally:
        timer.cancel()
    stopped_at = int(t.state.step)
    assert 2 <= stopped_at < 500, stopped_at
    # the preemption checkpoint is restorable
    t2 = Trainer(_tiny_cfg(tmp, steps=500))
    assert t2.restore(cfg2.train.ckpt_dir) == stopped_at


def test_keep_best_checkpoint(tmp_path):
    """train.keep_best: the best-proxy-FID weights land in ckpt_dir/best and
    are restorable independently of the rolling 'latest' checkpoint."""
    tmp = str(tmp_path)
    cfg = _tiny_cfg(tmp, steps=6)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, eval_every=2, keep_best=True, ckpt_every=0))
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, fid_n=16, fid_batch=16))
    t = Trainer(cfg)
    t.train()
    best_dir = os.path.join(cfg.train.ckpt_dir, "best")
    assert os.path.isdir(best_dir)
    t2 = Trainer(_tiny_cfg(tmp, steps=6))
    best_step = t2.restore(best_dir)
    assert 2 <= best_step <= 6
    # eval log recorded the best_fid marker
    with open(os.path.join(cfg.train.out_dir, "metrics.jsonl")) as f:
        assert any('"eval/best_fid"' in ln or "best_fid" in ln for ln in f)


def test_keep_best_watermark_survives_resume(tmp_path, monkeypatch):
    """The best-FID watermark persists across Trainer instances (i.e. across
    preemption+resume): a resumed run whose first eval is WORSE than the
    pre-preemption best must not overwrite ckpt_dir/best."""
    import json

    import tpugan.eval as tpe

    tmp = str(tmp_path)

    def run(fid_value, steps):
        calls = []

        def fake_eval(cfg, g, params_g, state_g, *, seed=0, real_images=None):
            calls.append(fid_value)
            return {"fid": fid_value, "kid": 0.0, "kid_std": 0.0,
                    "is_mean": 1.0, "is_std": 0.0, "n": 8, "backend": "proxy"}

        monkeypatch.setattr(tpe, "evaluate", fake_eval)
        cfg = _tiny_cfg(tmp, steps)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, eval_every=2, keep_best=True, ckpt_every=2,
            resume=cfg.train.ckpt_dir if steps > 2 else ""))
        t = Trainer(cfg)
        t.train()
        assert calls, "eval never ran"
        return cfg

    cfg = run(1.0, steps=2)            # establishes best_fid = 1.0
    meta = os.path.join(cfg.train.ckpt_dir, "best", "best_fid.json")
    with open(meta) as f:
        assert json.load(f)["fid"] == 1.0

    run(5.0, steps=4)                  # resumed run, worse FID: no overwrite
    with open(meta) as f:
        rec = json.load(f)
    assert rec["fid"] == 1.0, "worse resumed eval overwrote the best slot"
    assert rec["step"] == 2

    run(0.25, steps=6)                 # better FID: watermark advances
    with open(meta) as f:
        assert json.load(f)["fid"] == 0.25


def test_keep_best_fresh_run_resets_watermark(tmp_path, monkeypatch):
    """A FRESH run (no train.resume) in a reused ckpt_dir must NOT inherit
    the previous run's watermark — its own first eval defines the new best
    (otherwise ckpt_dir/best silently keeps the old config's weights)."""
    import json

    import tpugan.eval as tpe

    tmp = str(tmp_path)

    def run(fid_fn, steps, resume=""):
        def fake_eval(cfg, g, params_g, state_g, *, seed=0, real_images=None):
            return {"fid": fid_fn(), "kid": 0.0, "kid_std": 0.0,
                    "is_mean": 1.0, "is_std": 0.0, "n": 8, "backend": "proxy"}

        monkeypatch.setattr(tpe, "evaluate", fake_eval)
        cfg = _tiny_cfg(tmp, steps)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, eval_every=2, keep_best=True, ckpt_every=2,
            resume=resume))
        Trainer(cfg).train()

    meta = os.path.join(tmp, "ckpt", "best", "best_fid.json")
    fids = iter([2.0, 1.0])
    run(lambda: next(fids), steps=4)   # first run: best improves to step 4
    with open(meta) as f:
        rec = json.load(f)
    assert rec["fid"] == 1.0 and rec["step"] == 4

    run(lambda: 3.0, steps=2)          # FRESH run, worse fid: still wins
    with open(meta) as f:
        rec = json.load(f)
    assert rec["fid"] == 3.0 and rec["step"] == 2
    # and the CHECKPOINT is the fresh run's too, not a stale higher step
    # left by orbax's skip-existing/keep-highest behavior
    t = Trainer(_tiny_cfg(tmp, 2))
    assert t.restore(os.path.join(tmp, "ckpt", "best")) == 2


def test_keep_best_second_train_call_preserves_best(tmp_path, monkeypatch):
    """ADVICE r3: calling train() twice on ONE Trainer is supported (the
    in-memory watermark persists across calls) — the best-slot reset must
    key on 'first train() of this Trainer', not 'fresh run', or the second
    call deletes the first call's best checkpoint while keeping the
    watermark (no best weights under a live watermark)."""
    import json

    import tpugan.eval as tpe

    tmp = str(tmp_path)
    fids = iter([1.0, 5.0])  # first call's eval best; second call worse

    def fake_eval(cfg, g, params_g, state_g, *, seed=0, real_images=None):
        return {"fid": next(fids), "kid": 0.0, "kid_std": 0.0,
                "is_mean": 1.0, "is_std": 0.0, "n": 8, "backend": "proxy"}

    monkeypatch.setattr(tpe, "evaluate", fake_eval)
    cfg = _tiny_cfg(tmp, steps=2)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, eval_every=2, keep_best=True, ckpt_every=2))
    t = Trainer(cfg)
    t.train()                      # best saved at step 2, fid 1.0
    best_dir = os.path.join(cfg.train.ckpt_dir, "best")
    assert os.path.isdir(best_dir)

    t.train(total_steps=4)         # second call on the SAME Trainer
    meta = os.path.join(best_dir, "best_fid.json")
    with open(meta) as f:
        rec = json.load(f)
    assert rec["fid"] == 1.0 and rec["step"] == 2
    # the step-2 best checkpoint itself survived (not just the watermark)
    t2 = Trainer(_tiny_cfg(tmp, steps=2))
    assert t2.restore(best_dir) == 2
