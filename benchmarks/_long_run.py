"""Shared long-run evidence protocol for the benchmarks/ training scripts.

train_flagship128.py and train_small_data.py both demonstrate convergence
the same way: init proxy-FID -> train with keep_best + periodic eval
(halt-aware) -> proxy-FID trajectory from metrics.jsonl -> final eval ->
restore the banked best slot and eval it -> optionally render the deploy
grid from the best weights.  One implementation here so a protocol fix
lands once instead of silently diverging between the two scripts.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def long_run(cfg, *, grid_path: str | None = None, label: str = "run") -> dict:
    """Run the long-run protocol for a fully-built config; returns the
    evidence dict (fid_init/best/end, trajectory, halt status, rate)."""
    from tpugan.eval import evaluate
    from tpugan.train import NonFiniteLossError, Trainer

    trainer = Trainer(cfg)
    real = trainer._dataset()["images"]
    r0 = evaluate(cfg, trainer.g, trainer._gen_params(),
                  trainer.state.state_g, seed=cfg.train.seed,
                  real_images=real)
    log(f"[{label}] init proxy-FID {r0['fid']:.4f}")

    t0 = time.perf_counter()
    halted = None
    try:
        last = trainer.train()
    except NonFiniteLossError as e:
        halted, last = str(e), {}
        log(f"[{label}] HALTED non-finite: {e}")
    wall = time.perf_counter() - t0

    # proxy-FID trajectory from the run's metrics.jsonl (eval records carry
    # 'fid'; train records carry 'loss_d')
    traj = []
    try:
        with open(os.path.join(cfg.train.out_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "fid" in rec and "loss_d" not in rec:
                    traj.append((rec["step"], round(rec["fid"], 4)))
    except FileNotFoundError:
        pass

    r_final = trainer.evaluate(seed=cfg.train.seed) if halted is None else None

    # Reload the banked best weights; render the deploy grid from them.
    best_dir = os.path.join(cfg.train.ckpt_dir, "best")
    r_best = None
    best_step = None
    if os.path.isdir(best_dir):
        best_step = trainer.restore(best_dir)
        r_best = trainer.evaluate(seed=cfg.train.seed)
        if grid_path:
            from tpugan.utils import make_grid, save_png, to_uint8

            sampler = trainer.sampler()
            imgs = sampler.sample_fixed(sampler.noise(64, seed=7),
                                        sampler.labels(64, seed=7))
            save_png(grid_path, make_grid(to_uint8(imgs), nrow=8))
            log(f"[{label}] best grid (step {best_step}) -> {grid_path}")

    fid_best = r_best["fid"] if r_best else min(
        (f for _, f in traj), default=float("nan"))
    # collapse diagnostic: how much the END of the run regressed from the
    # best the run ever reached (a healthy run holds >= ~1; a memorization
    # collapse ends orders of magnitude above its own best)
    fid_end = (r_final["fid"] if r_final
               else (traj[-1][1] if traj else float("nan")))
    log(f"[{label}] best {fid_best:.4f} @ {best_step}  end {fid_end:.4f}  "
        f"({wall:.0f}s)")
    return {
        "fid_init": round(r0["fid"], 4),
        "fid_best": round(float(fid_best), 4),
        "best_step": int(best_step) if best_step is not None else None,
        "fid_end": round(float(fid_end), 4),
        "end_over_best": round(float(fid_end) / max(float(fid_best), 1e-9), 2),
        "fid_reduction_best": round(r0["fid"] / max(float(fid_best), 1e-9), 1),
        "halted_nonfinite": halted,
        "trajectory": traj,
        "images_per_sec_last": round(last.get("images_per_sec", 0.0)),
        "wall_s": round(wall),
    }
