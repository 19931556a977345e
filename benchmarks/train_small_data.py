"""Small-dataset A/B: differentiable augmentation vs the memorization collapse.

The failure this demonstrates is the one round 3 hit for real: at 128px
conditional capacity, a too-small training set lets D memorize and the run
collapses (BASELINE.md's 6k-step collapse note).  The reference has no
countermeasure; tpugan's `train.augment` (+ optional ADA) exists precisely
for this case, with G's gradient flowing through the augmentation
(ops/augment.py, DESIGN.md §7a).

Protocol: two identical runs on a deliberately small device-resident set —
(a) baseline, (b) `train.augment=color,translation,cutout` (add
`--ada 0.6` for the adaptive variant) — same seed, same horizon, eval ticks
every `--eval-every` steps.  Each arm reports its proxy-FID trajectory
(parsed from metrics.jsonl), its best banked FID, and whether it halted
non-finite; the JSON line at the end carries both arms for BASELINE.md.

Usage: python benchmarks/train_small_data.py [--preset cdcgan_celeba128]
           [--dataset-size 2048] [--steps 10000] [--ada 0.0]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def run_arm(args, name: str, overrides: dict) -> dict:
    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.train import NonFiniteLossError, Trainer

    out = _os.path.join(args.out, name)
    cfg = get_preset(args.preset).override({
        "data.dataset": "synthetic",
        "data.synthetic_size": args.dataset_size,
        "data.batch_size": args.batch,
        "data.device_resident": True,
        "train.total_steps": args.steps,
        "train.steps_per_call": args.steps_per_call,
        "train.fused_prop": not args.no_fused_prop,
        "train.keep_best": True,
        "train.eval_every": args.eval_every,
        "train.sample_every": 0,
        "train.ckpt_every": args.steps,
        "train.log_every": max(args.eval_every // 2, 1),
        "train.halt_on_nonfinite": True,
        "train.ckpt_dir": out + "/ckpt",
        "train.out_dir": out + "/out",
        "eval.fid_n": args.fid_n,
        "eval.fid_batch": 256,
        **overrides,
    })

    trainer = Trainer(cfg)
    real = trainer._dataset()["images"]
    r0 = evaluate(cfg, trainer.g, trainer._gen_params(),
                  trainer.state.state_g, seed=cfg.train.seed,
                  real_images=real)
    log(f"[{name}] init proxy-FID {r0['fid']:.4f}")

    t0 = time.perf_counter()
    halted = None
    try:
        last = trainer.train()
    except NonFiniteLossError as e:
        halted = str(e)
        last = {}
        log(f"[{name}] HALTED non-finite: {e}")
    wall = time.perf_counter() - t0

    # proxy-FID trajectory from the run's metrics.jsonl (eval records carry
    # 'fid'; train records carry 'loss_d')
    traj = []
    with open(_os.path.join(cfg.train.out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "fid" in rec and "loss_d" not in rec:
                traj.append((rec["step"], round(rec["fid"], 4)))

    r_final = trainer.evaluate(seed=cfg.train.seed) if halted is None else None
    best_dir = _os.path.join(cfg.train.ckpt_dir, "best")
    r_best = None
    best_step = None
    if _os.path.isdir(best_dir):
        best_step = trainer.restore(best_dir)
        r_best = trainer.evaluate(seed=cfg.train.seed)

    fid_best = r_best["fid"] if r_best else min(
        (f for _, f in traj), default=float("nan"))
    # collapse diagnostic: how much the END of the run regressed from the
    # best the run ever reached (a healthy run holds >= ~1; a memorization
    # collapse ends orders of magnitude above its own best)
    fid_end = (r_final["fid"] if r_final
               else (traj[-1][1] if traj else float("nan")))
    log(f"[{name}] best {fid_best:.4f} @ {best_step}  end {fid_end:.4f}  "
        f"({wall:.0f}s)")
    return {
        "arm": name,
        "fid_init": round(r0["fid"], 4),
        "fid_best": round(float(fid_best), 4),
        "best_step": int(best_step) if best_step is not None else None,
        "fid_end": round(float(fid_end), 4),
        "end_over_best": round(float(fid_end) / max(float(fid_best), 1e-9), 2),
        "halted_nonfinite": halted,
        "trajectory": traj,
        "images_per_sec_last": round(last.get("images_per_sec", 0.0)),
        "wall_s": round(wall),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cdcgan_celeba128")
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dataset-size", type=int, default=2048)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--fid-n", type=int, default=1024)
    ap.add_argument("--ada", type=float, default=0.0,
                    help="nonzero: use ADA at this r_t target instead of "
                         "fixed-p DiffAugment")
    ap.add_argument("--policy", default="color,translation,cutout")
    ap.add_argument("--no-fused-prop", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = f"runs/smalldata_{args.preset}_{args.dataset_size}"

    baseline = run_arm(args, "baseline", {})
    augmented = run_arm(args, "augment", {
        "train.augment": args.policy,
        "train.ada_target": args.ada,
    })

    print(json.dumps({
        "config": (f"{args.preset} @ {args.dataset_size} images "
                   f"(small-set A/B), {args.steps} steps"),
        "policy": args.policy + (f" + ADA({args.ada})" if args.ada else ""),
        "baseline": baseline,
        "augment": augmented,
    }))


if __name__ == "__main__":
    main()
