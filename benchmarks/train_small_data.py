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

from benchmarks._long_run import long_run


def run_arm(args, name: str, overrides: dict) -> dict:
    from tpugan.configs import get_preset

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
    return {"arm": name, **long_run(cfg, label=name)}


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
