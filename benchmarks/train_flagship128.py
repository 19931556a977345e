"""The flagship 128x128 conditional run, demonstrated end-to-end on chip.

The reference's largest config is conditional DCGAN at 128px (SURVEY §0
config 5; BASELINE.json "configs").  Round 3 made this config *fast*
(11.4k img/s with FusedProp) and gave it the levers a real run needs
(keep_best, eval_every, grad_accum, halt_on_nonfinite); this script runs it
to convergence and banks the evidence:

- >= 8k-image synthetic set (smaller sets memorize at this capacity — the
  round-2 6k-step collapse note in BASELINE.md);
- 20k steps (the horizon where the 64px runs reached their optimum);
- eval every 1000 steps against a held real slice, best-FID weights banked
  in ckpt_dir/best;
- final artifacts: a JSON results line (proxy-FID at init / best / final,
  sustained img/s) and a sample grid from the banked best weights.

Usage: python benchmarks/train_flagship128.py [--steps 20000] [--out runs/...]

`--preset` generalizes the same long-run protocol (device-resident
synthetic set, keep_best + periodic eval, best-slot grid + one JSON
results line) to any preset — used for the round-4 lsgan convergence
demonstration (BENCH_SWEEP's weakest 600-step row).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cdcgan_celeba128")
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dataset-size", type=int, default=16_384)
    ap.add_argument("--out", default=None)
    ap.add_argument("--grid", default=None)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--steps-per-call", type=int, default=25)
    ap.add_argument("--fid-n", type=int, default=1024)
    ap.add_argument("--no-fused-prop", action="store_true",
                    help="presets with n_critic>1 or a gradient penalty "
                         "reject fused_prop; turn it off for those")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE",
                    help="extra dotted config overrides (the cli.py "
                         "convention), e.g. --set train.spatial_shards=1")
    args = ap.parse_args()
    if args.preset == "cdcgan_celeba128":  # the documented flagship names
        args.out = args.out or "runs/cdcgan128_flagship"
        args.grid = args.grid or "docs/samples_cdcgan128_best_of_20k.png"
    if args.out is None:
        args.out = f"runs/{args.preset}_flagship"
    if args.grid is None:
        args.grid = (f"docs/samples_{args.preset}_best_of_"
                     f"{args.steps // 1000}k.png")

    from benchmarks._long_run import long_run
    from tpugan.cli import _parse_sets
    from tpugan.configs import get_preset

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
        "train.sample_every": max(args.eval_every, 2500),
        "train.ckpt_every": max(args.eval_every, 2500),
        "train.log_every": max(args.eval_every // 4, 1),
        "train.halt_on_nonfinite": True,
        "train.ckpt_dir": args.out + "/ckpt",
        "train.out_dir": args.out + "/out",
        "eval.fid_n": args.fid_n,
        "eval.fid_batch": 256,
        **_parse_sets(args.overrides),  # explicit --set wins over defaults
    })

    r = long_run(cfg, grid_path=args.grid, label=args.preset)

    print(json.dumps({
        "config": (f"{args.preset} (synthetic stand-in, device_resident"
                   + ("" if args.no_fused_prop else ", fused_prop") + ")"),
        "steps": args.steps,
        "batch": args.batch,
        "dataset_size": args.dataset_size,
        "fid_init": r["fid_init"],
        "fid_final": r["fid_end"],
        "fid_best": r["fid_best"],
        "best_step": r["best_step"],
        "fid_reduction_best": r["fid_reduction_best"],
        "halted_nonfinite": r["halted_nonfinite"],
        "images_per_sec_last": r["images_per_sec_last"],
        "train_wall_s": r["wall_s"],
    }))


if __name__ == "__main__":
    main()
