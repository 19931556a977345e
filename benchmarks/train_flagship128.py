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
import time


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

    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.train import Trainer
    from tpugan.utils import make_grid, save_png, to_uint8

    from tpugan.cli import _parse_sets

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

    t_setup = time.perf_counter()
    trainer = Trainer(cfg)
    real = trainer._dataset()["images"]
    r0 = evaluate(cfg, trainer.g, trainer._gen_params(), trainer.state.state_g,
                  seed=cfg.train.seed, real_images=real)
    log(f"init proxy-FID {r0['fid']:.4f}  (setup {time.perf_counter()-t_setup:.0f}s)")

    t0 = time.perf_counter()
    last = trainer.train()
    wall = time.perf_counter() - t0
    r_final = trainer.evaluate(seed=cfg.train.seed)
    log(f"final proxy-FID {r_final['fid']:.4f} after {args.steps} steps "
        f"({wall:.0f}s wall incl. eval ticks)")

    # Reload the banked best weights and render the deploy grid from them.
    best_dir = _os.path.join(cfg.train.ckpt_dir, "best")
    best_step = trainer.restore(best_dir)
    r_best = trainer.evaluate(seed=cfg.train.seed)
    sampler = trainer.sampler()
    imgs = sampler.sample_fixed(sampler.noise(64, seed=7),
                                sampler.labels(64, seed=7))
    grid = make_grid(to_uint8(imgs), nrow=8)
    save_png(args.grid, grid)
    log(f"best grid (step {best_step}) -> {args.grid}")

    print(json.dumps({
        "config": (f"{args.preset} (synthetic stand-in, device_resident"
                   + ("" if args.no_fused_prop else ", fused_prop") + ")"),
        "steps": args.steps,
        "batch": args.batch,
        "dataset_size": args.dataset_size,
        "fid_init": round(r0["fid"], 4),
        "fid_final": round(r_final["fid"], 4),
        "fid_best": round(r_best["fid"], 4),
        "best_step": int(best_step),
        "fid_reduction_best": round(r0["fid"] / max(r_best["fid"], 1e-9), 1),
        "images_per_sec_last": round(last.get("images_per_sec", 0.0)),
        "train_wall_s": round(wall),
    }))


if __name__ == "__main__":
    main()
