"""Train every reference config on the current device and record
throughput + proxy-FID improvement — the per-config parity/perf evidence
table (results land in BENCH_SWEEP.md at the repo root).

Round-4 horizon upgrade: the original 600-step protocol made the celeba
rows look weak purely because 600 steps is far from convergence there
(BENCH_SWEEP footnotes ³⁴ documented the artifact).  With --eval-every
the sweep runs each config to a real horizon, evaluates periodically, and
banks the best proxy-FID via the Trainer's own keep_best machinery — the
table then reports converged evidence per config in one uniform protocol.

Usage: python benchmarks/config_sweep.py [--steps 600]
           [--synthetic-size 2048] [--eval-every 0]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time


def run_one(name: str, steps: int, synthetic_size: int = 2048,
            eval_every: int = 0) -> dict:
    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.train import Trainer

    overrides = {
        "data.dataset": "synthetic", "data.synthetic_size": synthetic_size,
        "data.batch_size": 128, "data.device_resident": True,
        "train.steps_per_call": 25,
        "train.total_steps": steps, "train.log_every": steps,
        "train.sample_every": 0, "train.ckpt_every": 0,
        "eval.fid_n": 512, "eval.fid_batch": 256}
    if eval_every:
        # periodic in-loop eval + keep_best: the Trainer banks the
        # best-proxy-FID weights; the watermark json records (fid, step)
        overrides.update({"train.eval_every": eval_every,
                          "train.keep_best": True})
    cfg = get_preset(name).override(overrides)
    tmp = tempfile.mkdtemp(prefix=f"sweep_{name}_")
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ckpt_dir=tmp + "/ckpt", out_dir=tmp + "/out"))
    trainer = Trainer(cfg)
    real = trainer._dataset()["images"][:512]
    r0 = evaluate(cfg, trainer.g, trainer._gen_params(),
                  trainer.state.state_g, real_images=real)
    t0 = time.time()
    metrics = trainer.train()
    wall = time.time() - t0
    if eval_every:
        # the trainer's in-loop eval fires at the final step with the
        # identical protocol (same seed/fid_n/reals) — reuse its last
        # record instead of paying a redundant full evaluation
        r1 = None
        with open(os.path.join(cfg.train.out_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "fid" in rec and "kid" in rec:
                    r1 = rec
        if r1 is None:
            raise RuntimeError(f"{name}: no eval record in metrics.jsonl "
                               "despite eval_every being set")
    else:
        r1 = evaluate(cfg, trainer.g, trainer._gen_params(),
                      trainer.state.state_g, real_images=real)
    row = {
        "config": name, "steps": steps, "wall_s": round(wall, 1),
        "images_per_sec": round(metrics["images_per_sec"], 1),
        "fid_proxy_init": round(r0["fid"], 5),
        "fid_proxy_final": round(r1["fid"], 5),
        "fid_improvement_x": round(r0["fid"] / max(r1["fid"], 1e-9), 1),
        "kid_final": round(r1["kid"], 6),
        "loss_d": round(metrics["loss_d"], 4),
        "loss_g": round(metrics["loss_g"], 4),
    }
    if eval_every:
        best_fid, best_step = r1["fid"], steps
        meta = trainer._load_best_meta()  # the watermark's one schema reader
        if meta is not None and meta["fid"] < best_fid:
            best_fid, best_step = meta["fid"], meta["step"]
        row.update(fid_proxy_best=round(best_fid, 5), best_step=best_step,
                   best_improvement_x=round(r0["fid"] / max(best_fid, 1e-9),
                                            1))
    return row


# (preset, steps-scale): the 128px config runs half the steps
PRESETS = [("dcgan_mnist", 1.0), ("dcgan_cifar10", 1.0),
           ("lsgan_cifar10", 1.0), ("wgan_cifar10", 1.0),
           ("wgan_gp_cifar10", 1.0), ("sngan_cifar10", 1.0),
           ("dcgan_celeba64", 1.0), ("cdcgan_celeba64", 1.0),
           ("cdcgan_celeba128", 0.5)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--synthetic-size", type=int, default=2048)
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--out", default="BENCH_SWEEP.md")
    args = ap.parse_args()

    import jax

    rows = []
    for name, scale in PRESETS:
        try:
            r = run_one(name, max(int(args.steps * scale), 2),
                        synthetic_size=args.synthetic_size,
                        eval_every=args.eval_every)
        except Exception as e:
            r = {"config": name,
                 "error": f"{type(e).__name__}: {str(e).splitlines()[0][:90]}"}
        print(json.dumps(r), file=sys.stderr, flush=True)
        rows.append(r)

    best = bool(args.eval_every)
    with open(args.out, "w") as f:
        f.write(f"# Per-config end-to-end sweep ({jax.devices()})\n\n")
        f.write(f"{args.steps} training steps each, synthetic data "
                f"({args.synthetic_size} images, device-resident, "
                "scan-fused), proxy-FID on 512 samples"
                + (f"; periodic eval every {args.eval_every} steps with "
                   "keep_best banking the best weights.\n\n" if best
                   else ".\n\n"))
        if best:
            f.write("| config | steps | img/s | proxy-FID init→final "
                    "| best (step) | improvement (best) | KID final |\n"
                    "|---|---|---|---|---|---|---|\n")
        else:
            f.write("| config | steps | img/s | proxy-FID init→final "
                    "| improvement | KID final |\n|---|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                f.write(f"| {r['config']} | | FAILED: {r['error']} |"
                        + " | | |" + (" |\n" if best else "\n"))
            elif best:
                f.write(f"| {r['config']} | {r['steps']} "
                        f"| {r['images_per_sec']:.0f} "
                        f"| {r['fid_proxy_init']:.4f} → "
                        f"{r['fid_proxy_final']:.4f} "
                        f"| {r['fid_proxy_best']:.4f} ({r['best_step']}) "
                        f"| {r['best_improvement_x']}× | {r['kid_final']} |\n")
            else:
                f.write(f"| {r['config']} | {r['steps']} "
                        f"| {r['images_per_sec']:.0f} "
                        f"| {r['fid_proxy_init']:.4f} → "
                        f"{r['fid_proxy_final']:.4f} "
                        f"| {r['fid_improvement_x']}× | {r['kid_final']} |\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
