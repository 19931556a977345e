"""Train every reference config briefly on the current device and record
throughput + proxy-FID improvement — the per-config parity/perf evidence
table (results land in BENCH_SWEEP.md at the repo root).

Usage: python benchmarks/config_sweep.py [--steps 600]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import sys
import tempfile
import time


def run_one(name: str, steps: int) -> dict:
    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.train import Trainer

    cfg = get_preset(name).override({
        "data.dataset": "synthetic", "data.synthetic_size": 2048,
        "data.batch_size": 128, "data.device_resident": True,
        "train.steps_per_call": 25,
        "train.total_steps": steps, "train.log_every": steps,
        "train.sample_every": 0, "train.ckpt_every": 0,
        "eval.fid_n": 512, "eval.fid_batch": 256})
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
    r1 = evaluate(cfg, trainer.g, trainer._gen_params(),
                  trainer.state.state_g, real_images=real)
    return {
        "config": name, "steps": steps, "wall_s": round(wall, 1),
        "images_per_sec": round(metrics["images_per_sec"], 1),
        "fid_proxy_init": round(r0["fid"], 5),
        "fid_proxy_final": round(r1["fid"], 5),
        "fid_improvement_x": round(r0["fid"] / max(r1["fid"], 1e-9), 1),
        "kid_final": round(r1["kid"], 6),
        "loss_d": round(metrics["loss_d"], 4),
        "loss_g": round(metrics["loss_g"], 4),
    }


# (preset, steps-scale): the 128px config runs half the steps
PRESETS = [("dcgan_mnist", 1.0), ("dcgan_cifar10", 1.0),
           ("lsgan_cifar10", 1.0), ("wgan_cifar10", 1.0),
           ("wgan_gp_cifar10", 1.0), ("sngan_cifar10", 1.0),
           ("dcgan_celeba64", 1.0), ("cdcgan_celeba64", 1.0),
           ("cdcgan_celeba128", 0.5)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default="BENCH_SWEEP.md")
    args = ap.parse_args()

    import jax

    rows = []
    for name, scale in PRESETS:
        try:
            r = run_one(name, max(int(args.steps * scale), 2))
        except Exception as e:
            r = {"config": name,
                 "error": f"{type(e).__name__}: {str(e).splitlines()[0][:90]}"}
        print(json.dumps(r), file=sys.stderr, flush=True)
        rows.append(r)

    with open(args.out, "w") as f:
        f.write(f"# Per-config end-to-end sweep ({jax.devices()})\n\n")
        f.write(f"{args.steps} training steps each, synthetic data "
                "(device-resident, scan-fused), proxy-FID on 512 samples.\n\n")
        f.write("| config | steps | img/s | proxy-FID init→final "
                "| improvement | KID final |\n|---|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                f.write(f"| {r['config']} | | FAILED: {r['error']} | | | |\n")
            else:
                f.write(f"| {r['config']} | {r['steps']} "
                        f"| {r['images_per_sec']:.0f} "
                        f"| {r['fid_proxy_init']:.4f} → "
                        f"{r['fid_proxy_final']:.4f} "
                        f"| {r['fid_improvement_x']}× | {r['kid_final']} |\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
