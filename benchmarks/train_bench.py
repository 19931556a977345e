"""Train-step throughput per preset (images/sec/chip) on the current device.

Secondary benchmark axes for BASELINE.md: the full compiled training step
(D update + scheduled G update, BN stats, donation) per config, measured the
same tunnel-safe way as bench.py — k steps chained on device via
``lax.scan`` over pre-staged batches, scalar fetch as the barrier, two-point
subtraction for call overhead.

Usage: python benchmarks/train_bench.py [--presets a,b,c] [--batch 128]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_preset(name: str, batch: int, k: int = 20,
                 fuse_stats: str = "off", fused_prop: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpugan import ops
    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import build_train_step, create_train_state

    ops.set_fuse_stats(fuse_stats)
    cfg = get_preset(name).override({"data.batch_size": batch})
    if fused_prop:
        cfg = cfg.override({"train.fused_prop": True, "loss.n_critic": "1"})
    g, d = build_models(cfg.model, cfg.train.precision)
    # keep donation off: we re-enter with the same state object in timing
    cfg = cfg.override({"train.donate": False})
    step = build_train_step(cfg, g, d)
    state = create_train_state(cfg, g, d)

    s = cfg.model.image_size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(
        0, 256, size=(batch, s, s, cfg.model.channels)).astype(np.uint8))
    batch_dev = {"image": img}
    if cfg.model.arch == "cdcgan":
        batch_dev["label"] = jnp.asarray(rng.integers(
            0, cfg.model.n_classes, size=batch).astype(np.int32))

    def chain(n_steps):
        @jax.jit
        def run(st):
            def body(carry, _):
                new_st, metrics = step(carry, batch_dev)
                return new_st, metrics["loss_d"]
            final, losses = lax.scan(body, st, None, length=n_steps)
            return jnp.sum(losses)
        return run

    # least-squares slope over three chain lengths (outlier-resistant vs
    # the two-point method — this relay shows occasional 2x flukes)
    ks = sorted({max(2, k // 5), max(3, k // 2), k})
    runs = {n_: chain(n_) for n_ in ks}
    for n_ in ks:  # compile+warm
        float(runs[n_](state))

    def timed(fn):
        t0 = time.perf_counter()
        float(fn(state))
        return time.perf_counter() - t0
    times = [min(timed(runs[n_]) for _ in range(5)) for n_ in ks]
    per_step = float(np.polyfit(np.array(ks, np.float64),
                                np.array(times), 1)[0])
    return {"preset": name, "batch": batch, "fuse_stats": fuse_stats,
            "fused_prop": fused_prop,
            "images_per_sec": batch / per_step,
            "ms_per_step": per_step * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=(
        "dcgan_mnist,dcgan_cifar10,lsgan_cifar10,wgan_gp_cifar10,"
        "sngan_cifar10,dcgan_celeba64,cdcgan_celeba128"))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fuse-stats", default="off",
                    choices=("on", "off", "auto"),
                    help="train-path conv+BN-stats Pallas fusion")
    ap.add_argument("--fused-prop", action="store_true",
                    help="FusedProp shared-forward training mode")
    args = ap.parse_args()

    results = []
    for name in args.presets.split(","):
        try:
            r = bench_preset(name.strip(), args.batch, args.steps,
                             fuse_stats=args.fuse_stats,
                             fused_prop=args.fused_prop)
            log(f"{r['preset']}: {r['images_per_sec']:.0f} img/s "
                f"({r['ms_per_step']:.2f} ms/step)")
            results.append(r)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
