"""Probe: per-step cost of the DiffAugment policy inside the train step.

Measures the flagship cdcgan_celeba128 fused_prop step on the real chip with
(a) augment off, (b) each op alone at p=1, (c) full policy p=1, (d) full
policy under ADA (traced p).  Isolates which op pays and whether the ADA
bernoulli gating adds cost on top.  Rates are the median of the
post-compile log windows (first window discarded: it contains the trace).
"""

from __future__ import annotations

import json
import os as _os
import statistics
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from tpugan.configs import get_preset
from tpugan.train.trainer import Trainer


def bench(name: str, overrides: dict, steps: int = 300) -> float:
    out = f"/tmp/probe_aug/{name.replace(' ', '_')}"
    # metrics.jsonl appends across runs — a reused dir would mix stale
    # rates into the median
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    cfg = get_preset("cdcgan_celeba128").override({
        "data.dataset": "synthetic",
        "data.synthetic_size": 2048,
        "data.batch_size": 128,
        "data.device_resident": True,
        "train.total_steps": steps,
        "train.steps_per_call": 10,
        "train.fused_prop": True,
        "train.eval_every": 0,
        "train.sample_every": 0,
        "train.ckpt_every": 0,
        "train.log_every": 50,
        "train.out_dir": out,
        "train.ckpt_dir": out + "/ckpt",
        **overrides,
    })
    Trainer(cfg).train()
    rates = []
    with open(out + "/metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "images_per_sec" in rec and rec["step"] > 50:
                rates.append(rec["images_per_sec"])
    ips = statistics.median(rates)
    print(f"{name:30s} {ips:12,.0f} img/s", flush=True)
    return ips


if __name__ == "__main__":
    base = bench("off", {})
    for op in ("color", "translation", "cutout"):
        bench(f"{op} p=1", {"train.augment": op})
    full = bench("full p=1", {"train.augment": "color,translation,cutout"})
    ada = bench("full ADA", {"train.augment": "color,translation,cutout",
                             "train.ada_target": 0.6})
    print(f"full-policy cost: {base/full:.2f}x   ADA cost: {base/ada:.2f}x",
          flush=True)
