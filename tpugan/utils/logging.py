"""Training observability: console + JSONL + TensorBoard event files.

The reference logs per-iteration losses (loss_D, loss_G, D(x), D(G(z))) to
console and TensorBoard.  We write the same scalar set plus the north-star
``images_per_sec`` counter to: stdout (rate-limited), a ``metrics.jsonl``
file (machine-readable, used by the bench harness), and — when tensorboardX
is importable — TensorBoard event files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = True,
                 console: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.console = console
        self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a",
                          buffering=1)
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict[str, float],
            prefix: str = "train") -> None:
        rec = {"step": int(step), "ts": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)
        if self.console:
            parts = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"[{prefix}] step {step}: {parts}", flush=True)

    def log_image(self, step: int, tag: str, image) -> None:
        if self.tb is not None:
            # tensorboardX wants CHW
            self.tb.add_image(tag, image.transpose(2, 0, 1), step)

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
