"""Data-parallel training over all available devices.

On a multi-chip TPU slice the global batch shards over the mesh and XLA
inserts the gradient reductions over ICI; on a single chip it degenerates to
the plain step.  To try the multi-device path without hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/data_parallel_training.py --steps 20
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import jax

from tpugan.configs import get_preset
from tpugan.parallel import make_mesh
from tpugan.train import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    n = len(jax.devices())
    print(f"{n} device(s): {jax.devices()}")
    cfg = get_preset("dcgan_cifar10").override({
        "data.dataset": "synthetic",
        "data.batch_size": 16 * n,  # global batch scales with the mesh
        "train.total_steps": args.steps,
        "train.log_every": max(args.steps // 5, 1),
        "train.sample_every": 0, "train.ckpt_every": 0,
    })
    mesh = make_mesh(n) if n > 1 else None
    print(Trainer(cfg, mesh=mesh).train())


if __name__ == "__main__":
    main()
