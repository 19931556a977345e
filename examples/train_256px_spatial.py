"""Spatially-sharded training of the 256px DCGAN (the ≥256px scaling path).

Feature maps are H-sharded over a ('space',) mesh: the convs exchange
one-row halos over ICI inside shard_map, BatchNorm's global reductions ride
XLA's automatic SPMD, and the models themselves are unchanged — the
Trainer just sets train.spatial_shards (see tpugan/parallel/spatial.py).

To try without multi-chip hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_256px_spatial.py --steps 4 --width 8
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import jax

from tpugan.configs import get_preset
from tpugan.train import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--width", type=int, default=32,
                    help="ngf/ndf (use 8 for a quick CPU-mesh demo)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data-shards", type=int, default=0,
                    help=">0 composes data parallelism with spatial on a "
                         "2-D (data, space) mesh")
    args = ap.parse_args()

    n = len(jax.devices())
    print(f"{n} device(s): {jax.devices()}")
    cfg = get_preset("dcgan_256_spatial").override({
        "data.dataset": "synthetic", "data.synthetic_size": 64,
        "data.batch_size": args.batch,
        "model.ngf": args.width, "model.ndf": args.width,
        "train.total_steps": args.steps,
        "train.log_every": max(args.steps // 5, 1),
        "train.sample_every": 0, "train.ckpt_every": 0,
        "train.spatial_shards": (min(4, n // args.data_shards)
                                 if args.data_shards else min(8, n)),
        "train.mesh_shape": args.data_shards or None,
    })
    print(Trainer(cfg).train())


if __name__ == "__main__":
    main()
