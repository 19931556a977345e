"""Multi-host training: one Trainer per process, one global mesh.

Every host runs THIS script with the same arguments plus its own
--process-id; `initialize_multihost` bootstraps jax.distributed, after
which `jax.devices()` enumerates every chip on every host and
`Trainer(cfg, mesh).train()` runs the usual single-program loop — the
input pipeline feeds each host only its local batch shard, process 0
writes samples/metrics, checkpoints coordinate through orbax, and
`train.resume` works across restarts of the whole job.

Try it on one machine with two emulated hosts (4 fake CPU devices each):

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python examples/train_multihost.py --num-processes 2 --process-id 0 \
        --coordinator 127.0.0.1:9876 --out /tmp/mh &
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python examples/train_multihost.py --num-processes 2 --process-id 1 \
        --coordinator 127.0.0.1:9876 --out /tmp/mh

On a real TPU pod slice, drop the env vars and the explicit flags and pass
--autodetect — `initialize_multihost(autodetect=True)` reads the topology
from the TPU metadata service (a bare `jax.distributed.initialize()`).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods: "
                         "autodetected)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--autodetect", action="store_true",
                    help="TPU pod: bootstrap from the metadata service "
                         "instead of explicit coordinator flags")
    ap.add_argument("--preset", default="dcgan_cifar10")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="runs/multihost")
    args = ap.parse_args()

    from tpugan.parallel.multihost import initialize_multihost

    idx = initialize_multihost(args.coordinator, args.num_processes,
                               args.process_id, autodetect=args.autodetect)

    import jax

    from tpugan.configs import get_preset
    from tpugan.parallel import make_mesh
    from tpugan.train import Trainer

    print(f"[process {idx}] {jax.process_count()} processes, "
          f"{len(jax.devices())} global devices")

    cfg = get_preset(args.preset).override({
        "data.dataset": "synthetic", "data.batch_size": 16,
        "data.synthetic_size": 64, "model.ngf": 8, "model.ndf": 8,
        "model.nz": 8, "train.precision": "fp32",
        "train.total_steps": args.steps, "train.log_every": 5,
        "train.sample_every": 0, "train.ckpt_every": 10})
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, out_dir=args.out, ckpt_dir=args.out + "/ckpt"))

    mesh = make_mesh()  # all global devices, one ('data',) axis
    metrics = Trainer(cfg, mesh=mesh).train()
    print(f"[process {idx}] done: loss_d={metrics['loss_d']:.4f} "
          f"(identical on every process — the state is replicated)")


if __name__ == "__main__":
    main()
