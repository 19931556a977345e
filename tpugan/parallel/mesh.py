"""Data parallelism over a device mesh — the communication layer.

The reference has no distributed layer at all (single-process CPU/GPU); this
module is its TPU-native counterpart and the single audited surface for all
cross-chip communication:

- One mesh axis, ``'data'``: the global batch is sharded over it; parameters,
  optimizer state, and BN/SN statistics are replicated.
- The train step itself contains NO explicit collectives.  Under ``jit`` with
  these shardings, XLA's SPMD partitioner inserts the gradient ``psum``s
  (riding ICI) and — because BatchNorm reduces over the sharded batch axis —
  the cross-replica batch-stat reductions too.  Replicated RNG keys make the
  z-draws identical on every shard, which is exactly the single-program
  semantics of the unsharded step.
- Eval-side gathers (FID feature pooling) use ``all_gather_arrays``.

Scaling beyond one host would swap ``jax.devices()`` for
``jax.distributed.initialize``-discovered devices; nothing else changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            # Silent truncation would run a planned N-way job on fewer
            # chips — 2x per-chip batch, wrong throughput assumptions —
            # with no signal.  Fail like make_mesh_2d/make_mesh_dp_spatial.
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} device(s) are available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'; all others replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Replicate every leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Move a host batch onto the mesh, sharded along the batch axis."""
    return jax.device_put(batch, batch_sharding(mesh))


def shard_train_state(state, mesh: Mesh):
    """Replicate the full TrainState (params, opts, stats, rng, step)."""
    return replicate(state, mesh)


def all_gather_arrays(x, mesh: Mesh):
    """Gather a batch-sharded array fully onto every device (eval pooling)."""
    return jax.device_put(x, NamedSharding(mesh, P()))
