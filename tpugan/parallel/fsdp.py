"""FSDP-style parameter sharding over a 2-D (data, model) mesh.

The reference has no distributed layer at all; pure data parallelism
(mesh.py) is its TPU-native counterpart and replicates parameters on every
chip.  For the large configs (128×128, ngf=64 ⇒ ~54MB fp32 G params plus
Adam moments ×2 per network) replication is fine on v5e HBM — but the
framework also offers the standard JAX scaling step beyond DP: shard the
parameters (and optimizer moments) over a second mesh axis and let XLA's
SPMD partitioner all-gather weights on use and reduce-scatter gradients —
the ZeRO-3/FSDP pattern, expressed purely as shardings.

Rules: rank-4 conv/deconv weights shard on their output-channel (last) dim;
rank-2 dense weights shard on the last dim; per-channel vectors (BN
scale/bias/stats, SN u) shard on their only dim — all only when divisible by
the model-axis size; everything else replicates.  Batch stays sharded over
'data'.  No train-step changes: the same compiled step runs under any of
these placements (tests/test_parallel.py asserts numerical equivalence).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int,
                 devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_data * n_model > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs "
                         f"{n_data * n_model} devices, have {len(devs)}")
    grid = np.array(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _leaf_spec(leaf, n_model: int) -> P:
    if leaf.ndim >= 2 and leaf.shape[-1] % n_model == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if leaf.ndim == 1 and leaf.shape[0] % n_model == 0 and leaf.shape[0] > 1:
        return P("model")
    return P()


def shard_params_fsdp(tree, mesh: Mesh):
    """Place a params/opt-state pytree with FSDP shardings on the mesh."""
    n_model = mesh.shape["model"]

    def place(leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, _leaf_spec(leaf, n_model)))

    return jax.tree.map(place, tree)


def shard_train_state_fsdp(state, mesh: Mesh):
    """TrainState placement: params/opt/per-channel state sharded over
    'model'; rng/step replicated; (batch goes over 'data' separately)."""
    from tpugan.train.state import TrainState

    return TrainState(
        params_g=shard_params_fsdp(state.params_g, mesh),
        state_g=shard_params_fsdp(state.state_g, mesh),
        opt_g=shard_params_fsdp(state.opt_g, mesh),
        params_d=shard_params_fsdp(state.params_d, mesh),
        state_d=shard_params_fsdp(state.state_d, mesh),
        opt_d=shard_params_fsdp(state.opt_d, mesh),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params_g_ema=(shard_params_fsdp(state.params_g_ema, mesh)
                      if state.params_g_ema is not None else None),
        ada_p=(jax.device_put(state.ada_p, NamedSharding(mesh, P()))
               if state.ada_p is not None else None),
        ada_rt=(jax.device_put(state.ada_rt, NamedSharding(mesh, P()))
                if state.ada_rt is not None else None),
    )


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
