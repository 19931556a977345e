"""Spatial (height) sharding with halo exchange — the SP analog.

Image GANs have no sequence dimension, so sequence parallelism proper is
N/A (SURVEY.md §2b); the spatial analog shards the feature map's height over
a mesh axis so feature maps larger than one chip's HBM can be convolved.
Each shard holds H/n rows; a strided Conv(k=4, s=2, p=1) needs one halo row
from each neighbor (output row i reads input rows 2i−1 … 2i+2), exchanged
with ``lax.ppermute`` over ICI inside ``shard_map``.

This is the post-parity scaling path for ≥256px models (ROADMAP §5);
shipped here as a correct, tested primitive on the virtual mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugan.ops.convs import DIMS


def spatial_conv2d(x, w, mesh: Mesh, *, axis: str = "space"):
    """Conv(k=4, s=2, p=1) with x sharded on H over ``axis``.

    x: (N, H, W, Cin) with H divisible by 2*mesh.shape[axis];
    w: (4, 4, Cin, Cout).  Returns (N, H/2, W, Cout) sharded the same way.
    """
    n_shards = mesh.shape[axis]
    if x.shape[1] % (2 * n_shards) != 0:
        raise ValueError(
            f"H={x.shape[1]} must be divisible by 2*n_shards={2 * n_shards} "
            "(stride-2 windows must align with shard boundaries)")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None))
    def conv_shard(xs, wf):
        idx = lax.axis_index(axis)
        # halo exchange: one row each way (output row i reads input rows
        # 2i-1 .. 2i+2; the shard's last window tops out at its row Hs,
        # the neighbor's first row)
        up = lax.ppermute(xs[:, -1:], axis,
                          [(i, (i + 1) % n_shards) for i in range(n_shards)])
        down = lax.ppermute(xs[:, :1], axis,
                            [(i, (i - 1) % n_shards)
                             for i in range(n_shards)])
        # global edges use zero padding (p=1 for the top row; the bottom
        # halo rows simply aren't read for the last shard's outputs)
        up = jnp.where(idx == 0, jnp.zeros_like(up), up)
        down = jnp.where(idx == n_shards - 1, jnp.zeros_like(down), down)
        xh = jnp.concatenate([up, xs, down], axis=1)
        # rows now span global [2*o0 - 1, ...]; convolve VALID in H with the
        # standard p=1 padding in W
        return lax.conv_general_dilated(
            xh, wf, window_strides=(2, 2),
            padding=[(0, 0), (1, 1)],
            dimension_numbers=DIMS)

    return conv_shard(x, w)


def shard_spatial(x, mesh: Mesh, axis: str = "space"):
    """Place (N, H, W, C) with H sharded over ``axis``."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis, None, None)))
