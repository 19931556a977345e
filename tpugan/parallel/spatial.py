"""Spatial (H or W) sharding with halo exchange — the SP analog.

Image GANs have no sequence dimension, so sequence parallelism proper is
N/A (SURVEY.md §2b); the spatial analog shards a feature-map axis over the
mesh so maps larger than one chip's HBM can be convolved.  This module is
the complete scaling path for ≥256px models:

- ``spatial_conv2d``      — Conv(k=4, s=2, p=1), sharded H or W
- ``spatial_conv_transpose2d`` — ConvT(k=4, s=2, p=1) via the input-dilated
  equivalence, sharded H or W
- a trace-time **context** (``spatial_ctx``) consulted by ``tpugan.ops``
  dispatch, so the models run spatially sharded WITHOUT model changes

Design (TPU-first): only the convs need manual halo control, so only they
run under ``shard_map`` (one row/col ``lax.ppermute`` each way over ICI).
Everything else — BatchNorm's global (N, H, W) reductions, activations,
losses — stays in jit's automatic SPMD partitioning, which inserts the
cross-shard collectives itself.  shard_map is differentiable (ppermute
transposes to ppermute), so the same primitives serve the train step.

Halo math, stride-2 k=4 p=1 conv: output row i reads input rows 2i−1…2i+2,
so a shard owning input rows [h0, h0+Hs) needs one halo row above and one
below.  ConvT: output = conv(zero-interleaved input, flipped w, pad k−1−p=2);
output rows [2h0, 2h0+2Hs) read dilated rows 2h0−2…2h0+2Hs+1, whose even
(= nonzero) members are input rows h0−1…h0+Hs — again one halo row each way.
The per-shard conv then needs NO extra pad in the sharded dim ((0, 0)): the
down-halo row supplies the trailing dilated elements, and VALID over the
dilated (halo+shard+halo) rows yields exactly 2Hs outputs (the derivation
lives at the pad assignment in _convt_forward).  Global edges substitute
zeros (= the reference padding).
"""

from __future__ import annotations

import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugan.ops.convs import DIMS


def _halo(xs, axis_name: str, n: int, dim: int, idx):
    """One-row/col halos from both neighbors, zeroed at the global edges."""
    size = xs.shape[dim]
    last = lax.slice_in_dim(xs, size - 1, size, axis=dim)
    first = lax.slice_in_dim(xs, 0, 1, axis=dim)
    up = lax.ppermute(last, axis_name,
                      [(i, (i + 1) % n) for i in range(n)])
    down = lax.ppermute(first, axis_name,
                        [(i, (i - 1) % n) for i in range(n)])
    up = jnp.where(idx == 0, jnp.zeros_like(up), up)
    down = jnp.where(idx == n - 1, jnp.zeros_like(down), down)
    return up, down


def _specs(dim: int, axis: str, mesh: Mesh):
    """in/weight PartitionSpecs: the spatial dim over ``axis``; when the
    mesh also carries a 'data' axis (2-D DP x spatial), the batch dim over
    it — each shard then owns a (batch-slice, row-slice) tile and the halo
    ppermutes stay within its 'space' row of the mesh."""
    spec = [None, None, None, None]
    spec[dim] = axis
    if "data" in mesh.shape and axis != "data":
        spec[0] = "data"
    return P(*spec), P()


def _sum_axes(axis: str, mesh: Mesh):
    """Axes a weight-gradient psum must reduce over: the spatial shards,
    plus the batch shards when the mesh is 2-D."""
    return (axis, "data") if "data" in mesh.shape and axis != "data" \
        else axis


def spatial_conv2d(x, w, mesh: Mesh, *, axis: str = "space", dim: int = 1):
    """Conv(k=4, s=2, p=1) with x sharded on H (dim=1) or W (dim=2).

    x: (N, H, W, Cin) with the sharded extent divisible by 2*n_shards;
    w: (4, 4, Cin, Cout).  Returns the stride-2 output sharded the same way.
    """
    n = mesh.shape[axis]
    if x.shape[dim] % (2 * n) != 0:
        raise ValueError(
            f"sharded dim {dim} extent {x.shape[dim]} must be divisible by "
            f"2*n_shards={2 * n} (stride-2 windows align with shards)")
    in_spec, w_spec = _specs(dim, axis, mesh)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(in_spec, w_spec),
                       out_specs=in_spec)
    def conv_shard(xs, wf):
        idx = lax.axis_index(axis)
        up, down = _halo(xs, axis, n, dim, idx)
        xh = jnp.concatenate([up, xs, down], axis=dim)
        # sharded dim: halos replace the k4/s2/p1 padding (VALID here);
        # unsharded spatial dim keeps the standard p=1.
        pad = [(1, 1), (1, 1)]
        pad[dim - 1] = (0, 0)
        return lax.conv_general_dilated(
            xh, wf, window_strides=(2, 2), padding=pad,
            dimension_numbers=DIMS)

    return conv_shard(x, w)


def spatial_conv_transpose2d(x, w, mesh: Mesh, *, axis: str = "space",
                             dim: int = 1):
    """ConvT(k=4, s=2, p=1) (out = 2·in) with x sharded on H or W.

    w is HWIO unflipped (tpugan ConvTranspose layout); the flip happens in
    the input-dilated lowering, exactly as in ops.conv_transpose2d.

    Differentiable via a hand-written VJP: XLA's transpose of the per-shard
    input-dilated conv produces HLO that CHECK-crashes the CPU backend's
    algebraic simplifier, and our halo conv is the better backward anyway
    (dx is exactly a k4/s2/p1 halo conv of the cotangent with the io-swapped
    kernel; dw is 16 strided einsums + psum).  First-order only, which is
    all ConvT ever needs — the GP double-backward touches only D's convs.
    """
    if x.shape[dim] % mesh.shape[axis] != 0:
        raise ValueError(
            f"sharded dim {dim} extent {x.shape[dim]} must be divisible by "
            f"n_shards={mesh.shape[axis]}")
    return _convt_vjp(mesh, axis, dim, x, w)


def _convt_forward(x, w, mesh: Mesh, axis: str, dim: int):
    n = mesh.shape[axis]
    in_spec, w_spec = _specs(dim, axis, mesh)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(in_spec, w_spec),
                       out_specs=in_spec)
    def convt_shard(xs, wu):
        idx = lax.axis_index(axis)
        up, down = _halo(xs, axis, n, dim, idx)
        xh = jnp.concatenate([up, xs, down], axis=dim)
        wf = wu[::-1, ::-1, :, :]
        # sharded dim: dilate-2 the (halo+shard+halo) rows.  Local dilated
        # row t is global dilated row 2(h0−1)+t, so local VALID output j is
        # global output row 2h0+j (reading dilated t = j…j+3, max needed
        # t = 2Hs+2 = exactly what's available) — no extra pad, and the
        # VALID count 2(Hs+2)−1 − 4 + 1 = 2Hs is precisely this shard's
        # output rows.  Unsharded dim: the standard k−1−p = 2 pad.
        pad = [(2, 2), (2, 2)]
        pad[dim - 1] = (0, 0)
        return lax.conv_general_dilated(
            xh, wf, window_strides=(1, 1), padding=pad,
            lhs_dilation=(2, 2), dimension_numbers=DIMS)

    return convt_shard(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _convt_vjp(mesh, axis, dim, x, w):
    return _convt_forward(x, w, mesh, axis, dim)


def _convt_fwd(mesh, axis, dim, x, w):
    return _convt_forward(x, w, mesh, axis, dim), (x, w)


def _convt_bwd(mesh, axis, dim, res, g):
    x, w = res
    # dx[h] = Σ_{kh,o} w[kh,·,i,o]·g[2h+kh−1,·,o]: a k4/s2/p1 conv of the
    # cotangent with in/out channels swapped, no spatial flip (verified
    # against jax.vjp of the dense op).
    dx = spatial_conv2d(g, jnp.swapaxes(w, 2, 3), mesh, axis=axis, dim=dim)

    n = mesh.shape[axis]
    in_spec, _ = _specs(dim, axis, mesh)
    odim = 3 - dim  # the unsharded spatial dim

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(in_spec, in_spec), out_specs=P())
    def dw_shard(xs, gs):
        idx = lax.axis_index(axis)
        # g rows needed for this shard's x rows h∈[h0, h0+Hs):
        # 2h+kh−1 ∈ [2h0−1, 2h0+2Hs+1) — one halo row each way.
        up, down = _halo(gs, axis, n, dim, idx)
        gp = jnp.concatenate([up, gs, down], axis=dim)
        pad = [(0, 0)] * 4
        pad[odim] = (1, 1)  # unsharded dim keeps the standard p=1
        gp = jnp.pad(gp, pad)
        parts = []
        for kh in range(4):
            row = []
            for kw in range(4):
                # Kernel taps are fixed to axes — H always indexes with kh,
                # W with kw; both axes slice k + 2·idx (the sharded dim via
                # its halo offset, the unsharded via its p=1 pad — same
                # local formula either way).  lax.slice is strict: the
                # limit only covers the last strided element.
                start = [0, kh, kw, 0]
                strides = [1, 2, 2, 1]
                limit = [gp.shape[0],
                         kh + 2 * (xs.shape[1] - 1) + 1,
                         kw + 2 * (xs.shape[2] - 1) + 1,
                         gp.shape[3]]
                gsl = lax.slice(gp, start, limit, strides)
                row.append(jnp.einsum("nhwi,nhwo->io",
                                      xs.astype(jnp.float32),
                                      gsl.astype(jnp.float32)))
            parts.append(jnp.stack(row))
        dw = jnp.stack(parts)  # (4, 4, Ci, Co), this shard's partial
        return lax.psum(dw, _sum_axes(axis, mesh))

    return dx, dw_shard(x, g).astype(w.dtype)


_convt_vjp.defvjp(_convt_fwd, _convt_bwd)


def shard_spatial(x, mesh: Mesh, axis: str = "space", dim: int = 1):
    """Place (N, H, W, C) with dim sharded over ``axis`` (and the batch
    dim over 'data' when the mesh is 2-D)."""
    spec, _ = _specs(dim, axis, mesh)
    return jax.device_put(x, NamedSharding(mesh, spec))


def make_mesh_dp_spatial(n_data: int, n_space: int) -> Mesh:
    """2-D (data, space) mesh: batch data-parallel AND feature maps
    spatially sharded — gradient psums ride 'data', halo ppermutes ride
    'space' (adjacent devices, so on hardware they are ICI neighbors)."""
    import numpy as np

    if n_data < 1 or n_space < 1:
        raise ValueError(f"mesh axes must be >= 1, got "
                         f"({n_data} data, {n_space} space)")
    devs = jax.devices()
    if n_data * n_space > len(devs):
        raise ValueError(
            f"mesh ({n_data} data x {n_space} space) needs "
            f"{n_data * n_space} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_data * n_space]).reshape(n_data, n_space),
                ("data", "space"))


# ---------------------------------------------------------------------------
# Trace-time spatial context: tpugan.ops.conv2d / conv_transpose2d consult
# this and route qualifying convs (k4/s2/p1, shard-divisible extents) to the
# halo primitives — the models themselves stay unchanged.
# ---------------------------------------------------------------------------

class _SpatialCtx(threading.local):
    mesh: Optional[Mesh] = None
    axis: str = "space"
    dim: int = 1
    min_extent: int = 0


_CTX = _SpatialCtx()


class spatial_ctx:
    """Context manager enabling spatial conv dispatch during tracing.

    ``min_extent`` skips maps whose sharded extent is too small to shard
    (coarse levels fall back to the replicated conv — with 8 shards a 4×4
    map isn't divisible anyway).
    """

    def __init__(self, mesh: Mesh, *, axis: str = "space", dim: int = 1,
                 min_extent: int = 0):
        self.prev = None
        self.vals = (mesh, axis, dim, min_extent)

    def __enter__(self):
        self.prev = (_CTX.mesh, _CTX.axis, _CTX.dim, _CTX.min_extent)
        _CTX.mesh, _CTX.axis, _CTX.dim, _CTX.min_extent = self.vals
        return self

    def __exit__(self, *exc):
        _CTX.mesh, _CTX.axis, _CTX.dim, _CTX.min_extent = self.prev


def set_spatial_mesh(mesh: Optional[Mesh], *, axis: str = "space",
                     dim: int = 1, min_extent: int = 0) -> None:
    """Non-contextual form of spatial_ctx (the Trainer holds it for a whole
    run); pass None to disable."""
    _CTX.mesh, _CTX.axis, _CTX.dim, _CTX.min_extent = (
        mesh, axis, dim, min_extent)


def spatial_active() -> bool:
    """True while a spatial_ctx is entered (models' fused-path guard)."""
    return _CTX.mesh is not None


def maybe_spatial_conv2d(x, w, *, stride: int, padding: int):
    """ops.conv2d hook: spatial dispatch, or None for the default path."""
    m = _CTX.mesh
    if (m is None or stride != 2 or padding != 1
            or w.shape[0] != 4 or w.shape[1] != 4):
        return None
    n, d = m.shape[_CTX.axis], _CTX.dim
    if x.shape[d] < max(_CTX.min_extent, 2 * n) or x.shape[d] % (2 * n):
        return None
    return spatial_conv2d(x, w, m, axis=_CTX.axis, dim=d)


def maybe_spatial_conv_transpose2d(x, w, *, stride: int, padding: int):
    """ops.conv_transpose2d hook: spatial dispatch, or None for default."""
    m = _CTX.mesh
    if (m is None or stride != 2 or padding != 1
            or w.shape[0] != 4 or w.shape[1] != 4):
        return None
    n, d = m.shape[_CTX.axis], _CTX.dim
    if x.shape[d] < max(_CTX.min_extent, n) or x.shape[d] % n:
        return None
    return spatial_conv_transpose2d(x, w, m, axis=_CTX.axis, dim=d)
