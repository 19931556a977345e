"""Pallas megakernel: the ENTIRE DCGAN generator in one kernel launch.

Motivation (measured on this chip, see BASELINE.md): the XLA per-layer
lowering runs at ~68% MXU utilization with the remaining time spent writing
and re-reading inter-layer activations through HBM.  This kernel computes
dense-head → [ConvT(4,2,1)+affine+ReLU]× → ConvT+bias+Tanh for a batch tile
entirely in VMEM: HBM traffic drops to z in, image out, weights once — the
activations never leave the chip's vector memory.

Per-layer math is the phase-decomposed transpose conv of pallas_convt.py
(16 shifted MXU matmuls per block, zero wasted multiplies on dilation
zeros); the (BT,H,2,W,2,C)→(BT,2H,2W,C) phase interleave is a bit-exact
reshape done functionally between in-kernel layers.

Eval-mode only by design: BatchNorm is folded into per-channel (a, b)
affines (ops.fused.bn_affine).  This is exactly the sampler / FID / serving
path — the north-star images/sec metric.  Training keeps the XLA path (it
needs batch statistics and autodiff).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugan.ops.fused import bn_affine

from tpugan.ops.kernel_common import TAPS as _TAPS  # noqa: E402
# The Mosaic default scoped-VMEM limit is 16MB; raising it to 64MB is
# hardware-verified OK on this v5e (benchmarks/probe_mosaic.py bisect).
# Budget conservatively below it — double buffering and relayout
# temporaries aren't all in our accounting.
_VMEM_LIMIT = 64 * 1024 * 1024
# keep well under the limit: the compiler's own temporaries exceeded our
# accounting by ~1.8x at budget=36MB (79M observed vs 64M limit)
_VMEM_BUDGET = 20 * 1024 * 1024


def _convt_block(x, w, a, b, act: str):
    """In-kernel fused ConvT(4,2,1)+affine+act. x: (BT,H,W,Cin) values."""
    bt, H, W, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for di in (0, 1):
        cols = []
        for dj in (0, 1):
            acc = jnp.zeros((bt * H * W, cout), jnp.float32)
            for kh, oh in _TAPS[di]:
                for kw, ow in _TAPS[dj]:
                    xs = xp[:, 1 + oh:1 + oh + H, 1 + ow:1 + ow + W, :]
                    acc = acc + jnp.dot(
                        xs.reshape(bt * H * W, cin), w[kh, kw],
                        preferred_element_type=jnp.float32)
            y = acc * a.reshape(1, cout) + b.reshape(1, cout)
            if act == "relu":
                y = jax.nn.relu(y)
            elif act == "tanh":
                y = jnp.tanh(y)
            # keep phases fp32 through the interleave: Mosaic's bf16
            # relayout paths crash the compiler (probe_mosaic findings)
            cols.append(y.reshape(bt, H, W, cout))
        rows.append(jnp.stack(cols, axis=3))  # (BT,H,W,2,C)
    full = jnp.stack(rows, axis=2)  # (BT,H,2,W,2,C)
    # bit-exact interleave: (BT,H,2,W,2,C) -> (BT,2H,2W,C)
    return full.reshape(bt, 2 * H, 2 * W, cout).astype(jnp.bfloat16)


def _mega_kernel(*refs, n_blocks, s0, c0, out_dtype):
    z_ref = refs[0]
    wh_ref, ah_ref, bh_ref = refs[1], refs[2], refs[3]
    out_ref = refs[-1]
    blk = refs[4:-1]  # n_blocks * (w, a, b)

    z = z_ref[...]  # (BT, nz) bf16
    bt = z.shape[0]
    h = jnp.dot(z, wh_ref[...], preferred_element_type=jnp.float32)
    h = h * ah_ref[...].reshape(1, -1) + bh_ref[...].reshape(1, -1)
    x = jax.nn.relu(h).reshape(bt, s0, s0, c0).astype(jnp.bfloat16)

    for i in range(n_blocks):
        w, a, b = blk[3 * i], blk[3 * i + 1], blk[3 * i + 2]
        act = "tanh" if i == n_blocks - 1 else "relu"
        x = _convt_block(x, w[...], a[...], b[...], act)
    out_ref[...] = x.astype(out_dtype)


def fold_generator(g, params, state, eps: float = 1e-5):
    """Fold a tpugan Generator's eval-mode params+BN stats into the flat
    (head, blocks) affine representation this kernel consumes.

    Head affine is broadcast per-channel to the s0*s0*c0 dense output; block
    affines are per-channel (Cout,). Final block uses (1, bias).
    """
    s0, c0 = g.head.s0, g.head.cout
    head = params["head"]
    wh = head["dense"]["w"]  # (nz, s0*s0*c0)
    if g.head.bn is not None:
        # per-channel BN affine -> tile over the s0*s0 pixels of the
        # (s0, s0, c0)-flattened dense output
        a, b = bn_affine(head["bn"]["scale"], head["bn"]["bias"],
                         state["head"]["bn"]["mean"],
                         state["head"]["bn"]["var"], eps)
        ah = jnp.tile(a, s0 * s0)
        bh = jnp.tile(b, s0 * s0)
    else:
        # no head BN (g_batchnorm=False): the Dense bias is ALREADY laid
        # out over the full s0*s0*c0 output — tiling it again would build
        # an (s0^2 * s0^2 * c0) affine and shape-error at trace time
        ah = jnp.ones((s0 * s0 * c0,), jnp.float32)
        b = head["dense"].get("b")
        bh = (jnp.asarray(b, jnp.float32) if b is not None
              else jnp.zeros((s0 * s0 * c0,), jnp.float32))

    blocks = []
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        wb = blk["conv"]["w"]
        if "bn" in blk:
            ab, bb = bn_affine(blk["bn"]["scale"], blk["bn"]["bias"],
                               state[f"block{i}"]["bn"]["mean"],
                               state[f"block{i}"]["bn"]["var"], eps)
        else:
            # no block BN: identity scale, ConvT bias as the affine shift
            cb = wb.shape[-1]
            ab = jnp.ones((cb,), jnp.float32)
            bb = jnp.asarray(blk["conv"].get(
                "b", jnp.zeros((cb,), jnp.float32)), jnp.float32)
        blocks.append((wb, ab, bb))
        i += 1
    fin = params["final"]
    cf = fin["conv"]["w"].shape[-1]
    blocks.append((fin["conv"]["w"],
                   jnp.ones((cf,), jnp.float32),
                   fin["conv"]["b"].astype(jnp.float32)))
    return (wh, ah, bh), blocks, (s0, c0)


def _vmem_bytes(bt, s0, c0, blocks):
    # weights + worst-case live activations, with a 2x fudge for Mosaic
    # double-buffering and relayout temporaries (empirically calibrated:
    # the compiler reported ~2.5x our raw accounting on the first attempt)
    wbytes = 0
    h, c = s0, c0
    act_peak = bt * s0 * s0 * c0 * 4
    for (w, a, b) in blocks:
        cout = w.shape[-1]
        wbytes += w.size * 2 + (a.size + b.size) * 4
        live = (bt * h * h * c * 2          # x bf16
                + bt * (h + 2) * (h + 2) * c * 2  # padded
                + 4 * bt * h * h * cout * 4      # 4 f32 phases
                + 4 * bt * h * h * cout * 4      # f32 stack temp
                + bt * 4 * h * h * cout * 2)     # bf16 out
        act_peak = max(act_peak, live)
        h, c = h * 2, cout
    return wbytes + 2 * act_peak


@functools.partial(jax.jit, static_argnames=("s0", "c0", "out_dtype", "bt"))
def _call(z, wh, ah, bh, flat_blocks, s0, c0, out_dtype, bt):
    n = z.shape[0]
    n_blocks = len(flat_blocks) // 3
    size = s0 * (2 ** n_blocks)
    cf = flat_blocks[-3].shape[-1]
    grid = (n // bt,)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    wh2 = wh.astype(jnp.bfloat16)
    args = [z.astype(jnp.bfloat16), wh2, ah.reshape(1, -1),
            bh.reshape(1, -1)]
    in_specs = [
        pl.BlockSpec((bt, z.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec(wh2), const_spec(ah.reshape(1, -1)),
        const_spec(bh.reshape(1, -1)),
    ]
    for k in range(n_blocks):
        w, a, b = flat_blocks[3 * k:3 * k + 3]
        w = w.astype(jnp.bfloat16)
        args += [w, a.reshape(1, -1), b.reshape(1, -1)]
        in_specs += [const_spec(w), const_spec(a.reshape(1, -1)),
                     const_spec(b.reshape(1, -1))]

    kernel = functools.partial(_mega_kernel, n_blocks=n_blocks, s0=s0,
                               c0=c0, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, size, size, cf),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, size, size, cf), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(*args)


def generator_forward(g, params, state, z, *, out_dtype=jnp.float32,
                      eps: float = 1e-5, batch_tile: int = 8):
    """Run the whole generator (eval mode) as one Pallas kernel.

    Returns None if the model shape is unsupported (caller falls back to the
    XLA path).  ``batch_tile`` fixes the per-program batch tile (8 is the
    hardware-validated default for the G-64 shapes; larger tiles have
    triggered Mosaic compiler crashes) — shrunk automatically to fit VMEM
    and divide the batch."""
    try:
        (wh, ah, bh), blocks, (s0, c0) = fold_generator(g, params, state, eps)
    except (KeyError, AttributeError):
        return None
    for (w, _, _) in blocks:
        if w.shape[0] != 4 or w.shape[1] != 4:
            return None
    n = z.shape[0]
    bt = min(batch_tile, n)
    while bt > 1 and (_vmem_bytes(bt, s0, c0, blocks) > _VMEM_BUDGET
                      or n % bt != 0):
        bt //= 2
    flat = []
    for (w, a, b) in blocks:
        flat += [w, a, b]
    return _call(z, wh, ah, bh, tuple(flat), s0, c0, jnp.dtype(out_dtype),
                 bt)
