"""Pallas TPU kernel: fused ConvTranspose(k=4, s=2, p=1) + affine + act.

This is the generator's hot op (every GBlock).  XLA lowers transpose conv to
an input-dilated conv; on TPU that is compute-efficient but each layer's
output still round-trips HBM.  This kernel fuses the BatchNorm affine
(scale/shift folded from stats, see ops/fused.bn_affine) and the activation
into the conv epilogue, and is the building block for the whole-generator
megakernel (ops/pallas_gen.py) that keeps activations resident in VMEM.

Math — phase decomposition (zero-skipping transpose conv)
----------------------------------------------------------
With stride 2 the output splits into 4 parity phases; each phase touches a
fixed 2×2 subset of the 4×4 kernel taps, so the deconv is 16 shifted
channel-contraction matmuls with NO multiply-by-inserted-zeros:

    out[2i+di, 2j+dj] = Σ_{kh∈K(di)} Σ_{kw∈K(dj)} x[ih(kh), iw(kw)] · W[kh,kw]

    K(0) = {1, 3} with ih = i, i-1      K(1) = {0, 2} with ih = i+1, i

(torch ConvTranspose2d semantics: out = s·i + k − p with p = 1; weights in
tpugan's HWIO deconv layout, unflipped.)  Each tap is a static shifted slice
of the (+1-padded) input, flattened to (B·H·W, Cin) @ (Cin, Cout) on the MXU
with fp32 accumulation.

Grid: one program per batch tile; the full (small) spatial extent stays in
VMEM.  Returns None from the dispatch wrapper when the shape/attributes are
unsupported so callers fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap tables: phase parity -> [(kernel_index, input_offset)], offsets are
# relative to i (output coarse index); input is pre-padded by 1 so offset -1
# is in range.
from tpugan.ops.kernel_common import TAPS as _TAPS  # noqa: E402

_VMEM_BUDGET = 12 * 1024 * 1024  # ~16MB VMEM/core on v5e, leave headroom


from tpugan.ops.kernel_common import act as _act  # noqa: E402


def _kernel(x_ref, w_ref, a_ref, b_ref, out_ref, *, H, W, cin, cout,
            act, leak, out_dtype):
    x = x_ref[...]  # (BT, H+2, W+2, cin)
    bt = x.shape[0]
    w = w_ref[...]  # (4, 4, cin, cout)
    a = a_ref[...].reshape(1, cout)  # (1, cout) f32
    b = b_ref[...].reshape(1, cout)

    # Phase interleave notes (hardware-verified, benchmarks/probe_mosaic.py):
    # Mosaic compiles the rank-6 fp32 stack+reshape and fp32 strided stores,
    # but CRASHES on bf16 strided stores and rejects integer-indexed 6-D ref
    # stores ("unsupported shape cast"). So: accumulate phases in fp32,
    # interleave with the fp32 stack, cast once, one contiguous store.
    rows = []
    for di in (0, 1):
        cols = []
        for dj in (0, 1):
            acc = jnp.zeros((bt * H * W, cout), jnp.float32)
            for kh, oh in _TAPS[di]:
                for kw, ow in _TAPS[dj]:
                    # padded index = offset + 1
                    xs = x[:, 1 + oh:1 + oh + H, 1 + ow:1 + ow + W, :]
                    xs = xs.reshape(bt * H * W, cin)
                    acc = acc + jnp.dot(xs, w[kh, kw],
                                        preferred_element_type=jnp.float32)
            y = _act(acc * a + b, act, leak)
            cols.append(y.reshape(bt, H, W, cout))
        rows.append(jnp.stack(cols, axis=3))      # (BT,H,W,2,C) f32
    full = jnp.stack(rows, axis=2)                # (BT,H,2,W,2,C) f32
    out_ref[...] = full.reshape(bt, 2 * H, 2 * W, cout).astype(out_dtype)


def _vmem_bytes(bt, H, W, cin, cout, in_bytes=2):
    x = bt * (H + 2) * (W + 2) * cin * in_bytes
    w = 16 * cin * cout * in_bytes
    acc = 4 * bt * H * W * cout * 4  # 4 f32 phases
    stack = 4 * bt * H * W * cout * 4  # f32 interleave temp
    # f32 output tiles (the bare hooks request f32 regardless of input)
    out = bt * 4 * H * W * cout * 4
    return x + w + acc + stack + out


@functools.partial(jax.jit, static_argnames=("act", "leak", "out_dtype"))
def _dispatch(x, w, a, b, act, leak, out_dtype):
    n, H, Wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # choose the largest batch tile that fits the VMEM budget
    bt = n
    while bt > 1 and (_vmem_bytes(bt, H, Wd, cin, cout) > _VMEM_BUDGET
                      or n % bt != 0):
        bt //= 2
    grid = (n // bt,)

    kernel = functools.partial(_kernel, H=H, W=Wd, cin=cin, cout=cout,
                               act=act, leak=leak, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, H + 2, Wd + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 2 * H, 2 * Wd, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * H, 2 * Wd, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp, w, a, b)


def convt_affine_act(x, w, scale, shift, *, act: str = "relu",
                     leak: float = 0.2, out_dtype=None) -> Optional[jax.Array]:
    """Fused y = act(convT_{4,2,1}(x, w) * scale + shift).

    x: (N,H,W,Cin); w: (4,4,Cin,Cout) HWIO deconv weights (unflipped);
    scale/shift: (Cout,) fp32 per-channel affine (from bn_affine, or
    (1, bias) for plain bias).  Returns None if unsupported (caller falls
    back to XLA).
    """
    if w.shape[0] != 4 or w.shape[1] != 4:
        return None
    n, H, Wd, cin = x.shape
    if n < 1:
        return None
    out_dtype = out_dtype or x.dtype
    a = jnp.asarray(scale, jnp.float32).reshape(1, -1)
    b = jnp.asarray(shift, jnp.float32).reshape(1, -1)
    return _dispatch(x, w, a, b, act, float(leak), jnp.dtype(out_dtype))


def conv_transpose2d(x, w, *, stride: int, padding: int
                     ) -> Optional[jax.Array]:
    """ops.conv_transpose2d pallas hook: bare transpose conv (no epilogue)."""
    if stride != 2 or padding != 1 or w.shape[0] != 4:
        return None
    cout = w.shape[-1]
    one = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    return convt_affine_act(x, w, one, zero, act="none",
                            out_dtype=jnp.float32)
