"""Pallas TPU kernel: fused strided Conv(k=4, s=2, p=1) + affine + act.

The discriminator's hot op (every DBlock: Conv + [BN] + LeakyReLU).  Strided
conv over a stride-2 grid reads each input pixel through a fixed kernel-tap
parity: splitting the (+1-padded) input into 4 parity planes turns the conv
into 16 unit-stride shifted matmuls on the MXU — no strided memory access in
the kernel, fp32 accumulation, and the BN affine + LeakyReLU fused into the
epilogue.

    out[i, j] = Σ_{kh,kw} xp[2i + kh, 2j + kw] · W[kh, kw]
    xp[2i + kh] = plane_{kh%2}[i + kh//2]          (planes of the padded x)

Plane split happens outside the kernel (an XLA relayout); the kernel sees
four (N, H/2+1, W/2+1, Cin) tensors.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


from tpugan.ops.kernel_common import act as _act  # noqa: E402


def _kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, a_ref, b_ref,
            out_ref, *, Ho, Wo, cin, cout, act, leak, out_dtype):
    planes = {(0, 0): p00_ref[...], (0, 1): p01_ref[...],
              (1, 0): p10_ref[...], (1, 1): p11_ref[...]}
    bt = planes[(0, 0)].shape[0]
    w = w_ref[...]
    a = a_ref[...].reshape(1, cout)
    b = b_ref[...].reshape(1, cout)

    acc = jnp.zeros((bt * Ho * Wo, cout), jnp.float32)
    for kh in range(4):
        for kw in range(4):
            plane = planes[(kh % 2, kw % 2)]
            oh, ow = kh // 2, kw // 2
            xs = plane[:, oh:oh + Ho, ow:ow + Wo, :].reshape(
                bt * Ho * Wo, cin)
            acc = acc + jnp.dot(xs, w[kh, kw],
                                preferred_element_type=jnp.float32)
    y = _act(acc * a + b, act, leak)
    out_ref[...] = y.reshape(bt, Ho, Wo, cout).astype(out_dtype)


def _vmem_bytes(bt, Hp, Wp, cin, cout, Ho, Wo, in_bytes=2):
    planes = 4 * bt * Hp * Wp * cin * in_bytes
    w = 16 * cin * cout * in_bytes
    acc = bt * Ho * Wo * cout * 4
    # the bare hooks request f32 output tiles regardless of input dtype —
    # account 4 bytes or a large shape can blow VMEM instead of falling back
    out = bt * Ho * Wo * cout * 4
    return planes + w + acc + out


@functools.partial(jax.jit, static_argnames=("act", "leak", "out_dtype"))
def _dispatch(x, w, a, b, act, leak, out_dtype):
    n, H, Wd, cin = x.shape
    cout = w.shape[-1]
    Ho, Wo = H // 2, Wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # parity planes of the padded input; padded size H+2 is even, each plane
    # (H/2+1, W/2+1)
    planes = [xp[:, ph::2, pw::2, :] for ph in (0, 1) for pw in (0, 1)]
    Hp, Wp = planes[0].shape[1], planes[0].shape[2]

    bt = n
    while bt > 1 and (_vmem_bytes(bt, Hp, Wp, cin, cout, Ho, Wo)
                      > _VMEM_BUDGET or n % bt != 0):
        bt //= 2
    grid = (n // bt,)

    kernel = functools.partial(_kernel, Ho=Ho, Wo=Wo, cin=cin, cout=cout,
                               act=act, leak=leak, out_dtype=out_dtype)
    plane_spec = pl.BlockSpec((bt, Hp, Wp, cin), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane_spec] * 4 + [
            pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*planes, w, a, b)


def conv_affine_act(x, w, scale, shift, *, act: str = "leaky_relu",
                    leak: float = 0.2, out_dtype=None
                    ) -> Optional[jax.Array]:
    """Fused y = act(conv_{4,2,1}(x, w) * scale + shift); None if unsupported."""
    if w.shape[0] != 4 or w.shape[1] != 4:
        return None
    n, H, Wd, _ = x.shape
    if H % 2 or Wd % 2:
        return None
    out_dtype = out_dtype or x.dtype
    a = jnp.asarray(scale, jnp.float32).reshape(1, -1)
    b = jnp.asarray(shift, jnp.float32).reshape(1, -1)
    return _dispatch(x, w, a, b, act, float(leak), jnp.dtype(out_dtype))


def conv2d(x, w, *, stride: int, padding: int) -> Optional[jax.Array]:
    """ops.conv2d pallas hook: bare strided conv (no epilogue)."""
    if stride != 2 or padding != 1 or w.shape[0] != 4 or w.shape[1] != 4:
        return None
    cout = w.shape[-1]
    one = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    return conv_affine_act(x, w, one, zero, act="none",
                           out_dtype=jnp.float32)
