"""Pallas kernel: strided conv + per-channel batch statistics in ONE pass.

The training-path fusion XLA does NOT do (DESIGN.md §4 backlog): in a
train-mode DBlock, XLA materializes the conv output to HBM, re-reads it to
reduce BatchNorm's batch statistics, and reads it a third time to normalize.
This kernel emits the conv output AND the per-channel (Σy, Σy²) in the same
pass — the normalize+activation epilogue then needs only one more read,
saving a full HBM pass over the activation per block.

Mechanics: parity-plane conv (pallas_conv.py math); each grid program emits
its partial per-channel (Σy, Σy²) into its own block of a second output,
reduced to the batch statistics by XLA afterwards.

STATUS (hardware): math verified in interpret mode; the base parity-plane
conv kernel runs correctly compiled on this chip (pallas_conv), but adding
the small per-channel stats output FAULTS THE TPU WORKER at runtime in
every formulation tried (revisited-output accumulation, scratch+final
write, per-program partial blocks, 1-D and 2-D reductions) — the trigger
appears to be the heterogeneous second output itself on this tunneled
toolchain.  DO NOT deploy here; re-validate on a standard PJRT TPU runtime
before integrating the custom_vjp train path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, out_ref, stats_ref,
            *, Ho, Wo, cin, cout):
    planes = {(0, 0): p00_ref[...], (0, 1): p01_ref[...],
              (1, 0): p10_ref[...], (1, 1): p11_ref[...]}
    bt = planes[(0, 0)].shape[0]
    w = w_ref[...]

    acc = jnp.zeros((bt * Ho * Wo, cout), jnp.float32)
    for kh in range(4):
        for kw in range(4):
            plane = planes[(kh % 2, kw % 2)]
            xs = plane[:, kh // 2:kh // 2 + Ho, kw // 2:kw // 2 + Wo, :]
            acc = acc + jnp.dot(xs.reshape(bt * Ho * Wo, cin), w[kh, kw],
                                preferred_element_type=jnp.float32)

    out_ref[...] = acc.reshape(bt, Ho, Wo, cout).astype(out_ref.dtype)

    # Per-program PARTIAL stats: each program writes its own block of the
    # (num_programs, 2, C) output; XLA reduces them afterwards. No block is
    # ever revisited (cross-program accumulation faults this toolchain's
    # TPU worker), and everything stays 2-D (1-D vector ops are another
    # fault source on this hardware).
    s = jnp.sum(acc, axis=0, keepdims=True)                # (1, cout)
    sq = jnp.sum(jnp.square(acc), axis=0, keepdims=True)   # (1, cout)
    stats_ref[...] = jnp.concatenate([s, sq], axis=0)[None]  # (1, 2, cout)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _dispatch(x, w, out_dtype):
    n, H, Wd, cin = x.shape
    cout = w.shape[-1]
    Ho, Wo = H // 2, Wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = [xp[:, ph::2, pw::2, :] for ph in (0, 1) for pw in (0, 1)]
    Hp, Wp = planes[0].shape[1], planes[0].shape[2]

    bt = n
    def fits(b):
        return (4 * b * Hp * Wp * cin * 2 + 16 * cin * cout * 2
                + 2 * b * Ho * Wo * cout * 4) <= _VMEM_BUDGET
    while bt > 1 and (not fits(bt) or n % bt != 0):
        bt //= 2
    grid = (n // bt,)

    kernel = functools.partial(_kernel, Ho=Ho, Wo=Wo, cin=cin, cout=cout)
    plane_spec = pl.BlockSpec((bt, Hp, Wp, cin), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    out, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane_spec] * 4 + [
            pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bt, Ho, Wo, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
            jax.ShapeDtypeStruct((grid[0], 2, cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*planes, w)
    return out, stats.sum(axis=0)  # XLA reduces the per-program partials


def conv_stats(x, w, *, out_dtype=None
               ) -> Optional[Tuple[jax.Array, jax.Array, jax.Array]]:
    """y = Conv(4,2,1)(x, w) plus its per-channel batch mean and variance.

    Returns (y, mean, var) — biased variance over (N, Ho, Wo), exactly what
    train-mode BatchNorm normalizes with — or None when unsupported.
    """
    if w.shape[0] != 4 or w.shape[1] != 4:
        return None
    n, H, Wd, _ = x.shape
    if H % 2 or Wd % 2:
        return None
    out_dtype = out_dtype or x.dtype
    y, stats = _dispatch(x, w, jnp.dtype(out_dtype))
    count = n * (H // 2) * (Wd // 2)
    mean = stats[0] / count
    var = stats[1] / count - jnp.square(mean)
    return y, mean, var
