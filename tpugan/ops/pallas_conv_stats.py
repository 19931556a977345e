"""Pallas kernel: strided conv + per-channel batch statistics in ONE pass.

The training-path fusion XLA does NOT do (DESIGN.md §4 backlog): in a
train-mode DBlock, XLA materializes the conv output to HBM, re-reads it to
reduce BatchNorm's batch statistics, and reads it a third time to normalize.
This kernel emits the conv output AND the per-channel (Σy, Σy²) in the same
pass — the normalize+activation epilogue then needs only one more read,
saving a full HBM pass over the activation per block.

Mechanics: parity-plane conv (pallas_conv.py math); the statistics
accumulate in a VMEM scratch buffer across sequential grid programs and are
written once by the last program.

STATUS (hardware): math verified in interpret mode; on this box's tunneled
toolchain the compiled kernel FAULTS THE TPU WORKER at runtime with either
accumulation pattern (revisited output block, or scratch+final-write) when
the grid has multiple programs — cross-program accumulation appears
runtime-broken here even though small-kernel chains/scan/custom_vjp all
work (ROADMAP item 1).  DO NOT deploy on this toolchain; re-validate on a
standard PJRT TPU runtime before integrating the custom_vjp train path.
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
            acc_scratch, *, Ho, Wo, cin, cout):
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

    # per-channel stats accumulate in SCRATCH (persists across sequential
    # grid programs) and are written to the output once, by the last
    # program. Accumulating directly in a revisited output block faulted
    # the TPU worker at runtime (pipelined output buffers rotate).
    s = jnp.sum(acc, axis=0)
    sq = jnp.sum(jnp.square(acc), axis=0)
    tile = jnp.stack([s, sq], axis=0)  # (2, cout)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    acc_scratch[...] += tile

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        stats_ref[...] = acc_scratch[...]


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
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*planes, w)
    return out, stats


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
