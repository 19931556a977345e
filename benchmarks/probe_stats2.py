"""Hardware probe: conv+stats second-output formulations, round 2.

Round-1 finding (ops/pallas_conv_stats.py STATUS): every formulation with a
small heterogeneous second output — (1, 2, C) partial blocks, revisited
accumulation, scratch+final-write — FAULTS the TPU worker at runtime on
this toolchain, while the identical conv with a single output runs fine.

Untried hypothesis: the trigger is the sublane-UNALIGNED second output tile
(2 rows where the hardware tile is 8×128).  Formulation D writes each
program's (Σy, Σy²) into rows 0-1 of an aligned (8, cout) block — second
output shape (grid*8, cout), every dimension tile-friendly.

Run ON THE CHIP (plain python, axon backend).  Each remote Mosaic compile
takes 2-5 min; a worker fault prints nothing and kills the process — run
under a wrapper that reports the rc.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_d(p00, p01, p10, p11, w_ref, out_ref, stats_ref,
              *, Ho, Wo, cin, cout):
    planes = {(0, 0): p00[...], (0, 1): p01[...],
              (1, 0): p10[...], (1, 1): p11[...]}
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
    # Aligned stats block: (8, cout); rows 0/1 = Σ, Σ²; rows 2-7 zero.
    s = jnp.sum(acc, axis=0, keepdims=True)
    sq = jnp.sum(jnp.square(acc), axis=0, keepdims=True)
    z = jnp.zeros((6, cout), jnp.float32)
    stats_ref[...] = jnp.concatenate([s, sq, z], axis=0)


@functools.partial(jax.jit, static_argnames=("bt",))
def conv_stats_d(x, w, bt):
    n, H, Wd, cin = x.shape
    cout = w.shape[-1]
    Ho, Wo = H // 2, Wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = [xp[:, ph::2, pw::2, :] for ph in (0, 1) for pw in (0, 1)]
    Hp, Wp = planes[0].shape[1], planes[0].shape[2]
    grid = (n // bt,)
    kernel = functools.partial(_kernel_d, Ho=Ho, Wo=Wo, cin=cin, cout=cout)
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
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, Ho, Wo, cout), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*planes, w)
    st = stats.reshape(grid[0], 8, cout)
    return out, st[:, 0].sum(0), st[:, 1].sum(0)


def main():
    n, H, W, cin, cout = 64, 16, 16, 64, 128
    bt = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, cin, cout)) * 0.05,
                    jnp.float32)

    # Reference via XLA
    y_ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    print("compiling formulation D (aligned 8-row stats block)...",
          flush=True)
    t0 = time.time()
    y, s, sq = conv_stats_d(x, w, bt)
    y, s, sq = map(np.asarray, (y, s, sq))
    print(f"ran in {time.time()-t0:.1f}s", flush=True)
    err_y = np.abs(y - np.asarray(y_ref)).max()
    s_ref = np.asarray(y_ref, np.float64).sum((0, 1, 2))
    sq_ref = (np.asarray(y_ref, np.float64) ** 2).sum((0, 1, 2))
    err_s = np.abs(s - s_ref).max() / (np.abs(s_ref).max() + 1e-9)
    err_sq = np.abs(sq - sq_ref).max() / (np.abs(sq_ref).max() + 1e-9)
    print(f"err_y={err_y:.2e} err_s={err_s:.2e} err_sq={err_sq:.2e}",
          flush=True)
    ok = err_y < 1e-3 and err_s < 1e-4 and err_sq < 1e-4
    print("FORMULATION_D:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
