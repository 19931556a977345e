"""Pallas kernel: strided conv + per-channel batch statistics in ONE pass.

The training-path fusion XLA does NOT do (DESIGN.md §4 backlog): in a
train-mode DBlock, XLA materializes the conv output to HBM, re-reads it to
reduce BatchNorm's batch statistics, and reads it a third time to normalize.
This kernel emits the conv output AND the per-channel (Σy, Σy²) in the same
pass — the normalize+activation epilogue then needs only one more read,
saving a full HBM pass over the activation per block.

Mechanics: parity-plane conv (pallas_conv.py math); each grid program emits
its partial per-channel (Σy, Σy²) into its own sublane-ALIGNED (8, cout)
block of a second output (rows 0/1 carry Σ/Σ², rows 2-7 are zero), reduced
to the batch statistics by XLA afterwards.

STATUS (hardware, round 2): RUNS CORRECTLY on the v5e — round 1's worker
faults (revisited-output accumulation, scratch+final write, (1, 2, C)
partial blocks) were all triggered by the sublane-unaligned second output
tile; padding each program's stats block to the full 8-row sublane tile
fixes it (bisected by benchmarks/probe_stats2.py: err_y 1.4e-6 vs XLA,
stats err ≤2e-7).  BUT it is SLOWER end-to-end: the full dcgan_cifar10
train step at batch 256 measures 1.78 ms fused vs 0.49 ms unfused
(benchmarks/train_bench.py --fuse-stats on|off) — the Pallas base conv
runs at 0.23-0.67x XLA's MXU-roofline conv (DESIGN.md §4), which the one
saved HBM stats pass cannot recover.  Shipped probe-gated and OFF by
default (cfg.train.fuse_stats); the fusion lane is formally closed on
this toolchain unless the base conv reaches XLA parity first.
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
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

    # Per-program PARTIAL stats in a sublane-ALIGNED (8, cout) block: rows
    # 0/1 = Σ/Σ², rows 2-7 zero; XLA reduces the partials afterwards.  No
    # block is ever revisited (cross-program accumulation faults this
    # toolchain's TPU worker), and the 8-row padding matters: any second
    # output whose tile is smaller than the 8-sublane hardware tile faults
    # the worker at runtime (bisected in benchmarks/probe_stats2.py).
    s = jnp.sum(acc, axis=0, keepdims=True)                # (1, cout)
    sq = jnp.sum(jnp.square(acc), axis=0, keepdims=True)   # (1, cout)
    z = jnp.zeros((6, cout), jnp.float32)
    stats_ref[...] = jnp.concatenate([s, sq, z], axis=0)   # (8, cout)


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
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, Ho, Wo, cout), out_dtype),
            jax.ShapeDtypeStruct((grid[0] * 8, cout), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(*planes, w)
    # XLA reduces the per-program partials; rows 2-7 of each block are zero.
    st = stats.reshape(grid[0], 8, cout)
    return out, jnp.stack([st[:, 0].sum(0), st[:, 1].sum(0)])


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
    # clamp fp32 cancellation on near-constant channels (rsqrt NaN guard)
    var = jnp.maximum(stats[1] / count - jnp.square(mean), 0.0)
    return y, mean, var


# ---------------------------------------------------------------------------
# Differentiable train-path op: conv + batch stats with a hand-written VJP.
#
# The fused forward is this file's Pallas kernel on TPU (one HBM pass emits
# both the conv output and the per-channel Σ/Σ²) and the plain XLA
# composition elsewhere — SAME custom_vjp either way, so the CPU test suite
# validates the backward math the TPU path uses.
#
# NOTE: custom_vjp is first-order only (no grad-of-grad), which is fine for
# every BN discriminator (dcgan/lsgan/wgan-clip/cdcgan); the WGAN-GP
# double-backward path never has BN in D (reference idiom: GP replaces BN),
# and DBlock only takes this path when a BatchNorm follows the conv.
# ---------------------------------------------------------------------------


def _xla_conv421(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _xla_conv_stats(x, w):
    y = _xla_conv421(x, w)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    # clamp fp32 cancellation on near-constant channels (rsqrt NaN guard)
    var = jnp.maximum(
        jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean), 0.0)
    return y, mean, var


def _primal(x, w):
    if jax.default_backend() == "tpu":
        r = conv_stats(x, w)
        if r is not None:
            return r
    return _xla_conv_stats(x, w)


@jax.custom_vjp
def conv_bn_stats(x, w):
    """Differentiable fused y = Conv(4,2,1)(x, w) + batch (mean, var).

    Forward: ONE pass over the activation on TPU (Pallas; stats ride the
    conv's VMEM-resident accumulator) vs XLA's three (conv write, stats
    read, normalize read).  Backward: the exact unfused VJP, XLA-composed.
    """
    return _primal(x, w)


def _fwd(x, w):
    y, mean, var = _primal(x, w)
    return (y, mean, var), (x, w, y, mean)


def _bwd(res, cots):
    x, w, y, mean = res
    yb, mb, vb = cots
    count = y.shape[0] * y.shape[1] * y.shape[2]
    # mean = Σy/count ⇒ ∂L/∂y += m̄/count;  var = Σy²/count − mean² ⇒
    # ∂L/∂y += 2(y − mean)·v̄/count  (the −mean² term's chain through mean
    # is already folded in: d var/d y_i = 2y_i/count − 2·mean/count).
    extra = (mb + 2.0 * (y.astype(jnp.float32) - mean) * vb) / count
    y_total = (yb.astype(jnp.float32) + extra).astype(y.dtype)
    _, vjp = jax.vjp(_xla_conv421, x, w)
    return vjp(y_total)


conv_bn_stats.defvjp(_fwd, _bwd)


_FUSE_MODE = "off"  # process default; the Trainer sets cfg.train.fuse_stats


def set_fuse_stats(mode: str) -> None:
    """Set the train-path conv+BN-stats fusion mode ("on"|"off"|"auto")."""
    global _FUSE_MODE
    if mode not in ("on", "off", "auto"):
        raise ValueError(f"unknown fuse_stats mode {mode!r}")
    _FUSE_MODE = mode


def fuse_stats_enabled() -> bool:
    """Trace-time switch consulted by DBlock's train forward."""
    if _FUSE_MODE == "off":
        return False
    if _FUSE_MODE == "on":
        return True
    return jax.default_backend() == "tpu" and probe_ok()


# ---------------------------------------------------------------------------
# Runtime probe.  A bad toolchain faults the TPU *worker* at runtime (no
# exception — the client process dies), so the probe must run in a
# subprocess; the result is cached on disk keyed by backend.
# ---------------------------------------------------------------------------

_PROBE_SRC = """
import numpy as np, jax, jax.numpy as jnp
from tpugan.ops.pallas_conv_stats import conv_stats, _xla_conv_stats
x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16, 16, 128)),
                jnp.float32)
w = jnp.asarray(np.random.default_rng(1).standard_normal((4, 4, 128, 128))
                * 0.05, jnp.float32)
y, m, v = conv_stats(x, w)
yr, mr, vr = _xla_conv_stats(x, w)
ok = (np.max(np.abs(np.asarray(y) - np.asarray(yr))) < 1e-3
      and np.max(np.abs(np.asarray(m) - np.asarray(mr))) < 1e-4
      and np.max(np.abs(np.asarray(v) - np.asarray(vr))) < 1e-4)
print("CONV_STATS_PROBE_PASS" if ok else "CONV_STATS_PROBE_MISMATCH")
"""

_probe_cache: Optional[bool] = None


def _probe_cache_path() -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "tpugan")
    os.makedirs(d, exist_ok=True)
    # keyed by jax version + device kind: a toolchain upgrade or different
    # accelerator must re-probe, not inherit a stale pass/fail verdict
    try:
        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        kind = "unknown"
    return os.path.join(d, f"conv_stats_probe_{jax.__version__}_{kind}")


def probe_ok(timeout_s: float = 900.0) -> bool:
    """True iff the fused conv+stats kernel runs correctly on this backend.

    Subprocess-isolated (a worker fault kills the calling process on this
    toolchain) and disk-cached: the first call per machine pays one remote
    Mosaic compile (~2-5 min through the axon relay); later calls are free.
    """
    global _probe_cache
    if jax.default_backend() != "tpu":
        return False
    if _probe_cache is not None:
        return _probe_cache
    path = _probe_cache_path()
    if os.path.exists(path):
        with open(path) as f:
            _probe_cache = f.read().strip() == "pass"
        return _probe_cache
    cache_result = True
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], capture_output=True,
            text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        ok = "CONV_STATS_PROBE_PASS" in r.stdout
        if not ok and "CONV_STATS_PROBE_MISMATCH" not in r.stdout:
            # the subprocess died (worker fault) — a genuine kernel
            # verdict, cache it; but an empty/odd exit with rc==0 is
            # ambiguous, don't poison the cache
            cache_result = r.returncode != 0
    except Exception:
        # timeout / spawn failure: TRANSIENT (busy relay, OOM) — report
        # fail for this process but never write it to disk, or one bad
        # probe would disable the fused path machine-wide forever
        ok = False
        cache_result = False
    if cache_result:
        with open(path, "w") as f:
            f.write("pass" if ok else "fail")
    _probe_cache = ok
    return ok
