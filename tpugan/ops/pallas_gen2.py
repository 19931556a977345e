"""Pallas megakernel v2: whole generator, phase-separated layout.

v1 (pallas_gen.py) interleaved the 4 transpose-conv phases back into a
full-resolution NHWC tensor between layers; on hardware those interleaves
are VPU relayout storms that made the kernel 6.7× slower than XLA.  v2
never interleaves: activations stay in a **phase-separated layout**

    X_l : (Ph, Pw, BT, 4+2, 4+2, C_l)      Ph = Pw = 2^l

where the *base grid* is frozen at the generator head's 4×4 (plus a zero
halo) and each ConvT(4,2,1) doubles the phase axes instead of the spatial
axes.  Full-resolution coordinate: h = b·2^l + o with base cell b and phase
offset o.

Transpose-conv recurrence (see pallas_convt.py for the tap tables): the
output at phase 2o+d sums taps from input phases o+c, c ∈ {-1, 0, +1}; a
phase index stepping outside [0, 2^l) wraps into the ±1 *base* cell — i.e.
a window shift on the halo-padded base grid.  Both operations are leading-
axis slices/concats — the lane/sublane layout (base-minor, channels-last)
is never touched, so Mosaic emits no relayouts.  Each layer is exactly 16
MXU matmuls of (Ph·Pw·BT·16, Cin) @ (Cin, Cout) — identical FLOPs to the
dense deconv, zero multiplies on dilation zeros.

The single depth-to-space (phase → spatial) happens ONCE, outside the
kernel, as an XLA transpose of the final (P, P, BT, 4, 4, C) output.

Eval-mode (BN folded to affines), like v1 — this is the sampling/serving
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugan.ops.pallas_gen import fold_generator

# tap tables: output parity d -> [(kernel index k, phase offset c)]
from tpugan.ops.kernel_common import TAPS as _TAPS  # noqa: E402

_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 30 * 1024 * 1024
# The frozen base grid equals the generator head's spatial size (4 for the
# 32/64/128px family, 7 for the 28px MNIST family) — the phase recurrence is
# base-size agnostic.


def _shift_phase(xp, c, axis_phase, axis_base, base):
    """Tap input: phase o+c of the halo-padded stack ``xp``.

    xp: (..., P, ..., base+2, ...) with P on axis_phase and the padded base
    grid on axis_base.  Returns same-shape-P stack of (base,) windows.
    """

    def win(s):  # base window shifted by s: indices [1+s, 1+s+base)
        lo = 1 + s
        idx = [slice(None)] * xp.ndim
        idx[axis_base] = slice(lo, lo + base)
        return xp[tuple(idx)]

    if c == 0:
        return win(0)
    P = xp.shape[axis_phase]
    if P == 1:
        # single phase: o+c always wraps entirely into the +-1 base window
        return win(c)

    def take_phase(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis_phase] = sl
        return x[tuple(idx)]

    if c == 1:
        # phases 1..P-1 from window 0; phase P wraps to phase 0, base +1
        main = take_phase(win(0), slice(1, P))
        wrap = take_phase(win(1), slice(0, 1))
        return jnp.concatenate([main, wrap], axis=axis_phase)
    # c == -1: phase -1 wraps to phase P-1, base -1
    wrap = take_phase(win(-1), slice(P - 1, P))
    main = take_phase(win(0), slice(0, P - 1))
    return jnp.concatenate([wrap, main], axis=axis_phase)


def _pad_base(x):
    """Zero halo on the two base-grid axes (3 and 4) of
    (Ph, Pw, BT, base, base, C)."""
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _convt_block_phase(x, w, a, b, act: str):
    """One ConvT(4,2,1)+affine+act in phase space.

    x: (Ph, Pw, BT, base, base, Cin) f32 (unpadded)
    returns (2Ph, 2Pw, BT, base, base, Cout).
    """
    ph, pw, bt, base = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
    cin, cout = x.shape[-1], w.shape[-1]
    xp = _pad_base(x)
    m = ph * pw * bt * base * base

    rows = []
    for dh in (0, 1):
        cols = []
        for dw in (0, 1):
            acc = jnp.zeros((m, cout), jnp.float32)
            for kh, ch in _TAPS[dh]:
                xh = _shift_phase(xp, ch, axis_phase=0, axis_base=3,
                                  base=base)
                for kw, cw in _TAPS[dw]:
                    xs = _shift_phase(xh, cw, axis_phase=1, axis_base=4,
                                      base=base)
                    # bf16 only on the rank-2 matmul operand: high-rank bf16
                    # relayouts crash Mosaic (see probe findings); rank-2
                    # casts are safe and the MXU still runs bf16 x bf16.
                    acc = acc + jnp.dot(
                        xs.reshape(m, cin).astype(jnp.bfloat16), w[kh, kw],
                        preferred_element_type=jnp.float32)
            y = acc * a.reshape(1, cout) + b.reshape(1, cout)
            if act == "relu":
                y = jax.nn.relu(y)
            elif act == "tanh":
                y = jnp.tanh(y)
            cols.append(y.reshape(ph, pw, bt, base, base, cout))
        # phase interleave = leading-axis stack+reshape (no lane relayout):
        # out phase 2*ow+dw along axis 1
        rows.append(jnp.stack(cols, axis=2).reshape(
            ph, 2 * pw, bt, base, base, cout))
    return jnp.stack(rows, axis=1).reshape(
        2 * ph, 2 * pw, bt, base, base, cout)


def _mega_kernel2(*refs, n_blocks, c0, base, out_dtype):
    z_ref, wh_ref, ah_ref, bh_ref = refs[0], refs[1], refs[2], refs[3]
    out_ref = refs[-1]
    blk = refs[4:-1]

    z = z_ref[...]
    bt = z.shape[0]
    h = jnp.dot(z, wh_ref[...], preferred_element_type=jnp.float32)
    h = h * ah_ref[...].reshape(1, -1) + bh_ref[...].reshape(1, -1)
    # phases stay f32 end-to-end: high-rank bf16 values crash Mosaic
    x = jax.nn.relu(h).reshape(1, 1, bt, base, base, c0)

    for i in range(n_blocks):
        w, a, b = blk[3 * i][...], blk[3 * i + 1][...], blk[3 * i + 2][...]
        act = "tanh" if i == n_blocks - 1 else "relu"
        x = _convt_block_phase(x, w, a, b, act)
    out_ref[...] = x.astype(out_dtype)


def _vmem_bytes2(bt, c0, blocks, base):
    wbytes = 0
    c = c0
    p = 1
    peak = bt * base * base * c0 * 4
    for (w, a, b) in blocks:
        cout = w.shape[-1]
        wbytes += w.size * 2 + (a.size + b.size) * 4
        full_px = (p * base) ** 2
        padded_px = (p * p) * (base + 2) ** 2
        live = (bt * full_px * c * 4            # x f32
                + bt * padded_px * c * 4        # halo-padded copy f32
                + bt * full_px * c * 2          # bf16 matmul operand
                + bt * full_px * cout * 4       # one f32 phase accumulator
                + 4 * bt * full_px * cout * 4   # out phases f32
                + 2 * bt * full_px * cout * 4)  # stack temps f32
        peak = max(peak, live)
        p, c = 2 * p, cout
    return wbytes + 2 * peak


@functools.partial(jax.jit,
                   static_argnames=("c0", "base", "out_dtype", "bt"))
def _call2(z, wh, ah, bh, flat_blocks, c0, base, out_dtype, bt):
    n = z.shape[0]
    n_blocks = len(flat_blocks) // 3
    P = 2 ** n_blocks
    size = base * P
    cf = flat_blocks[-3].shape[-1]
    grid = (n // bt,)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    wh2 = wh.astype(jnp.bfloat16)
    args = [z.astype(jnp.bfloat16), wh2, ah.reshape(1, -1), bh.reshape(1, -1)]
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

    # f32 out ref: rank-6 bf16 stores are in Mosaic's crash zone
    kernel = functools.partial(_mega_kernel2, n_blocks=n_blocks, c0=c0,
                               base=base, out_dtype=jnp.float32)
    phased = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((P, P, bt, base, base, cf),
                               lambda i: (0, 0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, P, n, base, base, cf),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*args)
    # single depth-to-space, in XLA. Full-res coord h = b*2^l + o, so
    # spatial position is (base, phase) major/minor: (N, bh, oh, bw, ow, C)
    img = phased.transpose(2, 3, 0, 4, 1, 5)
    return img.reshape(n, size, size, cf).astype(out_dtype)


def generator_forward(g, params, state, z, *, out_dtype=jnp.float32,
                      eps: float = 1e-5, batch_tile: int = 32, y=None):
    """Whole-generator forward (eval) in the phase-separated megakernel.

    Conditional generators are supported by folding the label embedding
    OUTSIDE the kernel: z ← concat(z, embed[y]) feeds the inner generator's
    (nz+embed_dim)-wide dense head.  Returns None when unsupported (caller
    falls back)."""
    from tpugan.models.cdcgan import CondGenerator

    if isinstance(g, CondGenerator):
        if y is None:
            return None
        try:
            e = params["embed"]["table"][jnp.asarray(y)]
            z = jnp.concatenate([z.astype(jnp.float32),
                                 e.astype(jnp.float32)], axis=-1)
            g, params, state = g.g, params["g"], state.get("g", {})
        except (KeyError, TypeError):
            return None  # malformed params: decline per the None contract
    try:
        (wh, ah, bh), blocks, (s0, c0) = fold_generator(g, params, state, eps)
    except (KeyError, AttributeError):
        return None
    for (w, _, _) in blocks:
        if w.shape[0] != 4 or w.shape[1] != 4:
            return None
    n = z.shape[0]
    bt = min(batch_tile, n)
    while bt > 1 and (_vmem_bytes2(bt, c0, blocks, s0) > _VMEM_BUDGET
                      or n % bt != 0):
        bt //= 2
    flat = []
    for (w, a, b) in blocks:
        flat += [w, a, b]
    return _call2(z, wh, ah, bh, tuple(flat), c0, s0, jnp.dtype(out_dtype),
                  bt)
