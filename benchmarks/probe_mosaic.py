"""Probe which interleave formulations Mosaic (compiled Pallas TPU) accepts.

The phase-decomposed transpose conv must merge 4 phase tensors into the
interleaved output. Interpret mode accepts any jnp formulation; the real
Mosaic compiler rejects high-rank reshapes (observed: 4D->6D singleton
expansion fails with 'unsupported shape cast'). This probe tries each
candidate on tiny shapes and reports compile+run status:

  A. rank-6 stack+reshape
  B. strided store out[:, ::2]
  C. concat + (W,2C)->(2W,C) riffle reshape, rows via flatten trick

Measured verdicts on this v5e (fp32, C=128): A, B, C all COMPILE AND RUN.
The crashes that motivated this probe were elsewhere: integer-indexed 6-D
ref stores, bf16 strided stores, and bf16 high-rank relayouts (see
DESIGN.md §4 and the memory notes).

Usage: python benchmarks/probe_mosaic.py   (on the TPU)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, H, W, C = 8, 8, 8, 128


def ref_interleave(p00, p01, p10, p11):
    top = jnp.stack([p00, p01], axis=3)
    bot = jnp.stack([p10, p11], axis=3)
    full = jnp.stack([top, bot], axis=2)  # (BT,H,2,W,2,C)
    return full.reshape(BT, 2 * H, 2 * W, C)


def make_inputs():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.standard_normal((BT, H, W, C)).astype(np.float32))
            for _ in range(4)]




# --- A: rank-6 stack + reshape ----------------------------------------------
def kernel_a(a_ref, b_ref, c_ref, d_ref, o_ref):
    full = jnp.stack([jnp.stack([a_ref[...], b_ref[...]], axis=3),
                      jnp.stack([c_ref[...], d_ref[...]], axis=3)], axis=2)
    o_ref[...] = full.reshape(BT, 2 * H, 2 * W, C)


# --- B: strided stores ------------------------------------------------------
def kernel_b(a_ref, b_ref, c_ref, d_ref, o_ref):
    o_ref[:, 0::2, 0::2, :] = a_ref[...]
    o_ref[:, 0::2, 1::2, :] = b_ref[...]
    o_ref[:, 1::2, 0::2, :] = c_ref[...]
    o_ref[:, 1::2, 1::2, :] = d_ref[...]


# --- C: concat + riffle reshapes -------------------------------------------
def kernel_c(a_ref, b_ref, c_ref, d_ref, o_ref):
    def col_riffle(p, q):  # (BT,H,W,C) x2 -> (BT,H,2W,C)
        cat = jnp.concatenate([p, q], axis=-1)        # (BT,H,W,2C)
        return cat.reshape(BT, H, 2 * W, C)

    top = col_riffle(a_ref[...], b_ref[...])
    bot = col_riffle(c_ref[...], d_ref[...])
    t2 = top.reshape(BT, H, 2 * W * C)
    b2 = bot.reshape(BT, H, 2 * W * C)
    cat = jnp.concatenate([t2, b2], axis=-1)          # (BT,H,4WC)
    o_ref[...] = cat.reshape(BT, 2 * H, 2 * W, C)


def call4(kernel):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BT, 2 * H, 2 * W, C), jnp.float32),
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ps = make_inputs()
    for name, kern in [("A rank6-stack", kernel_a),
                       ("B strided-store", kernel_b),
                       ("C concat-riffle", kernel_c)]:
        fn = call4(kern)
        try:
            got = np.asarray(fn(*ps))
            ref = np.asarray(ref_interleave(*ps))
            print(f"{name}: OK, max err {np.abs(got-ref).max():.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
