"""On-chip probe: phase-decomposed ConvT (pure XLA) vs the input-dilated
lowering for the full 64px generator.

ConvT(k4,s2,p1) splits by output parity: out[2i+a, 2j+b] is a stride-1
k2x2 conv of x with a fixed 2x2 subset of kernel taps —

    a=0: out[2i]   = x[i-1]·w[3] + x[i]·w[1]   (pad left)
    a=1: out[2i+1] = x[i]·w[2]   + x[i+1]·w[0] (pad right)

so the whole deconv is 4 dense k2 convs + a 2x2 spatial riffle.  Same
zero-free FLOPs; the question is whether XLA schedules this better than
its own lhs_dilation lowering (which probe2 measured at 58% of peak,
wedged between the 0.95 ms compute and 0.81 ms memory floors).

Run ON THE CHIP: python benchmarks/probe_gen_perf3.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import create_train_state
    from tpugan.ops.convs import DIMS

    cfg = get_preset("dcgan_celeba64")
    g, d = build_models(cfg.model, "bf16")
    state = create_train_state(cfg, g, d)
    nz = cfg.model.nz
    pg, sg = state.params_g, state.state_g
    batch = 1024

    def convt_phase(x, w):
        """ConvT(k4,s2,p1) as 4 k2-convs + riffle; w HWIO unflipped."""
        n, H, W, ci = x.shape
        co = w.shape[-1]
        # per-axis tap pairs: a=0 -> [w3, w1] pad (1,0); a=1 -> [w2, w0]
        # pad (0,1)
        outs = []
        for a, (h0, h1), ph in (((0), (3, 1), (1, 0)), ((1), (2, 0), (0, 1))):
            row = []
            for b, (w0_, w1_), pw in (((0), (3, 1), (1, 0)),
                                      ((1), (2, 0), (0, 1))):
                k = jnp.stack([
                    jnp.stack([w[h0, w0_], w[h0, w1_]]),
                    jnp.stack([w[h1, w0_], w[h1, w1_]]),
                ])  # (2, 2, ci, co)
                y = lax.conv_general_dilated(
                    x, k, window_strides=(1, 1), padding=[ph, pw],
                    dimension_numbers=DIMS)
                row.append(y)
            outs.append(row)
        # riffle: (N, H, 2, W, 2, C) -> (N, 2H, 2W, C)
        top = jnp.stack([outs[0][0], outs[0][1]], axis=3)   # (N,H,W,2,C)
        bot = jnp.stack([outs[1][0], outs[1][1]], axis=3)
        full = jnp.stack([top, bot], axis=2)                # (N,H,2,W,2,C)
        return full.reshape(n, 2 * H, 2 * W, co)

    # correctness vs the dilated lowering
    from tpugan.ops.convs import conv_transpose2d

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((4, 4, 16, 8)) * 0.1, jnp.float32)
    ref = conv_transpose2d(xt, wt, stride=2, padding=1)
    got = convt_phase(xt, wt)
    err = float(jnp.max(jnp.abs(ref - got)))
    log(f"phase-decomposed ConvT correctness: max err {err:.2e}")
    assert err < 1e-4

    # full generator with phase ConvTs (BN eval-folded + relu inline)
    def g_phase(pg, sg, z):
        x, _ = g.head.apply(pg["head"], sg.get("head", {}), z, train=False)
        for i, blk in enumerate(g.blocks):
            p = pg[f"block{i}"]
            st = sg.get(f"block{i}", {})
            y = convt_phase(x.astype(jnp.bfloat16),
                            p["conv"]["w"].astype(jnp.bfloat16))
            bn, bst = p["bn"], st["bn"]
            inv = lax.rsqrt(bst["var"] + 1e-5) * bn["scale"]
            x = jax.nn.relu((y.astype(jnp.float32) - bst["mean"]) * inv
                            + bn["bias"]).astype(jnp.bfloat16)
        w = pg["final"]["conv"]["w"].astype(jnp.bfloat16)
        y = convt_phase(x, w)
        return jnp.tanh(y.astype(jnp.float32)
                        + pg["final"]["conv"]["b"]).astype(jnp.bfloat16)

    def g_ref(pg, sg, z):
        img, _ = g.apply(pg, sg, z, train=False)
        return img

    # value check
    zz = jnp.asarray(rng.standard_normal((4, nz)), jnp.float32)
    e = float(jnp.max(jnp.abs(g_phase(pg, sg, zz).astype(jnp.float32)
                              - g_ref(pg, sg, zz).astype(jnp.float32))))
    log(f"full-G phase vs ref: max err {e:.2e}")

    def measure(forward, label):
        def chain(k):
            @jax.jit
            def run(pg, sg, key):
                def body(i, acc):
                    z = jax.random.normal(jax.random.fold_in(key, i),
                                          (batch, nz), jnp.float32)
                    return acc + jnp.sum(forward(pg, sg, z),
                                         dtype=jnp.float32)
                return lax.fori_loop(0, k, body,
                                     jnp.zeros((), jnp.float32))
            return run
        ks = (8, 24, 48)
        runs = {k: chain(k) for k in ks}
        key = jax.random.PRNGKey(0)
        for k in ks:
            float(runs[k](pg, sg, key))
        times = {}
        for k in ks:
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(runs[k](pg, sg, key))
                ts.append(time.perf_counter() - t0)
            times[k] = min(ts)
        slope = np.polyfit(np.array(ks, np.float64),
                           np.array([times[k] for k in ks]), 1)[0]
        log(f"{label}: {slope*1e3:.3f} ms/iter => {batch/slope:.0f} img/s")
        return batch / slope

    measure(g_ref, "reference (dilated lowering)")
    measure(g_phase, "phase-decomposed")
    print("PROBE3_DONE")


if __name__ == "__main__":
    main()
