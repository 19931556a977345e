"""On-chip probe: where do the generator's microseconds go at 64x64?

VERDICT round-1 item 4: 654-665k img/s is ~68% of the ~940k bf16 roofline.
Hypotheses probed here (all timed with the fori_loop two-point method —
this relay's block_until_ready is a no-op):

  A. per-layer cost: bench the G truncated after each block — the final
     ConvT (ngf -> 3 channels) wastes 125/128 MXU lanes if XLA pads cout.
  B. lane-padded final layer: compute cout=8/16 and slice to 3 after.
  C. checksum overhead: fp32-cast + full-image jnp.sum per iteration.
  D. batch scaling 512..4096 (round 1 saw 2048 SLOWER than 1024).

Run ON THE CHIP: python benchmarks/probe_gen_perf.py
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

    cfg = get_preset("dcgan_celeba64")
    g, d = build_models(cfg.model, "bf16")
    state = create_train_state(cfg, g, d)
    nz = cfg.model.nz
    pg, sg = state.params_g, state.state_g

    def timed_chain(forward, batch, k_lo=4, k_hi=20):
        def chain(k):
            @jax.jit
            def run(pg, sg, key):
                def body(i, acc):
                    z = jax.random.normal(jax.random.fold_in(key, i),
                                          (batch, nz), jnp.float32)
                    out = forward(pg, sg, z)
                    return acc + jnp.sum(out).astype(jnp.float32)
                return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
            return run
        rlo, rhi = chain(k_lo), chain(k_hi)
        key = jax.random.PRNGKey(0)
        for _ in range(2):
            float(rlo(pg, sg, key)), float(rhi(pg, sg, key))
        def t(fn):
            t0 = time.perf_counter(); float(fn(pg, sg, key))
            return time.perf_counter() - t0
        tlo = min(t(rlo) for _ in range(3))
        thi = min(t(rhi) for _ in range(3))
        return (thi - tlo) / (k_hi - k_lo)

    batch = 1024

    # --- A: truncated generators --------------------------------------------
    def truncated(n_blocks, with_final):
        def fwd(pg, sg, z):
            x, _ = g.head.apply(pg["head"], sg.get("head", {}), z,
                                train=False)
            for i, blk in enumerate(g.blocks[:n_blocks]):
                x, _ = blk.apply(pg[f"block{i}"], sg.get(f"block{i}", {}),
                                 x, train=False)
            if with_final:
                x, _ = g.final.apply(pg["final"], {}, x, train=False)
            return x
        return fwd

    prev = 0.0
    for n in range(len(g.blocks) + 1):
        dt = timed_chain(truncated(n, False), batch)
        log(f"head+{n} blocks: {dt*1e3:.3f} ms/iter (+{(dt-prev)*1e3:.3f})")
        prev = dt
    dt_full = timed_chain(truncated(len(g.blocks), True), batch)
    log(f"full G (with final ConvT+tanh): {dt_full*1e3:.3f} ms/iter "
        f"(+{(dt_full-prev)*1e3:.3f})  => {batch/dt_full:.0f} img/s")

    # --- B: lane-padded final ConvT -----------------------------------------
    from tpugan import ops

    for pad_c in (8, 16, 32):
        def fwd_padded(pg, sg, z, pad_c=pad_c):
            x, _ = g.head.apply(pg["head"], sg.get("head", {}), z,
                                train=False)
            for i, blk in enumerate(g.blocks):
                x, _ = blk.apply(pg[f"block{i}"], sg.get(f"block{i}", {}),
                                 x, train=False)
            w = pg["final"]["conv"]["w"].astype(jnp.bfloat16)
            b = pg["final"]["conv"]["b"]
            wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad_c - 3)))
            bp = jnp.pad(b, (0, pad_c - 3))
            y = ops.conv_transpose2d(x.astype(jnp.bfloat16), wp,
                                     stride=2, padding=1)
            y = jnp.tanh(y + bp)
            return y[..., :3]
        dt = timed_chain(fwd_padded, batch)
        log(f"final ConvT padded to cout={pad_c}: {dt*1e3:.3f} ms/iter "
            f"=> {batch/dt:.0f} img/s")

    # --- C: checksum variants ------------------------------------------------
    def fwd_plain(pg, sg, z):
        img, _ = g.apply(pg, sg, z, train=False)
        return img  # bf16, no fp32 cast

    dt = timed_chain(fwd_plain, batch)
    log(f"bf16 checksum (no fp32 cast): {dt*1e3:.3f} ms/iter "
        f"=> {batch/dt:.0f} img/s")

    def fwd_corner(pg, sg, z):
        img, _ = g.apply(pg, sg, z, train=False)
        return img[:, ::16, ::16, :]  # reduce only a sample of pixels

    dt = timed_chain(fwd_corner, batch)
    log(f"subsampled checksum: {dt*1e3:.3f} ms/iter => {batch/dt:.0f} img/s")

    # --- D: batch sweep -------------------------------------------------------
    def fwd_f32(pg, sg, z):
        img, _ = g.apply(pg, sg, z, train=False)
        return img.astype(jnp.float32)

    for b in (512, 1024, 2048, 4096):
        try:
            dt = timed_chain(fwd_f32, b)
            log(f"batch {b}: {dt*1e3:.3f} ms/iter => {b/dt:.0f} img/s")
        except Exception as e:
            log(f"batch {b}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:100]}")

    print("PROBE_DONE")


if __name__ == "__main__":
    main()
