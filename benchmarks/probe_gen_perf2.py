"""Robust re-measurement of generator throughput + XLA cost analysis.

probe_gen_perf.py exposed ±2x run-to-run flukes in the two-point method on
this relay (identical computations measured 0.849 vs 1.624 ms/iter).  This
probe (a) fits the per-iteration slope by least squares over k in {8,24,48}
with min-of-5 per k — outlier-resistant, overhead cancels in the slope —
and (b) prints the compiled step's own cost_analysis FLOP count, which is
XLA's ground truth for the roofline denominator (hand FLOP counts disagree
with XLA's on input-dilated deconvs).

Run ON THE CHIP: python benchmarks/probe_gen_perf2.py
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
    batch = 1024

    def forward(pg, sg, z):
        img, _ = g.apply(pg, sg, z, train=False)
        return img  # bf16; checksum fuses into the tanh epilogue

    def chain(k):
        @jax.jit
        def run(pg, sg, key):
            def body(i, acc):
                z = jax.random.normal(jax.random.fold_in(key, i),
                                      (batch, nz), jnp.float32)
                return acc + jnp.sum(forward(pg, sg, z),
                                     dtype=jnp.float32)
            return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return run

    # XLA's own FLOP count for one iteration
    lowered = jax.jit(lambda pg, sg, z: jnp.sum(forward(pg, sg, z),
                                                dtype=jnp.float32)).lower(
        pg, sg, jnp.zeros((batch, nz), jnp.float32))
    cost = lowered.compile().cost_analysis()
    if cost:
        flops = cost.get("flops", float("nan"))
        log(f"XLA cost_analysis flops/iter: {flops:.3e} "
            f"({flops / batch / 1e6:.1f} MFLOP/img)")
        for key in ("bytes accessed", "utilization operand 0 {}"):
            if key in cost:
                log(f"  {key}: {cost[key]:.3e}")

    ks = (8, 24, 48)
    runs = {k: chain(k) for k in ks}
    key = jax.random.PRNGKey(0)
    for k in ks:  # compile + warm
        float(runs[k](pg, sg, key))

    times = {}
    for k in ks:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(runs[k](pg, sg, key))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
        log(f"k={k}: min {times[k]*1e3:.1f} ms  (all: "
            + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")")

    kv = np.array(ks, np.float64)
    tv = np.array([times[k] for k in ks])
    slope = np.polyfit(kv, tv, 1)[0]
    ips = batch / slope
    log(f"LSQ slope: {slope*1e3:.3f} ms/iter => {ips:.0f} img/s")
    if cost and cost.get("flops"):
        eff = cost["flops"] / slope / 1e12
        log(f"effective TFLOP/s by XLA's own count: {eff:.1f}")
    print("PROBE2_DONE")


if __name__ == "__main__":
    main()
