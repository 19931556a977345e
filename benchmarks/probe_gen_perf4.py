"""Probe: does XLA interleave INDEPENDENT generator chains in one jit?

If the roofline residual (compute and HBM phases of adjacent fusions not
overlapping) were schedulable, two independent half-batch chains would let
the scheduler overlap one chain's HBM phase with the other's compute.
Measured on the v5e: 1x1024 625k / 2x512 645k / 4x256 613k img/s — all
inside relay noise.  XLA serializes independent chains too; the residual
is not reachable from the program level.  (BASELINE.md roofline section.)
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, numpy as np, jax.numpy as jnp
from jax import lax
from tpugan.configs import get_preset
from tpugan.models import build_models
from tpugan.train import create_train_state

cfg = get_preset("dcgan_celeba64")
g, d = build_models(cfg.model, "bf16")
state = create_train_state(cfg, g, d)
nz = cfg.model.nz

def fwd(z):
    img, _ = g.apply(state.params_g, state.state_g, z, train=False)
    return jnp.sum(img.astype(jnp.float32))

def make_chain(batch, splits):
    def run(params_unused, key, k):
        def body(i, acc):
            kz = jax.random.fold_in(key, i)
            if splits == 1:
                return acc + fwd(jax.random.normal(kz, (batch, nz), jnp.float32))
            tot = acc
            for s in range(splits):
                z = jax.random.normal(jax.random.fold_in(kz, s),
                                      (batch // splits, nz), jnp.float32)
                tot = tot + fwd(z)
            return tot
        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
    return run

def measure(batch, splits, label):
    ks = (4, 10, 20)
    runs = {k: jax.jit(lambda p, key, kk=k: make_chain(batch, splits)(p, key, kk))
            for k in ks}
    a = (None, jax.random.PRNGKey(0))
    for _ in range(2):
        for k in ks: float(runs[k](*a))
    def timed(fn):
        t0 = time.perf_counter(); float(fn(*a)); return time.perf_counter()-t0
    times = [min(timed(runs[k]) for _ in range(6)) for k in ks]
    slope = float(np.polyfit(np.array(ks,float), np.array(times),1)[0])
    print(f"{label}: {slope*1e3:.3f} ms/iter = {batch/slope:,.0f} img/s", flush=True)

measure(1024, 1, "1x1024 (baseline)")
measure(1024, 2, "2x512 interleaved")
measure(1024, 4, "4x256 interleaved")
