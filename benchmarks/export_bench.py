"""Deployment-path overhead: exported StableHLO artifact vs the live jit.

Answers "what does `tpugan export` cost at serving time?" — the artifact's
``Exported.call`` is traced back into jit, so steady-state throughput should
match the live generator to measurement noise.  Timed the tunnel-safe way
(k calls chained in one jitted fori_loop, scalar fetch, least-squares slope
over chain lengths).

Usage: python benchmarks/export_bench.py [--batch 1024] [--image-size 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--image-size", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpugan.configs import get_preset
    from tpugan.export import export_generator, load_generator
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    name = ("dcgan_celeba64" if args.image_size == 64
            else "cdcgan_celeba128")
    cfg = get_preset(name)
    if args.image_size == 128:
        cfg = cfg.override({"model.arch": "dcgan", "model.n_classes": "0"})
    g, d = build_models(cfg.model, "bf16")
    state = create_train_state(cfg, g, d)
    batch, nz = args.batch, cfg.model.nz

    t0 = time.perf_counter()
    blob = export_generator(cfg, g, state.params_g, state.state_g)
    log(f"export: {len(blob) / 1e6:.1f} MB artifact "
        f"in {time.perf_counter() - t0:.1f}s")
    exported = load_generator(blob)

    def live_fwd(z):
        img, _ = g.apply(state.params_g, state.state_g, z, train=False)
        return img.astype(jnp.float32)

    def measure(fwd, label):
        def chain(k):
            @jax.jit
            def run(key):
                def body(i, acc):
                    z = jax.random.normal(jax.random.fold_in(key, i),
                                          (batch, nz), jnp.float32)
                    return acc + jnp.sum(fwd(z))
                return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
            return run

        ks = (4, 10, 20)
        runs = {k: chain(k) for k in ks}
        key = jax.random.PRNGKey(0)
        for _ in range(2):
            for k in ks:
                float(runs[k](key))

        def timed(fn):
            t0 = time.perf_counter()
            float(fn(key))
            return time.perf_counter() - t0

        times = [min(timed(runs[k]) for _ in range(5)) for k in ks]
        slope = float(np.polyfit(np.asarray(ks, np.float64),
                                 np.asarray(times), 1)[0])
        log(f"{label}: {slope * 1e3:.3f} ms/iter = {batch / slope:,.0f} "
            "img/s")
        return batch / slope

    live = measure(live_fwd, "live jit")
    exp = measure(lambda z: exported._exported.call(z), "exported artifact")
    log(f"export overhead: {(live / exp - 1) * 100:+.1f}% "
        f"(negative = artifact faster)")


if __name__ == "__main__":
    main()
