"""Probe: can any XLA/libtpu flag lift the 64px generator chain?

DESIGN.md §4's roofline evidence says the residual gap to peak (~632k of a
~940k img/s speed-of-light at batch 1024) is XLA fusion-boundary
serialization, with no exposed scheduling knob.  This probe tests that
"no exposed knob" claim empirically: each candidate XLA_FLAGS set runs the
exact bench.py measurement (chained on-device fori_loop, multi-k LSQ
slope) in a fresh subprocess (flags are read once at backend init).

Unknown flags abort the child with a parse error — recorded as
"rejected", which is itself evidence the knob does not exist on this
toolchain.  Run on the chip:

    python benchmarks/probe_xla_flags.py [--batch 1024] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANDIDATES = [
    ("baseline", ""),
    # scheduling: latency-hiding scheduler is normally for collectives but
    # also reorders compute/copy overlap decisions
    ("lhs_on", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    # bigger scoped vmem sometimes changes fusion decisions
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    # flatten the fori_loop: turns the chain into straight-line code XLA
    # can software-pipeline across iterations (measures whether the
    # iteration boundary itself is a serialization point)
    ("unroll", "UNROLL"),  # handled in-child, not a flag
]

CHILD = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
import bench

mode = sys.argv[1]
batch = int(sys.argv[2])
steps = int(sys.argv[3])

if mode == "UNROLL":
    # same measurement as bench.bench_tpugan but with lax.fori_loop
    # replaced by a python-unrolled chain (XLA sees straight-line code)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    cfg = get_preset("dcgan_celeba64")
    g, d = build_models(cfg.model, "bf16")
    state = create_train_state(cfg, g, d)
    nz = cfg.model.nz

    def gen_chain(k):
        @jax.jit
        def run(params_g, state_g, key):
            acc = jnp.zeros((), jnp.float32)
            for i in range(k):
                z = jax.random.normal(jax.random.fold_in(key, i),
                                      (batch, nz), jnp.float32)
                img, _ = g.apply(params_g, state_g, z, train=False)
                acc = acc + jnp.sum(img.astype(jnp.float32))
            return acc
        return run

    ks = sorted({max(2, steps // 5), max(3, steps // 2), steps})
    runs = {k: gen_chain(k) for k in ks}
    key = jax.random.PRNGKey(0)
    a = state.params_g, state.state_g, key
    for _ in range(2):
        for k in ks:
            float(runs[k](*a))
    def timed(fn):
        t0 = time.perf_counter(); float(fn(*a))
        return time.perf_counter() - t0
    times = [min(timed(runs[k]) for _ in range(5)) for k in ks]
    per_iter = float(np.polyfit(np.array(ks, float), np.array(times), 1)[0])
    ips = batch / per_iter if per_iter > 0 else 0.0
else:
    ips = bench.bench_tpugan(64, batch, steps)
print(json.dumps({"ips": ips}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    results = {}
    for name, flags in CANDIDATES:
        env = dict(os.environ)
        mode = "FLAGS"
        if flags == "UNROLL":
            mode = "UNROLL"
        elif flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run(
            [sys.executable, "-c", CHILD.replace("__REPO__", REPO), mode,
             str(args.batch), str(args.steps)],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=REPO)
        if r.returncode != 0:
            results[name] = {"status": "rejected",
                             "tail": r.stderr.strip().splitlines()[-3:]}
            print(f"{name:12s} REJECTED", file=sys.stderr)
        else:
            ips = json.loads(r.stdout.strip().splitlines()[-1])["ips"]
            results[name] = {"status": "ok", "ips": round(ips, 1)}
            print(f"{name:12s} {ips:12.1f} img/s", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
