"""Round-5 directive #1: reconcile the judged @128 bench axis.

BENCH_r04 recorded 128,367 img/s @128 vs r03's 143,316 and BASELINE.md's
documented 139.9-154.3k noise band; the @64 axis also slid monotonically
over four rounds.  Nothing in the r4 diff touched the generator forward,
so this is either widened relay noise (fix: widen the documented band) or
a real regression (fix: bisect).  This probe re-measures both judged axes
N times each at the judged sweep's batch sizes using bench.py's own LSQ
estimator, and prints one JSON line per measurement so the spread itself
becomes the banked artifact (banked as docs/evidence/remeasure_r5_head.jsonl
for the current tree and remeasure_r5_r3tree.jsonl for the pristine
round-3 worktree control).

Usage: python benchmarks/remeasure_128.py [--repeats 5] [--steps 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
from bench import bench_tpugan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    print(f"# device: {jax.devices()}", file=sys.stderr, flush=True)

    plan = [(128, b) for b in (128, 256, 512)] + [(64, b) for b in (512, 1024)]
    for size, batch in plan:
        for rep in range(args.repeats):
            t0 = time.time()
            try:
                ips = bench_tpugan(size, batch, args.steps)
            except Exception as e:
                print(json.dumps({"size": size, "batch": batch, "rep": rep,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
                continue
            print(json.dumps({"size": size, "batch": batch, "rep": rep,
                              "images_per_sec": round(ips, 1),
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
