"""Cross-framework convergence parity: the offline stand-in for the
BASELINE "FID within 2% of reference" axis.

Trains every loss variant for --steps alternating steps in BOTH frameworks
from one transplanted init on identical data/noise/GP-alpha streams, then
reports per-step trajectory agreement and final proxy-FID of each side
through the same extractor.  Results are recorded in BASELINE.md.

Run on CPU (torch has no TPU here; the comparison is framework-vs-framework
numerics, not hardware):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/parity_convergence.py --steps 400
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PRESETS = ("dcgan_cifar10", "lsgan_cifar10", "wgan_cifar10",
           "wgan_gp_cifar10", "sngan_cifar10")


def window_stats(a: np.ndarray, b: np.ndarray, lo: int, hi: int):
    """Mean |a-b| and mean |a| over a step window (column 0 = loss_d)."""
    da = np.abs(a[lo:hi, 0] - b[lo:hi, 0])
    return float(da.mean()), float(np.abs(a[lo:hi, 0]).mean() + 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--fid-n", type=int, default=512)
    ap.add_argument("--presets", nargs="*", default=list(PRESETS))
    ap.add_argument("--noise-floor", action="store_true",
                    help="measure the torch twin's own seed-to-seed FID "
                         "variability instead of cross-framework parity")
    ap.add_argument("--n-seeds", type=int, default=4)
    ap.add_argument("--verdict", action="store_true",
                    help="cross-framework run + seed floors + the "
                         "parity_acceptance criterion, one JSON per preset")
    ap.add_argument("--stream-seeds", type=int, default=1,
                    help="independent cross-framework stream seeds for the "
                         "verdict (medians judged against the floors)")
    args = ap.parse_args()

    from tpugan.parity.runners import (
        parity_acceptance,
        run_convergence_parity,
        run_seed_noise_floor,
    )

    if args.verdict:
        # Full quantitative criterion per preset: cross-framework runs over
        # --stream-seeds independent streams + seed floors (FID spread,
        # seed-to-seed cross-FID, weight distance) + the parity_acceptance
        # rule.  This is the BASELINE.md table row.
        for preset in args.presets:
            finals = []
            for ss in range(args.stream_seeds):
                r = run_convergence_parity(preset, args.steps,
                                           batch_size=args.batch,
                                           width=args.width, nz=32,
                                           fid_n=args.fid_n,
                                           stream_seed=ss)
                finals.append(r["final"])
                print(json.dumps({"preset": preset, "stream_seed": ss,
                                  **r["final"]}), flush=True)
            floor = run_seed_noise_floor(preset, args.steps,
                                         batch_size=args.batch,
                                         width=args.width, nz=32,
                                         fid_n=args.fid_n,
                                         n_seeds=args.n_seeds)
            verdict = parity_acceptance(finals, floor)
            print(json.dumps({"preset": preset, "steps": args.steps,
                              **{k: floor[k] for k in
                                 ("noise_floor_rel", "cross_fid_floor",
                                  "cross_fid_floor_median",
                                  "weight_dist_floor",
                                  "weight_dist_floor_median")},
                              **verdict}), flush=True)
        return

    if args.noise_floor:
        for preset in args.presets:
            row = run_seed_noise_floor(preset, args.steps,
                                       batch_size=args.batch,
                                       width=args.width, nz=32,
                                       fid_n=args.fid_n,
                                       n_seeds=args.n_seeds)
            print(json.dumps(row), flush=True)
        return

    rows = []
    for preset in args.presets:
        r = run_convergence_parity(preset, args.steps,
                                   batch_size=args.batch, width=args.width,
                                   nz=32, fid_n=args.fid_n)
        lj, lt = r["losses_tpugan"], r["losses_torch"]
        w = args.steps
        d30, m30 = window_stats(lj, lt, 0, 30)
        dmid, mmid = window_stats(lj, lt, w // 2 - 15, w // 2 + 15)
        dend, mend = window_stats(lj, lt, w - 30, w)
        row = {
            "preset": preset, "steps": w,
            "traj_rel_0_30": d30 / m30,
            "traj_rel_mid": dmid / mmid,
            "traj_rel_end": dend / mend,
            **r["final"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| preset | steps | traj rel-err (0-30) | mid | end | "
          "proxy-FID tpugan | proxy-FID torch | rel Δ | cross-FID |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['preset']} | {r['steps']} | {r['traj_rel_0_30']:.2e} | "
              f"{r['traj_rel_mid']:.2e} | {r['traj_rel_end']:.2e} | "
              f"{r['fid_tpugan']:.4f} | {r['fid_torch']:.4f} | "
              f"{r['rel_delta']:.2%} | {r['fid_cross']:.2e} |")


if __name__ == "__main__":
    main()
