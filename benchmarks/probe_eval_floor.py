"""Proxy-FID noise floor per image size: real-vs-real on disjoint halves.

Round-5 root-cause control for the "cdcgan_celeba64 lags" question
(VERDICT r4 weak #4): the sweep compares proxy-FID *values* across image
sizes, but the proxy extractor pools its final conv at NATIVE resolution
(2×2 spatial at 32px, 4×4 at 64px, 8×8 at 128px — eval/features.py), so
the FID scale is a different yardstick at each size.  The honest
cross-size measure is each config's banked best RELATIVE to the floor a
*perfect* generator would score under the same protocol: the FID between
two disjoint halves of the real set at the protocol's sample count.

Prints one JSON line per (image_size, n) with the real-vs-real floor,
median over ``--repeats`` disjoint splits.

Usage: python benchmarks/probe_eval_floor.py [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from tpugan.data.datasets import make_synthetic
    from tpugan.eval.features import make_extractor
    from tpugan.eval.fid import fid_from_features

    extractor = make_extractor(3, "proxy")
    # (size, n-per-side): n matches the protocols the sweep (512) and the
    # 40k/flagship runs (1024) actually evaluated with
    for size in (32, 64, 128):
        # the training sets' own distribution: seed 0, n_classes=2 like the
        # celeba presets (class count changes the mixture, not the floor's
        # order of magnitude — verified by the n_classes=10 cifar rows)
        data = make_synthetic(size, 3, 16384, seed=0, n_classes=2)
        x = data["images"].astype(np.float32) / 127.5 - 1.0
        feats, _ = extractor(x, batch=256)
        for n in (512, 1024):
            fids = []
            rng = np.random.default_rng(7)
            for _ in range(args.repeats):
                idx = rng.permutation(len(feats))
                a, b = feats[idx[:n]], feats[idx[n:2 * n]]
                fids.append(fid_from_features(a, b))
            print(json.dumps({"image_size": size, "n_per_side": n,
                              "repeats": args.repeats,
                              "fid_floor_median": round(
                                  float(np.median(fids)), 5),
                              "fid_floor_all": [round(float(f), 5)
                                                for f in fids]}),
                  flush=True)


if __name__ == "__main__":
    main()
