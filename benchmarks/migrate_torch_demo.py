"""End-to-end migration demonstration: a TRAINED reference model moves to
tpugan and keeps training.

The import round-trip tests (tests/test_torch_import.py) prove the layout
maps are exact; this script proves the migration *story* on the asset a
gan-playground user actually owns — a partially-trained model (SURVEY §3.5
checkpoint contract):

1. train the reference-idiom torch twin with the reference's alternating
   loop for --torch-steps (the "user's existing run");
2. ``torch.save`` its G/D state_dicts exactly as the reference scripts do;
3. ``tpugan import-torch`` the .pth into a tpugan checkpoint;
4. verify the imported generator IS the torch one (same proxy-FID vs the
   same reals, near-zero cross-FID between the two fake sets);
5. ``train.resume`` from the imported checkpoint and fine-tune for
   --finetune-steps — the banked evidence is that FID keeps improving
   from the imported level (fresh optimizer state warms up, BN running
   stats carried over).

Writes one JSON line (also to --out) with the four FID waypoints.

Usage: python benchmarks/migrate_torch_demo.py [--preset dcgan_cifar10]
           [--torch-steps 600] [--finetune-steps 3000]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dcgan_cifar10")
    ap.add_argument("--torch-steps", type=int, default=600)
    ap.add_argument("--finetune-steps", type=int, default=3000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import torch

    from tpugan.ckpt import CheckpointManager
    from tpugan.cli import main as cli_main
    from tpugan.configs import get_preset
    from tpugan.eval import evaluate
    from tpugan.models import build_models
    from tpugan.parity.runners import (
        build_torch_twins,
        compare_final_generators,
        make_streams,
        parity_cfg,
        run_torch,
    )
    from tpugan.train import Trainer, TrainState, create_train_state

    # parity_cfg = the CPU-speed shrink whose twin/loop equivalence the
    # parity suite has already certified; the demo rides that certainty.
    cfg = parity_cfg(get_preset(args.preset))
    tmp = tempfile.mkdtemp(prefix="migrate_demo_")

    # -- 1. the user's reference training run (torch, alternating loop) --
    g, d = build_models(cfg.model, cfg.train.precision)
    state0 = create_train_state(cfg, g, d)
    tg, td = build_torch_twins(cfg, state0)
    streams, real = make_streams(cfg, args.torch_steps, seed=1)
    log(f"[migrate] training the torch twin for {args.torch_steps} steps "
        "(the reference loop) ...")
    t0 = time.time()
    run_torch(cfg, tg, td, streams)
    torch_wall = time.time() - t0

    r_init = evaluate(cfg, g, state0.params_g, state0.state_g,
                      real_images=real)

    # -- 2. the .pth exactly as the reference's scripts save it --
    pth = _os.path.join(tmp, "reference.pth")
    torch.save({"G": tg.state_dict(), "D": td.state_dict(),
                "step": args.torch_steps}, pth)

    # -- 3. tpugan import-torch (the public CLI) --
    ckpt_dir = _os.path.join(tmp, "imported_ckpt")
    sets = [s for kv in (
        ("model.ngf", cfg.model.ngf), ("model.ndf", cfg.model.ndf),
        ("model.nz", cfg.model.nz), ("data.batch_size", cfg.data.batch_size),
        ("data.dataset", "synthetic"),
        ("data.synthetic_size", cfg.data.synthetic_size),
        ("data.hflip", False), ("train.precision", "fp32"),
        ("train.ema", 0.0), ("train.fused_prop", False),
    ) for s in ("--set", f"{kv[0]}={kv[1]}")]
    cli_main(["import-torch", args.preset, *sets, "--ckpt", pth,
              "--out", ckpt_dir])

    # -- 4. the imported generator IS the trained torch one --
    template = create_train_state(cfg, g, d)
    mgr = CheckpointManager(ckpt_dir)
    state_imp = TrainState(**mgr.restore(dict(template)))
    mgr.close()
    cmp = compare_final_generators(cfg, g, state_imp, tg, real)
    log(f"[migrate] imported vs torch: fid {cmp['fid_tpugan']:.4f} vs "
        f"{cmp['fid_torch']:.4f} (cross {cmp['fid_cross']:.2e}, "
        f"rel-delta {cmp['rel_delta']:.2%})")

    # -- 5. fine-tune from the imported checkpoint --
    total = args.torch_steps + args.finetune_steps
    cfg_ft = cfg.override({
        "train.resume": ckpt_dir, "train.total_steps": total,
        "train.steps_per_call": 25, "train.log_every": max(total // 4, 1),
        "train.sample_every": 0, "train.ckpt_every": 0, "train.eval_every": 0,
        "data.device_resident": True})
    cfg_ft = dataclasses.replace(cfg_ft, train=dataclasses.replace(
        cfg_ft.train, ckpt_dir=_os.path.join(tmp, "ft_ckpt"),
        out_dir=_os.path.join(tmp, "ft_out")))
    trainer = Trainer(cfg_ft)
    t0 = time.time()
    trainer.train()
    ft_wall = time.time() - t0
    r_final = evaluate(cfg_ft, trainer.g, trainer._gen_params(),
                       trainer.state.state_g, real_images=real)

    result = {
        "preset": args.preset,
        "torch_steps": args.torch_steps,
        "finetune_steps": args.finetune_steps,
        "fid_init": round(float(r_init["fid"]), 5),
        "fid_torch_trained": round(cmp["fid_torch"], 5),
        "fid_imported": round(cmp["fid_tpugan"], 5),
        "fid_cross_imported": float(f"{cmp['fid_cross']:.3e}"),
        "rel_delta_imported": round(cmp["rel_delta"], 5),
        "fid_after_finetune": round(float(r_final["fid"]), 5),
        "torch_wall_s": round(torch_wall, 1),
        "finetune_wall_s": round(ft_wall, 1),
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
