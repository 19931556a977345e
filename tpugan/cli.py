"""Command-line entry points: train / sample / eval / presets.

The reference exposes per-variant ``main_*.py`` scripts with argparse flags;
here one CLI covers every variant through named presets plus dotted-path
overrides (the same flags surface: dataset, batch size, lr, nz/ngf/ndf,
n_critic, lambda_gp, image size, output dir, resume, seed, ...).

Examples
--------
  python -m tpugan.cli presets
  python -m tpugan.cli train dcgan_mnist --set data.dataset=synthetic \\
      --set train.total_steps=200 --out runs/mnist
  python -m tpugan.cli sample --ckpt runs/mnist/ckpt --n 64 --seed 7 \\
      --out samples.png
  python -m tpugan.cli eval --ckpt runs/mnist/ckpt --fid-n 2048
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def _parse_sets(pairs):
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def _load_cfg_for_ckpt(ckpt_dir: str):
    from tpugan.configs import Config

    cfg_path = os.path.join(ckpt_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(f"no config.json in {ckpt_dir!r}; pass --preset")
    with open(cfg_path) as f:
        return Config.from_dict(json.load(f))


def cmd_presets(args):
    from tpugan.configs import get_preset, list_presets

    for name in list_presets():
        cfg = get_preset(name)
        print(f"{name:20s} {cfg.model.arch:7s} {cfg.model.image_size}px "
              f"{cfg.loss.kind:8s} dataset={cfg.data.dataset}")


def cmd_train(args):
    from tpugan.configs import get_preset
    from tpugan.train import Trainer

    cfg = get_preset(args.preset).override(_parse_sets(args.set))
    if args.out:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, out_dir=args.out,
            ckpt_dir=os.path.join(args.out, "ckpt")))
    if args.resume:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, resume=args.resume))
    print(cfg.to_json())
    mesh = None
    if cfg.train.mesh_shape and not (cfg.train.fsdp_shards
                                     or cfg.train.spatial_shards):
        # plain DP mesh; with fsdp_shards/spatial_shards set the Trainer
        # builds the 2-D mesh itself from mesh_shape x that axis
        from tpugan.parallel import make_mesh

        mesh = make_mesh(cfg.train.mesh_shape)
    metrics = Trainer(cfg, mesh=mesh).train()
    print(json.dumps({"final": metrics}))


def _load_generator_from_ckpt(ckpt_dir: str):
    """(cfg, g, params, state_g, step) from a checkpoint directory, picking
    EMA weights when the run tracked them."""
    from tpugan.ckpt import CheckpointManager
    from tpugan.models import build_models
    from tpugan.train import TrainState, create_train_state

    cfg = _load_cfg_for_ckpt(ckpt_dir)
    g, d = build_models(cfg.model, cfg.train.precision)
    template = create_train_state(cfg, g, d)
    state = TrainState(**CheckpointManager(ckpt_dir).restore(dict(template)))
    params = (state.params_g_ema if state.params_g_ema is not None
              else state.params_g)
    return cfg, g, params, state.state_g, int(state.step)


def cmd_sample(args):
    from tpugan.sample import Sampler
    from tpugan.utils import make_grid, save_png, to_uint8

    cfg, g, params, state_g, step = _load_generator_from_ckpt(args.ckpt)
    sampler = Sampler(cfg, g, params, state_g)
    imgs = sampler.sample(args.n, seed=args.seed,
                          batch_size=args.batch_size or args.n)
    if args.outdir:
        # one PNG per image (the two-folder eval workflow: sample --outdir
        # then `tpugan fid <outdir> <real dir>`)
        os.makedirs(args.outdir, exist_ok=True)
        u8 = to_uint8(imgs)
        for i in range(len(u8)):
            save_png(os.path.join(args.outdir, f"sample_{i:06d}.png"), u8[i])
        print(f"wrote {len(u8)} images (seed {args.seed}, step {step}) "
              f"-> {args.outdir}")
        return
    grid = make_grid(to_uint8(imgs), nrow=args.nrow)
    save_png(args.out, grid)
    print(f"wrote {args.out} ({args.n} images, seed {args.seed}, "
          f"step {step})")


def cmd_eval(args):
    from tpugan.eval import evaluate

    cfg, g, params, state_g, _ = _load_generator_from_ckpt(args.ckpt)
    if args.fid_n:
        cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
            cfg.eval, fid_n=args.fid_n))
    result = evaluate(cfg, g, params, state_g, seed=args.seed)
    print(json.dumps(result))


def cmd_export(args):
    from tpugan.export import save_generator

    cfg, g, params, state_g, step = _load_generator_from_ckpt(args.ckpt)
    platforms = tuple(
        p.strip() for p in args.platforms.split(",") if p.strip())
    save_generator(args.out, cfg, g, params, state_g,
                   batch=args.batch or None, platforms=platforms)
    size = os.path.getsize(args.out)
    print(f"exported step-{step} generator -> {args.out} "
          f"({size / 1e6:.2f} MB, platforms={','.join(platforms)}, "
          f"batch={'symbolic' if not args.batch else args.batch})")


def cmd_serve(args):
    from tpugan.serve import BatchingEngine, serve_forever

    if args.model:
        if args.shards:
            raise SystemExit(
                "--shards needs --ckpt (a serialized artifact is lowered "
                "for one device; mesh serving re-jits with shardings)")
        from tpugan.export import load_generator

        gen = load_generator(args.model)
    else:
        if not args.ckpt:
            raise SystemExit("serve needs --model or --ckpt")
        cfg, g, params, state_g, _ = _load_generator_from_ckpt(args.ckpt)
        if args.shards:
            # One endpoint over a multi-chip mesh: weights replicated,
            # request batches sharded over ('data',).
            from tpugan.parallel import ShardedSampler, make_mesh

            gen = ShardedSampler(cfg, g, params, state_g,
                                 make_mesh(args.shards))
        else:
            # Serve straight from a checkpoint: export in-memory (weights
            # baked in) so the serving path is identical either way.
            from tpugan.export import export_generator, load_generator

            gen = load_generator(export_generator(cfg, g, params, state_g))
    engine = BatchingEngine(gen, max_batch=args.max_batch,
                            linger_ms=args.linger_ms,
                            queue_depth=args.queue_depth,
                            request_timeout_s=args.request_timeout_s)
    serve_forever(engine, host=args.host, port=args.port)


def cmd_profile(args):
    """One-stop train-step performance probe for a preset: compiled-cost
    FLOPs/bytes (XLA's own analysis), measured ms/step, achieved TFLOP/s
    and images/sec — plus an optional XProf trace.  The discoverable CLI
    face of utils/profiling.py (the roofline evidence path in BASELINE.md).

    Note: ms_per_step is wall-clock per *dispatch* — on a remote/tunneled
    backend it includes the fixed per-call relay overhead.  For
    overhead-cancelled device numbers use bench.py (chained on-device
    fori_loop + least-squares slope).
    """
    import numpy as np

    import jax.numpy as jnp

    from tpugan.configs import get_preset
    from tpugan.models import build_models
    from tpugan.train import build_train_step, create_train_state
    from tpugan.utils.profiling import cost_analysis, timeit, trace

    cfg = get_preset(args.preset).override(_parse_sets(args.set))
    cfg = cfg.override({"data.dataset": "synthetic",
                        "train.donate": False,  # reuse args across timings
                        "train.steps_per_call": 1})
    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    s, c = cfg.model.image_size, cfg.model.channels
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.integers(
        0, 256, size=(cfg.data.batch_size, s, s, c)).astype(np.uint8))}
    if cfg.model.arch == "cdcgan":
        batch["label"] = jnp.asarray(rng.integers(
            0, max(cfg.model.n_classes, 1),
            size=(cfg.data.batch_size,)).astype(np.int32))

    costs = cost_analysis(lambda st, b: step(st, b), state, batch)
    sec = timeit(lambda: step(state, batch), iters=args.iters, warmup=2)
    flops = costs.get("flops", 0.0)
    out = {
        "preset": args.preset,
        "batch": cfg.data.batch_size,
        "precision": cfg.train.precision,
        "flops_per_step": flops,
        "bytes_accessed": costs.get("bytes accessed", 0.0),
        "ms_per_step": round(sec * 1e3, 4),
        "achieved_tflops": round(flops / sec / 1e12, 4) if sec else 0.0,
        "images_per_sec": round(cfg.data.batch_size / sec, 1) if sec else 0.0,
    }
    if args.trace:
        with trace(args.trace):
            for _ in range(3):
                step(state, batch)
        out["trace_dir"] = args.trace
    print(json.dumps(out))


def cmd_convert_inception(args):
    """Torch FID-InceptionV3 state_dict -> our weight pickle.

    Run wherever the pytorch-fid checkpoint exists (this container has no
    network); ship the pickle here and set eval.inception_weights to it —
    the JAX network is numerically cross-validated against a torch twin
    (tests/test_inception_parity.py), so converted weights reproduce
    pytorch-fid's pool3 features to float precision.
    """
    import pickle

    import numpy as np
    import torch

    from tpugan.eval.inception import convert_torch_state_dict

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    out = convert_torch_state_dict(sd)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    n_arrays = sum(len(v) for v in out.values())
    print(f"converted {n_arrays} arrays -> {args.out}; set "
          f"eval.inception_weights={args.out!r} for exact FID")


def cmd_import_torch(args):
    """Reference-style torch .pth checkpoint(s) -> a tpugan checkpoint.

    Completes the migration story the way convert-inception did for the
    FID network: a gan-playground user's trained G/D state_dicts become a
    restorable tpugan checkpoint (weights + BN stats + SN u).  Optimizer
    moments are restored warm ONLY from tpugan's own exports (the
    tpugan_export marker pins the param order + update rule + format
    version); foreign .pth moments stay un-imported by design — see
    ckpt/torch_import.py.
    """
    import torch

    from tpugan.ckpt import CheckpointManager
    from tpugan.ckpt.torch_import import (
        extract_export_meta,
        import_optimizer_state,
        import_torch_state,
        split_reference_checkpoint,
    )
    from tpugan.configs import get_preset

    def load(path):
        try:
            return torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # older .pth files pickle plain python containers around the
            # tensors; fall back for those
            return torch.load(path, map_location="cpu", weights_only=False)

    cfg = get_preset(args.preset).override(_parse_sets(args.set))
    g_sd = d_sd = None
    meta = opt_g_sd = opt_d_sd = None
    is_ema = False
    step = args.step
    if args.ckpt:
        obj = load(args.ckpt)
        g_sd, d_sd, found = split_reference_checkpoint(obj)
        meta, opt_g_sd, opt_d_sd = extract_export_meta(obj)
        # Provenance flag, not truthiness: foreign repos sometimes store an
        # EMA *state_dict* under 'ema' — a non-empty dict must not flag the
        # imported 'G' weights (which stay raw) as EMA.
        ema_entry = obj.get("ema") if isinstance(obj, dict) else None
        is_ema = ema_entry is True
        if isinstance(ema_entry, dict):
            print("note: checkpoint holds a dict under 'ema' (foreign EMA "
                  "weights?) — not imported; pass that state_dict via --g "
                  "to import it as the generator")
        step = step or found
    if args.g:
        g_sd, _, found = split_reference_checkpoint(load(args.g))
        if g_sd is None:
            raise SystemExit(f"{args.g} does not look like a generator "
                             "state_dict")
        step = step or found  # a full checkpoint passed via --g keeps its step
        opt_g_sd = None  # --ckpt's G moments don't belong to --g's weights
        is_ema = False  # ...nor does --ckpt's EMA provenance flag
    if args.d:
        _, d_sd, found = split_reference_checkpoint(load(args.d))
        if d_sd is None:
            raise SystemExit(f"{args.d} does not look like a discriminator "
                             "state_dict")
        step = step or found
        opt_d_sd = None  # --ckpt's D moments don't belong to --d's weights
    if g_sd is None and d_sd is None:
        raise SystemExit("nothing to import: pass --ckpt and/or --g/--d")

    state = import_torch_state(cfg, g_sd, d_sd, step=step)

    # Optimizer state: trusted ONLY from tpugan's own exports (the
    # tpugan_export marker pins the param order + update rule); foreign
    # .pth moments stay un-imported by design (ckpt/torch_import.py).
    from tpugan.ckpt.torch_export import EXPORT_VERSION

    opt_note = "optimizer state fresh by design"
    if meta and (opt_g_sd is not None or opt_d_sd is not None):
        if meta.get("version") != EXPORT_VERSION:
            opt_note = (f"optimizer state fresh: checkpoint export format "
                        f"v{meta.get('version')} != this build's "
                        f"v{EXPORT_VERSION} — moment layout not trusted")
        elif meta.get("optimizer") == cfg.optim.optimizer:
            state = import_optimizer_state(cfg, state, opt_g_sd, opt_d_sd)
            warm = [n for n, s in (("G", opt_g_sd), ("D", opt_d_sd))
                    if s is not None]
            opt_note = (f"optimizer moments restored warm for "
                        f"{'+'.join(warm)} (tpugan-exported checkpoint)")
        else:
            opt_note = (f"optimizer state fresh: checkpoint was exported "
                        f"under {meta.get('optimizer')!r} but this preset "
                        f"uses {cfg.optim.optimizer!r}")
    if is_ema:
        both = state.params_g_ema is not None
        print("note: checkpoint marks its G weights as EMA — imported as "
              + ("both the raw and the EMA generator weights" if both else
                 "the raw generator weights (train.ema=0 for this preset; "
                 "set train.ema>0 to track an EMA slot)"))

    ckpt = CheckpointManager(args.out)
    ckpt.save(int(state.step), state, cfg.to_json())
    ckpt.close()
    got = [n for n, s in (("G", g_sd), ("D", d_sd)) if s is not None]
    print(f"imported {'+'.join(got)} into {args.out} at step "
          f"{int(state.step)} ({opt_note}; BN stats "
          f"and SN u vectors carried over) — usable via tpugan "
          f"sample/eval/export --ckpt, or train --resume to fine-tune")


def cmd_fid(args):
    """FID/KID between two image folders (pytorch-fid's two-path usage)."""
    from tpugan.eval import evaluate_folders

    result = evaluate_folders(
        args.path_a, args.path_b, image_size=args.image_size,
        channels=args.channels, metric=args.metric,
        inception_weights=args.inception_weights, n=args.n,
        batch=args.batch, prdc=args.prdc)
    print(json.dumps(result))


def cmd_export_torch(args):
    """tpugan checkpoint -> reference-style torch .pth (the inverse of
    import-torch, completing the migration story in both directions: a
    model trained or fine-tuned here goes back to any torch DCGAN-family
    codebase with BN stats and SN u buffers intact)."""
    import torch

    from tpugan.ckpt import CheckpointManager
    from tpugan.ckpt.torch_export import export_torch_checkpoint
    from tpugan.models import build_models
    from tpugan.train import TrainState, create_train_state

    cfg = _load_cfg_for_ckpt(args.ckpt)
    g, d = build_models(cfg.model, cfg.train.precision)
    template = create_train_state(cfg, g, d)
    state = TrainState(**CheckpointManager(args.ckpt).restore(
        dict(template), step=args.step or None))
    out = export_torch_checkpoint(cfg, state, use_ema=args.ema)
    torch.save(out, args.out)
    size = os.path.getsize(args.out)
    opts = "+".join(k[len("opt_"):] for k in ("opt_G", "opt_D") if k in out)
    print(f"exported step-{out['step']} G+D -> {args.out} "
          f"({size / 1e6:.2f} MB, {'EMA' if args.ema else 'raw'} generator "
          f"weights — self-described via the 'ema' key; BN stats and SN u "
          f"carried; {cfg.optim.optimizer} moments for {opts} in torch-"
          f"native format, restored warm by tpugan import-torch)")


def cmd_bench(args):
    # Delegate to the repo-root benchmark (kept as its own script so the
    # driver can run it headless); this subcommand is the discoverable path.
    import runpy
    import sys as _sys

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    if not os.path.exists(bench):
        raise SystemExit("bench.py not found (source checkout only)")
    _sys.argv = [bench] + (args.rest or [])
    runpy.run_path(bench, run_name="__main__")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpugan")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("presets", help="list named configs")

    p = sub.add_parser("train", help="train a preset")
    p.add_argument("preset")
    p.add_argument("--set", action="append", metavar="key=value",
                   help="dotted config override, e.g. train.total_steps=100")
    p.add_argument("--out", default="", help="output dir (also ckpt dir)")
    p.add_argument("--resume", default="", help="checkpoint dir to resume")

    p = sub.add_parser("sample", help="generate a seeded sample grid")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nrow", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--outdir", default="",
                   help="write n individual PNGs here instead of one grid "
                        "(pairs with `tpugan fid`)")

    p = sub.add_parser("eval", help="FID/IS evaluation")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fid-n", type=int, default=0)

    p = sub.add_parser("export",
                       help="export a deployable generator artifact")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="generator.tpugan")
    p.add_argument("--batch", type=int, default=0,
                   help="fixed batch size (default: symbolic, any size)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")

    p = sub.add_parser("serve", help="HTTP sampling server (micro-batched)")
    p.add_argument("--model", default="", help=".tpugan artifact to serve")
    p.add_argument("--ckpt", default="", help="...or a checkpoint dir")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--linger-ms", type=float, default=2.0)
    p.add_argument("--queue-depth", type=int, default=256,
                   help="pending-request cap; overflow sheds with 503")
    p.add_argument("--request-timeout-s", type=float, default=120.0)
    p.add_argument("--shards", type=int, default=0,
                   help="serve one endpoint over an N-chip data mesh "
                        "(requires --ckpt)")

    sub.add_parser("bench", help="north-star throughput benchmark "
                   "(flags pass through to bench.py, e.g. --quick)")

    p = sub.add_parser("profile", help="train-step cost/rate probe "
                       "(XLA cost analysis + measured ms/step)")
    p.add_argument("preset")
    p.add_argument("--set", action="append", metavar="key=value")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", default="", help="also capture an XProf "
                   "trace into this directory")

    p = sub.add_parser(
        "convert-inception",
        help="convert a pytorch-fid InceptionV3 state_dict (.pth) to the "
             "weight file eval.inception_weights expects (exact-FID path)")
    p.add_argument("--src", required=True,
                   help="torch state_dict file (torch.save'd)")
    p.add_argument("--out", default="inception_fid.pkl")

    p = sub.add_parser(
        "import-torch",
        help="convert a reference-style torch .pth (G/D state_dicts) into "
             "a tpugan checkpoint (the migration path for trained models)")
    p.add_argument("preset", help="architecture the weights belong to "
                   "(e.g. dcgan_cifar10, cdcgan_celeba64)")
    p.add_argument("--set", action="append", metavar="key=value",
                   help="dotted config override (match nz/ngf/ndf if "
                   "the run changed them)")
    p.add_argument("--ckpt", default="",
                   help=".pth holding both nets (keys like G/D/netG/netD)")
    p.add_argument("--g", default="", help=".pth of the generator alone")
    p.add_argument("--d", default="", help=".pth of the discriminator alone")
    p.add_argument("--step", type=int, default=0,
                   help="step number to stamp on the checkpoint")
    p.add_argument("--out", required=True, help="tpugan checkpoint dir")

    p = sub.add_parser(
        "fid",
        help="FID/KID between two image folders (the pytorch-fid two-path "
             "workflow; generator-free)")
    p.add_argument("path_a")
    p.add_argument("path_b")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--metric", default="proxy",
                   choices=["proxy", "inception"])
    p.add_argument("--inception-weights", default="",
                   help="weight pickle from `tpugan convert-inception` "
                        "(required for --metric inception)")
    p.add_argument("--n", type=int, default=0,
                   help="cap images per folder (default: all)")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--prdc", action="store_true",
                   help="also report precision/recall/density/coverage")

    p = sub.add_parser(
        "export-torch",
        help="convert a tpugan checkpoint into a reference-style torch "
             ".pth (G/D state_dicts; the inverse of import-torch)")
    p.add_argument("--ckpt", required=True, help="tpugan checkpoint dir")
    p.add_argument("--out", default="model.pth", help="output .pth path")
    p.add_argument("--step", type=int, default=0,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA generator weights instead of raw")

    # bench forwards unknown flags to bench.py; other commands reject them
    args, extra = ap.parse_known_args(argv)
    if args.cmd != "bench" and extra:
        ap.error(f"unrecognized arguments: {' '.join(extra)}")
    args.rest = extra
    {"presets": cmd_presets, "train": cmd_train, "sample": cmd_sample,
     "eval": cmd_eval, "export": cmd_export, "serve": cmd_serve,
     "bench": cmd_bench, "profile": cmd_profile,
     "convert-inception": cmd_convert_inception,
     "import-torch": cmd_import_torch,
     "export-torch": cmd_export_torch, "fid": cmd_fid}[args.cmd](args)


if __name__ == "__main__":
    main()
