"""Cross-framework convergence-parity runners.

The offline stand-in for the BASELINE "FID within 2% of reference" axis
(reference mount empty; see SURVEY.md provenance note): run the *same*
training — identical initial weights (transplant), identical real-data
stream, identical z noise, identical GP interpolation coefficients — in
both the tpugan (JAX/TPU) build and the torch twin (the reference's
framework, bare ``torch.nn``), for any of the five loss kinds, then compare

- per-step loss trajectories (tight over an early window; GAN training is
  chaotic, so bit-level agreement decays exponentially with steps), and
- the final generators statistically: proxy-FID of each against the same
  real set through one shared feature extractor, plus the cross-FID
  between the two fakes.

Used by tests/test_parity_torch.py (short windows, default suite) and
benchmarks/parity_convergence.py (hundreds of steps; results recorded in
BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from tpugan.configs import Config


def parity_cfg(preset_cfg: Config, *, batch_size: int = 32, width: int = 32,
               nz: int = 32) -> Config:
    """Shrink a preset for CPU-speed parity runs; force the settings the
    comparison depends on (fp32, per-step dispatch, no flip augment —
    the flip draw would come from jax RNG, which torch cannot mirror)."""
    return preset_cfg.override({
        "model.ngf": width, "model.ndf": width, "model.nz": nz,
        "data.batch_size": batch_size, "data.hflip": False,
        "data.dataset": "synthetic", "data.synthetic_size": 512,
        "train.precision": "fp32", "train.steps_per_call": 1,
        "train.ema": 0.0,
        # the torch twin runs the plain alternating reference loop: every
        # algorithm-changing knob must be OFF or the harness compares two
        # different algorithms (fused_prop shares one fake forward and
        # never consumes z_g; augment/ADA transform what D sees;
        # grad_accum changes BN's normalization granularity)
        "train.fused_prop": False, "train.augment": "",
        "train.ada_target": 0.0, "train.grad_accum": 1,
    })


def make_streams(cfg: Config, steps: int, seed: int = 0
                 ) -> Tuple[List[Dict[str, np.ndarray]], np.ndarray]:
    """Deterministic per-step inputs both frameworks consume verbatim.

    Returns (streams, real_images) where real_images is the full synthetic
    set in [-1, 1] float32 NHWC (also the FID real side)."""
    from tpugan.data import load_dataset

    data = load_dataset(
        "synthetic", cfg.data.data_dir, image_size=cfg.model.image_size,
        channels=cfg.model.channels, synthetic_size=cfg.data.synthetic_size,
        seed=cfg.train.seed, n_classes=cfg.model.n_classes)
    imgs = data["images"].astype(np.float32) / 127.5 - 1.0

    rng = np.random.default_rng(seed)
    n, bsz, nz = len(imgs), cfg.data.batch_size, cfg.model.nz
    conditional = cfg.model.arch == "cdcgan"
    k = max(cfg.model.n_classes, 1)
    streams = []
    for _ in range(steps):
        idx = rng.integers(0, n, bsz)
        s = {
            "x": imgs[idx],
            "z_d": rng.standard_normal((bsz, nz)).astype(np.float32),
            "z_g": rng.standard_normal((bsz, nz)).astype(np.float32),
            "alpha": rng.random((bsz, 1, 1, 1)).astype(np.float32),
        }
        if conditional:
            s["y"] = data["labels"][idx].astype(np.int32)
            s["y_fake_d"] = rng.integers(0, k, bsz).astype(np.int32)
            s["y_fake_g"] = rng.integers(0, k, bsz).astype(np.int32)
        streams.append(s)
    return streams, imgs


def run_tpugan(cfg: Config, g, d, streams) -> Tuple[object, np.ndarray]:
    """Train the tpugan build on the streams; return (final TrainState,
    (steps, 2) array of [loss_d, loss_g])."""
    import jax.numpy as jnp

    from tpugan.train import build_train_step, create_train_state

    state = create_train_state(cfg, g, d)
    step = build_train_step(cfg, g, d)
    losses = []
    gp = cfg.loss.kind == "wgan_gp"
    for s in streams:
        batch = {"image": jnp.asarray(s["x"]),
                 "z_d": jnp.asarray(s["z_d"]),
                 "z_g": jnp.asarray(s["z_g"])}
        if gp:
            batch["gp_alpha"] = jnp.asarray(s["alpha"])
        if "y" in s:
            batch["label"] = jnp.asarray(s["y"])
            batch["y_fake_d"] = jnp.asarray(s["y_fake_d"])
            batch["y_fake_g"] = jnp.asarray(s["y_fake_g"])
        state, m = step(state, batch)
        losses.append((float(m["loss_d"]), float(m["loss_g"])))
    return state, np.asarray(losses)


def _torch_d_loss(kind: str, r, f, torch, real_label=1.0, fake_label=0.0):
    F = torch.nn.functional
    if kind == "bce":
        # BCE-with-logits to target t: t*softplus(-x) + (1-t)*softplus(x)
        # (mirrors losses/adversarial.py's _bce_with_target, incl. the
        # one-sided real_label smoothing the tpugan D step honors)
        real = (real_label * F.softplus(-r)
                + (1.0 - real_label) * F.softplus(r)).mean()
        fake = (fake_label * F.softplus(-f)
                + (1.0 - fake_label) * F.softplus(f)).mean()
        return real + fake
    if kind == "lsgan":
        return 0.5 * (((r - real_label) ** 2).mean()
                      + ((f - fake_label) ** 2).mean())
    if kind in ("wgan", "wgan_gp"):
        return f.mean() - r.mean()
    if kind == "hinge":
        return F.relu(1.0 - r).mean() + F.relu(1.0 + f).mean()
    raise ValueError(kind)


def _torch_g_loss(kind: str, f, torch):
    F = torch.nn.functional
    if kind == "bce":
        return F.softplus(-f).mean()
    if kind == "lsgan":
        return 0.5 * ((f - 1.0) ** 2).mean()
    if kind in ("wgan", "wgan_gp", "hinge"):
        return -f.mean()
    raise ValueError(kind)


def _torch_gp(td, real, fake, alpha, torch, y=None):
    """Mirror of losses/gradient_penalty.py, incl. the eps inside sqrt.

    The interpolate forward runs in EVAL mode: tpugan's GP scores x_hat
    with train=False on frozen D state (steps.py d_score), so a twin left
    in train mode would normalize with batch stats and advance BN/SN
    buffers — harness drift, not framework difference (matters only for
    configs with BN/SN in D; the built-in wgan_gp preset has neither).

    y: real-batch labels for a conditional D — tpugan's d_score passes
    y_real to the interpolate forward (steps.py), so the twin must too."""
    a = torch.from_numpy(alpha)
    x_hat = (a * real + (1.0 - a) * fake).detach().requires_grad_(True)
    was_training = td.training
    td.eval()
    out = td(x_hat, y) if y is not None else td(x_hat)
    if was_training:
        td.train()
    (grads,) = torch.autograd.grad(out.sum(), x_hat, create_graph=True)
    norms = torch.sqrt(
        grads.reshape(grads.shape[0], -1).pow(2).sum(1) + 1e-12)
    return ((norms - 1.0) ** 2).mean()


def build_torch_twins(cfg: Config, state, into=None, only: str = "gd"):
    """Torch G/D mirroring cfg's architecture, weights transplanted from a
    tpugan TrainState (so both frameworks start bit-identical).

    ``into=(tg, td)`` re-transplants into existing twin modules instead of
    constructing fresh ones — used by the exporter to run several
    params-shaped trees (weights, Adam mu, Adam nu) through the same
    layout transforms without rebuilding the modules each time.

    ``only`` limits which nets are built/transplanted ("g", "d", or the
    default "gd"); the skipped slot returns None — used by the optimizer
    importer when only one net's moments are being restored.
    """
    import jax

    from tpugan.parity.torch_twin import (
        TorchCondDiscriminator,
        TorchCondGenerator,
        TorchDiscriminator,
        TorchGenerator,
        transplant_cond_d,
        transplant_cond_g,
        transplant_d,
        transplant_g,
    )

    from tpugan.models.registry import resolve_embed_dim

    m = cfg.model
    want_g, want_d = "g" in only, "d" in only
    if not (want_g or want_d):
        raise ValueError(f"only={only!r} selects neither net")
    conditional = m.arch == "cdcgan"
    tg, td = into if into is not None else (None, None)
    if into is None:
        ed = resolve_embed_dim(m) if conditional else 0  # 0 -> 50 rule
        if want_g:
            tg = (TorchCondGenerator(m.image_size, m.channels, m.nz, m.ngf,
                                     m.n_classes, ed,
                                     batchnorm=m.g_batchnorm)
                  if conditional else
                  TorchGenerator(m.image_size, m.channels, m.nz, m.ngf,
                                 batchnorm=m.g_batchnorm))
        if want_d:
            td = (TorchCondDiscriminator(m.image_size, m.channels, m.ndf,
                                         m.n_classes, ed,
                                         batchnorm=m.d_batchnorm,
                                         spectral_norm=m.d_spectral_norm)
                  if conditional else
                  TorchDiscriminator(m.image_size, m.channels, m.ndf,
                                     batchnorm=m.d_batchnorm,
                                     spectral_norm=m.d_spectral_norm))
    if want_g:
        pg, sg = jax.device_get(state.params_g), jax.device_get(state.state_g)
        (transplant_cond_g if conditional else transplant_g)(pg, sg, tg)
    if want_d:
        pd, sd = jax.device_get(state.params_d), jax.device_get(state.state_d)
        (transplant_cond_d if conditional else transplant_d)(pd, sd, td)
    return tg, td


def run_torch(cfg: Config, tg, td, streams) -> np.ndarray:
    """Train the torch twins on the streams with the reference's loop
    semantics (matching the tpugan step exactly: G's D-step forward runs in
    train mode, D sees real then fake, G updates every n_critic-th step).

    Returns (steps, 2) array of [loss_d, loss_g] (loss_g = 0.0 on skipped
    G steps, matching the tpugan metric)."""
    import torch

    kind = cfg.loss.kind
    n_critic = cfg.loss.n_critic
    lambda_gp = cfg.loss.lambda_gp
    clip = cfg.loss.clip_value if kind == "wgan" else None

    o = cfg.optim
    if o.optimizer == "adam":
        mk = lambda ps, lr: torch.optim.Adam(
            ps, lr=lr, betas=(o.beta1, o.beta2), eps=o.eps)
    else:  # rmsprop — twin mirrors cfg (tpugan mirrors torch semantics)
        mk = lambda ps, lr: torch.optim.RMSprop(ps, lr=lr,
                                                alpha=o.rmsprop_decay,
                                                eps=o.eps)
    opt_g = mk(tg.parameters(), o.lr_g)
    opt_d = mk(td.parameters(), o.lr_d)

    tg.train()
    td.train()
    losses = []
    for t, s in enumerate(streams):
        x = torch.from_numpy(s["x"].transpose(0, 3, 1, 2))
        z_d = torch.from_numpy(s["z_d"])
        z_g = torch.from_numpy(s["z_g"])
        cond = "y" in s
        if cond:
            y = torch.from_numpy(s["y"]).long()
            yfd = torch.from_numpy(s["y_fake_d"]).long()
            yfg = torch.from_numpy(s["y_fake_g"]).long()

        # --- D step (every iteration) ---
        opt_d.zero_grad()
        # G train-mode forward (BN stats move); then real, then fake (the
        # SN u-update ordering the tpugan step uses)
        fake = (tg(z_d, yfd) if cond else tg(z_d)).detach()
        out_real = td(x, y) if cond else td(x)
        out_fake = td(fake, yfd) if cond else td(fake)
        loss_d = _torch_d_loss(kind, out_real, out_fake, torch,
                               real_label=cfg.loss.real_label,
                               fake_label=cfg.loss.fake_label)
        if kind == "wgan_gp":
            loss_d = loss_d + lambda_gp * _torch_gp(
                td, x, fake, s["alpha"], torch, y if cond else None)
        loss_d.backward()
        opt_d.step()
        if clip is not None:
            with torch.no_grad():
                for p in td.parameters():
                    p.clamp_(-clip, clip)

        # --- G step (every n_critic-th iteration) ---
        loss_g_val = 0.0
        if (t % n_critic) == (n_critic - 1):
            opt_g.zero_grad()
            out_g = (td(tg(z_g, yfg), yfg) if cond
                     else td(tg(z_g)))
            loss_g = _torch_g_loss(kind, out_g, torch)
            loss_g.backward()
            opt_g.step()
            loss_g_val = loss_g.item()
        losses.append((loss_d.item(), loss_g_val))
    return np.asarray(losses)


def compare_final_generators(cfg: Config, g, state, tg, real_images,
                             n: int = 512, seed: int = 1234
                             ) -> Dict[str, float]:
    """Proxy-FID of both final generators against the same real set via the
    same extractor, plus the cross-FID between the two fake sets."""
    import jax.numpy as jnp
    import torch

    from tpugan.eval.features import make_extractor
    from tpugan.eval.fid import fid_from_features

    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, cfg.model.nz)).astype(np.float32)
    conditional = cfg.model.arch == "cdcgan"

    if conditional:
        y = rng.integers(0, max(cfg.model.n_classes, 1), n).astype(np.int32)
        fake_j, _ = g.apply(state.params_g, state.state_g,
                            (jnp.asarray(z), jnp.asarray(y)), train=False)
    else:
        fake_j, _ = g.apply(state.params_g, state.state_g, jnp.asarray(z),
                            train=False)
    fake_j = np.asarray(fake_j, np.float32)

    tg.eval()
    with torch.no_grad():
        if conditional:
            fake_t = tg(torch.from_numpy(z),
                        torch.from_numpy(y).long())
        else:
            fake_t = tg(torch.from_numpy(z))
        fake_t = fake_t.numpy().transpose(0, 2, 3, 1)

    ex = make_extractor(cfg.model.channels, "proxy")
    feat_real, _ = ex(real_images[:max(n, 256)])
    feat_j, _ = ex(fake_j)
    feat_t, _ = ex(fake_t)
    fid_j = fid_from_features(feat_real, feat_j)
    fid_t = fid_from_features(feat_real, feat_t)
    fid_cross = fid_from_features(feat_j, feat_t)
    return {
        "fid_tpugan": float(fid_j),
        "fid_torch": float(fid_t),
        "fid_cross": float(fid_cross),
        "rel_delta": float(abs(fid_j - fid_t) / max(abs(fid_t), 1e-9)),
        "pixel_mae": float(np.mean(np.abs(fake_j - fake_t))),
        "weight_dist": generator_weight_distance(cfg, state, tg),
    }


def torch_weight_distance(tg_a, tg_b) -> float:
    """Relative L2 distance between two torch generators' full states
    (parameters + BN buffers): ||a - b|| / ||b||."""
    import torch

    num = 0.0
    den = 0.0
    sa, sb = tg_a.state_dict(), tg_b.state_dict()
    for k, b in sb.items():
        if not torch.is_floating_point(b):
            continue
        a = sa[k]
        num += float(((a - b) ** 2).sum())
        den += float((b ** 2).sum())
    return float(np.sqrt(num) / max(np.sqrt(den), 1e-12))


def generator_weight_distance(cfg: Config, state, tg) -> float:
    """Weight-space distance between the final tpugan generator and the
    final torch generator, measured in torch layout: the JAX state is
    transplanted into a fresh twin, then compared parameter-by-parameter."""
    twin, _ = build_torch_twins(cfg, state)
    return torch_weight_distance(twin, tg)


def run_seed_noise_floor(preset: str, steps: int, *, batch_size: int = 32,
                         width: int = 32, nz: int = 32, fid_n: int = 512,
                         n_seeds: int = 2) -> Dict[str, object]:
    """The reference's OWN seed-to-seed variability: train the torch twin
    ``n_seeds`` times from one init on different data/noise streams, and
    report

    - the spread of the final proxy-FIDs (all pairwise relative deltas),
    - the pairwise CROSS-FIDs between the seed generators (how far the
      reference's own generators are from each other, distributionally),
    - the pairwise weight-space distances.

    The cross-framework numbers from run_convergence_parity are judged
    against these floors (see parity_acceptance): a framework difference
    within the reference's own seed noise is parity."""
    import torch

    from tpugan.configs import get_preset
    from tpugan.eval.features import make_extractor
    from tpugan.eval.fid import fid_from_features
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    cfg = parity_cfg(get_preset(preset), batch_size=batch_size, width=width,
                     nz=nz)
    g, d = build_models(cfg.model, cfg.train.precision)
    state0 = create_train_state(cfg, g, d)

    finals = []
    real = None
    for seed in range(n_seeds):
        streams, real = make_streams(cfg, steps, seed=seed)
        tg, td = build_torch_twins(cfg, state0)
        run_torch(cfg, tg, td, streams)
        tg.eval()
        finals.append(tg)

    rng = np.random.default_rng(1234)
    z = torch.from_numpy(
        rng.standard_normal((fid_n, cfg.model.nz)).astype(np.float32))
    with torch.no_grad():
        fakes = [t(z).numpy().transpose(0, 2, 3, 1) for t in finals]
    ex = make_extractor(cfg.model.channels, "proxy")
    feat_real, _ = ex(real[:max(fid_n, 256)])
    feats = [ex(f)[0] for f in fakes]
    fids = [float(fid_from_features(feat_real, ft)) for ft in feats]
    pairs = [(i, j) for i in range(len(fids)) for j in range(len(fids))
             if i < j]
    pair_rel = [abs(fids[i] - fids[j]) / max(abs(fids[j]), 1e-9)
                for i, j in pairs]
    cross = [float(fid_from_features(feats[i], feats[j])) for i, j in pairs]
    wdist = [torch_weight_distance(finals[i], finals[j]) for i, j in pairs]
    return {
        "preset": preset, "steps": steps, "fids": fids,
        "noise_floor_rel": max(pair_rel),
        "noise_floor_rel_median": float(np.median(pair_rel)),
        "cross_fid_floor": max(cross),
        "cross_fid_floor_median": float(np.median(cross)),
        "weight_dist_floor": max(wdist),
        "weight_dist_floor_median": float(np.median(wdist)),
    }


def run_fp_noise_floor(preset: str, steps: int, *, batch_size: int = 32,
                       width: int = 32, nz: int = 32, fid_n: int = 512,
                       eps: float = 1e-6, stream_seed: int = 0
                       ) -> Dict[str, float]:
    """The SAME-framework float-noise floor: train the torch twin twice on
    the SAME stream, once from the exact init and once from init*(1+eps
    -scale noise), and measure how far the two final generators drift.

    This isolates chaos amplification of last-bit differences from any
    framework-semantics difference: a cross-framework generator distance at
    or below this floor is indistinguishable from a one-ulp perturbation
    inside the reference itself.  (wgan-clip is the variant this matters
    for: weight clipping pins params to the +/-c cliff, where torch and XLA
    rounding differ on EVERY step, not just at init.)"""
    import torch

    from tpugan.configs import get_preset
    from tpugan.eval.features import make_extractor
    from tpugan.eval.fid import fid_from_features
    from tpugan.models import build_models
    from tpugan.train import create_train_state

    cfg = parity_cfg(get_preset(preset), batch_size=batch_size, width=width,
                     nz=nz)
    g, d = build_models(cfg.model, cfg.train.precision)
    state0 = create_train_state(cfg, g, d)
    streams, real = make_streams(cfg, steps, seed=stream_seed)

    finals = []
    for perturb in (False, True):
        tg, td = build_torch_twins(cfg, state0)
        if perturb:
            gen = torch.Generator().manual_seed(7)
            with torch.no_grad():
                for p in list(tg.parameters()) + list(td.parameters()):
                    noise = torch.randn(p.shape, generator=gen)
                    p.add_(noise * (p.abs() * eps + 1e-12))
        run_torch(cfg, tg, td, streams)
        finals.append(tg.eval())

    rng = np.random.default_rng(1234)
    z = torch.from_numpy(
        rng.standard_normal((fid_n, cfg.model.nz)).astype(np.float32))
    with torch.no_grad():
        fakes = [t(z).numpy().transpose(0, 2, 3, 1) for t in finals]
    ex = make_extractor(cfg.model.channels, "proxy")
    feat_real, _ = ex(real[:max(fid_n, 256)])
    feats = [ex(f)[0] for f in fakes]
    fids = [float(fid_from_features(feat_real, ft)) for ft in feats]
    return {
        "preset": preset, "steps": steps, "eps": eps,
        "fp_cross_fid": float(fid_from_features(feats[0], feats[1])),
        "fp_weight_dist": torch_weight_distance(finals[0], finals[1]),
        "fp_rel_delta": abs(fids[0] - fids[1]) / max(abs(fids[1]), 1e-9),
    }


def parity_acceptance(finals, floor: Dict[str, object]) -> Dict[str, object]:
    """The quantitative parity criterion (BASELINE.md parity table).

    ``finals``: one ``compare_final_generators`` dict, or a list of them
    from INDEPENDENT stream seeds.  With several stream seeds the medians
    are judged — a single 400-step GAN run is one draw from a chaotic
    process, and any max-floor comparison against a single draw is
    noise-dominated in both directions.

    A variant is at parity if EITHER
      (a) median cross-framework proxy-FID relative delta is within the
          reference's own max pairwise seed spread, OR
      (b) the cross-framework generators are distributionally no farther
          apart than the reference's own seed-run generators:
          median cross-FID(tpugan, torch) <= max pairwise seed cross-FID.
    (a) judges the scalar headline; (b) judges the generators directly and
    is robust to FID-estimator noise amplifying a scalar delta."""
    if isinstance(finals, dict):
        finals = [finals]
    med = lambda k: float(np.median([f[k] for f in finals]))  # noqa: E731
    fid_ok = med("rel_delta") <= floor["noise_floor_rel"]
    cross_ok = med("fid_cross") <= floor["cross_fid_floor"]
    return {
        "median_rel_delta": med("rel_delta"),
        "median_fid_cross": med("fid_cross"),
        "median_weight_dist": med("weight_dist"),
        "n_stream_seeds": len(finals),
        "fid_delta_within_floor": bool(fid_ok),
        "cross_fid_within_floor": bool(cross_ok),
        "parity": bool(fid_ok or cross_ok),
    }


def run_convergence_parity(preset: str, steps: int, *, batch_size: int = 32,
                           width: int = 32, nz: int = 32, fid_n: int = 512,
                           stream_seed: int = 0,
                           overrides: Optional[Dict[str, object]] = None
                           ) -> Dict[str, object]:
    """End-to-end: build both frameworks from one init, train both on the
    same streams, return trajectories + final-generator comparison."""
    from tpugan.configs import get_preset
    from tpugan.models import build_models

    cfg = parity_cfg(get_preset(preset), batch_size=batch_size, width=width,
                     nz=nz)
    if overrides:
        cfg = cfg.override(overrides)
    g, d = build_models(cfg.model, cfg.train.precision)
    streams, real = make_streams(cfg, steps, seed=stream_seed)

    # Torch twins transplant from the *initial* state, so build it first.
    from tpugan.train import create_train_state

    state0 = create_train_state(cfg, g, d)
    tg, td = build_torch_twins(cfg, state0)

    state, losses_j = run_tpugan(cfg, g, d, streams)
    losses_t = run_torch(cfg, tg, td, streams)
    final = compare_final_generators(cfg, g, state, tg, real, n=fid_n)
    return {"cfg": cfg, "losses_tpugan": losses_j, "losses_torch": losses_t,
            "final": final}
