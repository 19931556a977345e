"""The single jitted alternating D/G train step.

The reference's whole inner loop — D forward on real, G forward, D forward on
fake, D backward + Adam step, then (every ``n_critic``-th iteration) G
forward/backward + Adam step — compiles here into ONE XLA program per config:

- One call = one data batch = one D update, plus a G update under
  ``lax.cond`` when ``step % n_critic == n_critic - 1`` (the reference's
  "G step every n_critic loader iterations" schedule).
- The WGAN-GP penalty is nested ``jax.grad`` inside the D loss (double
  backward compiled into the same program; see losses/gradient_penalty.py).
- BatchNorm statistics and spectral-norm u vectors thread through
  functionally, mirroring the reference's train-mode semantics: D's stats
  update on both the real and fake forwards of the D step and again on the
  G step's fake forward; G's stats update in both steps.
- All buffers of the input ``TrainState`` are donated — parameters and
  optimizer moments are updated in place in HBM.

RNG: the state carries one threefry key; each step deterministically splits
out the z-noise, GP-interpolation, and label keys, so runs are reproducible
from the config seed alone and resume exactly from a checkpoint.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpugan.configs import Config
from tpugan.losses import (
    d_loss_fake_fn,
    d_loss_fn,
    d_loss_real_fn,
    g_loss_fn,
    gradient_penalty,
)
from tpugan.nn.core import Module
from tpugan.ops.augment import apply_policy, parse_policy
from tpugan.train.state import TrainState, make_optimizers

# ADA r_t smoothing is defined over an IMAGE budget, not a step count
# (Karras et al. 2020 integrate the overfitting heuristic over a fixed
# number of reals).  _ADA_RT_IMG_WINDOW is that budget: the EMA blend
# alpha = 1 - bsz/window gives every batch size the same ~1280-image
# effective memory — batch 128 keeps round-4's measured 0.9/0.1 blend
# exactly, batch 8 blends at 0.994 (160-step window) instead of a noisy
# 10-step one, and huge batches clamp at 0.5 so one batch never fully
# overwrites the estimate.  The A/B evidence behind the window choice is
# docs/evidence/smalldata_ab.json (batch 128); DESIGN.md §7a documents it.
_ADA_RT_IMG_WINDOW = 1280.0


def ada_rt_alpha(bsz: int) -> float:
    """EMA blend factor for ADA's r_t estimate at this batch size."""
    return max(0.5, 1.0 - bsz / _ADA_RT_IMG_WINDOW)


def epoch_indices(data_root: jax.Array, step: jax.Array, bsz: int,
                  n: int) -> jax.Array:
    """On-device DataLoader semantics (shuffle=True, without replacement):
    run position ``p`` reads ``perm_{p // n}[p % n]``, a fresh permutation
    per epoch keyed on (config seed, epoch).  A batch straddles at most two
    epochs, so two permutations cover every element; positions derive from
    ``state.step``, so the data order is resume-exact.  Requires
    ``bsz <= n`` (more than two epochs per batch would need more
    permutations — and a batch larger than the dataset is a config bug)."""
    if bsz > n:
        raise ValueError(
            f"sampling='epoch' needs batch_size ({bsz}) <= dataset size "
            f"({n}); a batch may straddle at most two epochs")
    pos = step * bsz + jnp.arange(bsz)
    epoch, r = pos // n, pos % n
    perm_a = jax.random.permutation(
        jax.random.fold_in(data_root, epoch[0]), n)
    perm_b = jax.random.permutation(
        jax.random.fold_in(data_root, epoch[-1]), n)
    return jnp.where(epoch == epoch[0],
                     jnp.take(perm_a, r), jnp.take(perm_b, r))


def build_train_step(cfg: Config, g: Module, d: Module, mesh=None
                     ) -> Callable[[TrainState, Dict[str, jax.Array]],
                                   Tuple[TrainState, Dict[str, jax.Array]]]:
    """Return the compiled train step for (cfg, g, d).

    ``mesh``: the DP mesh, needed only for device-resident data — the
    on-device gather pulls the batch out of a mesh-replicated dataset, and
    without an explicit constraint XLA keeps the whole step replicated
    (correct numbers, zero DP speedup).  Host-pipeline batches arrive
    already sharded, so they need nothing here.
    """
    kind = cfg.loss.kind
    nz = cfg.model.nz
    n_critic = cfg.loss.n_critic
    lambda_gp = cfg.loss.lambda_gp
    conditional = cfg.model.arch == "cdcgan"
    n_classes = cfg.model.n_classes
    tx_g, tx_d = make_optimizers(cfg)

    # Differentiable augmentation (ops/augment.py): every image D sees —
    # real and fake, both updates — goes through the policy, with gradients
    # flowing through to G.  Under WGAN-GP the interpolates are built from
    # the AUGMENTED pair: D is only ever evaluated on augmented images, so
    # the Lipschitz constraint lives on that same distribution.
    policy = parse_policy(cfg.train.augment) if cfg.train.augment else ()
    ada_on = cfg.train.ada_target != 0
    if ada_on and not policy:
        raise ValueError(
            "nonzero train.ada_target requires train.augment to name at "
            "least one op (e.g. 'color,translation,cutout')")
    if ada_on and cfg.loss.kind not in ("bce", "hinge"):
        # ADA's overfitting heuristic r_t = E[sign(D(real))] needs a
        # zero-calibrated logit.  lsgan regresses D(real) toward 1.0 (sign
        # saturates at +1 within a few hundred steps regardless of
        # overfitting) and wgan critic scores have no calibrated zero —
        # under either, p would silently ramp to max-strength augmentation.
        # Use fixed-p DiffAugment (train.augment alone) for those losses.
        raise ValueError(
            f"train.ada_target requires a zero-calibrated logit loss "
            f"(bce or hinge), not {cfg.loss.kind!r}: r_t = E[sign(D(real))] "
            f"saturates under lsgan and is uncalibrated for wgan, so p "
            f"would ramp to 1.0 regardless of overfitting — use fixed-p "
            f"DiffAugment (train.augment without ada_target) instead")
    if cfg.loss.kind in ("wgan", "wgan_gp", "hinge") and (
            cfg.loss.real_label != 1.0 or cfg.loss.fake_label != 0.0):
        # These objectives have no label targets — silently ignoring a
        # configured smoothing (the bce/lsgan knob) would be a no-op the
        # user can't see.
        raise ValueError(
            f"loss.real_label/fake_label have no effect under "
            f"{cfg.loss.kind!r} (no label targets in that objective); "
            f"label smoothing applies to bce/lsgan only")

    def _aug(x, k, p):
        return apply_policy(x, k, policy, 1.0 if p is None else p)

    # Optional rematerialization: recompute forward activations during the
    # backward pass instead of keeping them in HBM — the standard lever for
    # fitting larger batches/models (e.g. 128px) on one chip.
    def _maybe_remat(f):
        return jax.checkpoint(f) if cfg.train.remat else f

    _g_apply = _maybe_remat(
        lambda p, s, zin: g.apply(p, s, zin, train=True))
    _d_apply_train = _maybe_remat(
        lambda p, s, xin: d.apply(p, s, xin, train=True))

    def g_forward(params_g, state_g, z, y):
        zin = (z, y) if conditional else z
        return _g_apply(params_g, state_g, zin)

    def d_forward(params_d, state_d, x, y, train=True):
        xin = (x, y) if conditional else x
        if train:
            return _d_apply_train(params_d, state_d, xin)
        return d.apply(params_d, state_d, xin, train=False)

    # ---- D loss -----------------------------------------------------------
    def d_loss(params_d, state_d, params_g, state_g, x_real, y_real, z,
               y_fake, k_gp, gp_alpha=None, k_aug=None, ada_p=None):
        fake, state_g = g_forward(params_g, state_g, z, y_fake)
        fake = lax.stop_gradient(fake)  # reference: fake.detach() in D step
        if policy:
            # Fresh draws for real and fake (DiffAugment semantics: each
            # call of the augmentation pipeline re-randomizes).
            ka_r, ka_f = jax.random.split(k_aug)
            x_real = _aug(x_real, ka_r, ada_p)
            fake = _aug(fake, ka_f, ada_p)
        real_logits, state_d = d_forward(params_d, state_d, x_real, y_real)
        fake_logits, state_d = d_forward(params_d, state_d, fake, y_fake)
        loss = d_loss_fn(kind, real_logits, fake_logits,
                         real_label=cfg.loss.real_label,
                         fake_label=cfg.loss.fake_label)
        gp = jnp.zeros((), jnp.float32)
        if kind == "wgan_gp":
            frozen = jax.tree.map(lax.stop_gradient, state_d)

            def d_score(x):
                logits, _ = d_forward(params_d, frozen, x, y_real,
                                      train=False)
                return logits

            gp = gradient_penalty(d_score, x_real, fake, k_gp,
                                  alpha=gp_alpha)
            loss = loss + lambda_gp * gp
        metrics = {
            "loss_d": loss,
            "d_real": jnp.mean(real_logits.astype(jnp.float32)),
            "d_fake": jnp.mean(fake_logits.astype(jnp.float32)),
            "gp": gp,
        }
        if ada_on:
            # ADA's overfitting heuristic: r_t = E[sign(D(real))] drifts
            # toward +1 as D memorizes the reals.
            metrics["rt_batch"] = jnp.mean(
                jnp.sign(real_logits.astype(jnp.float32)))
        return loss, (state_d, state_g, metrics)

    # ---- G loss -----------------------------------------------------------
    def g_loss(params_g, state_g, params_d, state_d, z, y_fake,
               k_aug=None, ada_p=None):
        fake, state_g = g_forward(params_g, state_g, z, y_fake)
        if policy:
            # Differentiable: G's gradient flows through the augmentation,
            # so G never learns to produce augmented images.
            fake = _aug(fake, k_aug, ada_p)
        fake_logits, state_d = d_forward(params_d, state_d, fake, y_fake)
        # G's target stays 1.0 even under one-sided label smoothing —
        # smoothing only D's real target; a smoothed G target would reverse
        # G's gradient once D(G(z)) exceeds it.
        loss = g_loss_fn(kind, fake_logits)
        return loss, (state_g, state_d)

    d_grad = jax.grad(d_loss, argnums=0, has_aux=True)

    # ---- FusedProp (arxiv 2004.03335) --------------------------------------
    # One fake forward shared by both updates; both gradients pulled from
    # one linearization of D-on-fake: cotangent c_D = ∂L_D/∂logits gives
    # the D-parameter pull, c_G = ∂L_G/∂logits gives the input pull that
    # chains into G's VJP.  Saves one G forward and one D forward per step.
    # Simultaneous rather than alternating: G's gradient uses the
    # PRE-update D (the paper's scheme), and SN's power iteration runs
    # twice per step instead of three times.
    fused_prop = cfg.train.fused_prop
    if fused_prop and (kind == "wgan_gp" or n_critic != 1):
        raise ValueError(
            "train.fused_prop requires n_critic == 1 and no gradient "
            "penalty (loss.kind != 'wgan_gp')")

    def fused_updates(state, x_real, y_real, z, y_fake, k_aug=None):
        if policy:
            # The fused path shares ONE fake forward between the D and G
            # pulls, so (unlike the alternating path) both see the SAME
            # augmentation draw on the fake — inherent to the scheme.
            ka_r, ka_f = jax.random.split(k_aug)
            x_real = _aug(x_real, ka_r, state.ada_p)
        fake, vjp_g, state_g = jax.vjp(
            lambda pg: g_forward(pg, state.state_g, z, y_fake),
            state.params_g, has_aux=True)

        def d_real_part(pd):
            r_logits, sd = d_forward(pd, state.state_d, x_real, y_real)
            loss_r = d_loss_real_fn(kind, r_logits,
                                    real_label=cfg.loss.real_label)
            return loss_r, (loss_r, sd, r_logits)
        grads_real, (loss_r, sd, real_logits) = jax.grad(
            d_real_part, has_aux=True)(state.params_d)

        def d_fake_logits(pd, f):
            if policy:
                # Inside the shared linearization: both the D-parameter pull
                # and the input pull that chains into G's VJP flow through
                # the augmentation.
                f = _aug(f, ka_f, state.ada_p)
            logits, sd2 = d_forward(pd, sd, f, y_fake)
            return logits, sd2
        fake_logits, vjp_d, state_d = jax.vjp(
            d_fake_logits, state.params_d, fake, has_aux=True)

        c_d = jax.grad(lambda f: d_loss_fake_fn(
            kind, f, fake_label=cfg.loss.fake_label))(fake_logits)
        c_g = jax.grad(lambda f: g_loss_fn(kind, f))(fake_logits)
        grads_fake_d, _ = vjp_d(c_d)   # D-parameter pull
        _, fake_cot = vjp_d(c_g)       # input pull, chains into G
        (grads_g,) = vjp_g(fake_cot)

        grads_d = jax.tree.map(jnp.add, grads_real, grads_fake_d)
        loss_d = loss_r + d_loss_fake_fn(kind, fake_logits,
                                         fake_label=cfg.loss.fake_label)
        metrics = {
            "loss_d": loss_d,
            "d_real": jnp.mean(real_logits.astype(jnp.float32)),
            "d_fake": jnp.mean(fake_logits.astype(jnp.float32)),
            "gp": jnp.zeros((), jnp.float32),
        }
        if ada_on:
            metrics["rt_batch"] = jnp.mean(
                jnp.sign(real_logits.astype(jnp.float32)))
        return (grads_d, grads_g, state_d, state_g, metrics,
                g_loss_fn(kind, fake_logits))

    clip = cfg.loss.clip_value if kind == "wgan" else None

    # ---- gradient accumulation ---------------------------------------------
    # A memory lever, not a semantics no-op: the batch splits into `accum`
    # microbatches whose forwards/backwards run SEQUENTIALLY under lax.scan
    # (activation memory of one microbatch), gradients averaged before the
    # single optimizer update.  Loss terms are batch means, so the averaged
    # gradient equals the full-batch gradient exactly — except BatchNorm,
    # which normalizes per microbatch (the standard accumulation tradeoff;
    # with batchnorm off the equivalence is exact, see
    # tests/test_train_step.py::test_grad_accum_matches_full_batch).
    accum = cfg.train.grad_accum
    if accum < 1:
        raise ValueError(f"train.grad_accum must be >= 1, got {accum}")
    if accum > 1:
        if fused_prop:
            raise ValueError("train.grad_accum requires fused_prop off "
                             "(the fused path shares one full-batch "
                             "linearization)")
        if cfg.data.batch_size % accum:
            raise ValueError(
                f"data.batch_size {cfg.data.batch_size} not divisible by "
                f"train.grad_accum {accum}")

    # Any mesh with a real 'data' axis — the plain ('data',) DP mesh, the
    # FSDP ('data','model') mesh, AND the 2-D ('data','space') mesh — gets
    # the microbatch sharding constraint below.  (A pure ('space',) mesh
    # has no batch axis to constrain: the spatial ctx shards H per conv.)
    _accum_data_mesh = (mesh if (mesh is not None
                                 and "data" in mesh.axis_names
                                 and mesh.shape.get("data", 1) > 1) else None)
    if accum > 1 and _accum_data_mesh is not None:
        n_data = _accum_data_mesh.shape["data"]
        if (cfg.data.batch_size // accum) % n_data:
            raise ValueError(
                f"microbatch size {cfg.data.batch_size // accum} "
                f"(batch_size/grad_accum) not divisible by the 'data' mesh "
                f"axis ({n_data} devices)")

    def _chunk(t):
        if t is None:
            return None
        t = t.reshape((accum, t.shape[0] // accum) + t.shape[1:])
        if _accum_data_mesh is not None:
            # keep each scanned microbatch batch-sharded over 'data' —
            # without the constraint XLA may replicate the accumulation
            # (correct numbers, zero DP speedup; see the resident-gather
            # constraint above)
            from jax.sharding import NamedSharding, PartitionSpec as P

            t = lax.with_sharding_constraint(
                t, NamedSharding(_accum_data_mesh,
                                 P(None, "data", *([None] * (t.ndim - 2)))))
        return t

    def accum_d_grads(params_d, state_d0, params_g, state_g0, x_real,
                      y_real, z_d, y_fake_d, k_gp, gp_alpha, k_aug=None,
                      ada_p=None):
        mbs = {"x": _chunk(x_real), "z": _chunk(z_d),
               "kg": jax.random.split(k_gp, accum)}
        if y_real is not None:
            mbs["yr"] = _chunk(y_real)
        if y_fake_d is not None:
            mbs["yf"] = _chunk(y_fake_d)
        if gp_alpha is not None:
            mbs["ga"] = _chunk(gp_alpha)
        if policy:
            mbs["ka"] = jax.random.split(k_aug, accum)

        def body(carry, mb):
            acc, sd, sg = carry
            g, (sd, sg, m) = d_grad(
                params_d, sd, params_g, sg, mb["x"], mb.get("yr"),
                mb["z"], mb.get("yf"), mb["kg"], mb.get("ga"),
                mb.get("ka"), ada_p)
            return (jax.tree.map(jnp.add, acc, g), sd, sg), m

        zero = jax.tree.map(jnp.zeros_like, params_d)
        (gsum, sd, sg), ms = lax.scan(body, (zero, state_d0, state_g0), mbs)
        grads = jax.tree.map(lambda t: (t / accum).astype(t.dtype), gsum)
        return grads, (sd, sg, {k: jnp.mean(v) for k, v in ms.items()})

    def accum_g_update(params_g, state_g0, params_d, state_d0, z_g,
                      y_fake_g, k_aug=None, ada_p=None):
        mbs = {"z": _chunk(z_g)}
        if y_fake_g is not None:
            mbs["yf"] = _chunk(y_fake_g)
        if policy:
            mbs["ka"] = jax.random.split(k_aug, accum)

        def body(carry, mb):
            acc, lsum, sg, sd = carry
            (lg, (sg, sd)), gg = jax.value_and_grad(
                g_loss, argnums=0, has_aux=True)(
                    params_g, sg, params_d, sd, mb["z"], mb.get("yf"),
                    mb.get("ka"), ada_p)
            return (jax.tree.map(jnp.add, acc, gg), lsum + lg, sg, sd), None

        zero = jax.tree.map(jnp.zeros_like, params_g)
        (gsum, lsum, sg, sd), _ = lax.scan(
            body, (zero, jnp.zeros((), jnp.float32), state_g0, state_d0),
            mbs)
        grads = jax.tree.map(lambda t: (t / accum).astype(t.dtype), gsum)
        return grads, lsum / accum, sg, sd

    hflip = cfg.data.hflip
    ema_decay = cfg.train.ema

    bsz_cfg = cfg.data.batch_size
    sampling = cfg.data.sampling
    # root key for per-epoch permutations: a pure function of the config
    # seed, so the data order is reproducible and resume-exact (positions
    # derive from state.step, not from the consumable rng stream)
    data_root = jax.random.fold_in(
        jax.random.PRNGKey(cfg.train.seed), 0xDA7A)

    def step(state: TrainState, batch: Dict[str, jax.Array]
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if policy:
            (rng, k_zd, k_zg, k_gp, k_yd, k_yg, k_flip, k_data, k_aug_d,
             k_aug_g) = jax.random.split(state.rng, 10)
        else:
            # Split count unchanged from the augment-free step so existing
            # runs/checkpoints replay the identical RNG stream.
            (rng, k_zd, k_zg, k_gp, k_yd, k_yg, k_flip,
             k_data) = jax.random.split(state.rng, 8)
            k_aug_d = k_aug_g = None

        if "dataset_images" in batch:
            # Device-resident mode: the full dataset lives in HBM; gather
            # this step's batch on-device — zero host->device traffic.
            n_data = batch["dataset_images"].shape[0]
            if sampling == "epoch":
                idx = epoch_indices(data_root, state.step, bsz_cfg, n_data)
            else:  # uniform with replacement (default; cheapest)
                idx = jax.random.randint(k_data, (bsz_cfg,), 0, n_data)
            x_real = jnp.take(batch["dataset_images"], idx, axis=0)
            y_real = (jnp.take(batch["dataset_labels"], idx, axis=0)
                      if "dataset_labels" in batch else None)
            if (mesh is not None and "data" in mesh.axis_names
                    and "space" not in mesh.axis_names
                    and mesh.devices.size > 1):
                # Shard the gathered batch over 'data' (the dataset itself is
                # replicated): from here the step partitions exactly like the
                # host-pipeline DP path, grad psums inserted by XLA.  Covers
                # the plain ('data',) and FSDP ('data','model') meshes; the
                # ('data','space') 2-D mesh path keeps its own placement
                # (dataset H-sharded by the trainer).
                from jax.sharding import NamedSharding, PartitionSpec as P

                bsh = NamedSharding(
                    mesh, P("data", *([None] * (x_real.ndim - 1))))
                x_real = lax.with_sharding_constraint(x_real, bsh)
                if y_real is not None:
                    y_real = lax.with_sharding_constraint(
                        y_real, NamedSharding(mesh, P("data")))
        else:
            x_real = batch["image"]
            y_real = batch.get("label")
        bsz = x_real.shape[0]

        # Device-side decode tail: batches arrive as uint8 (4x less
        # host->device bandwidth than the reference's host-normalized
        # float32); normalization to [-1, 1] and flip-augment fuse into the
        # first conv of the compiled step.
        if x_real.dtype == jnp.uint8:
            x_real = x_real.astype(jnp.float32) / 127.5 - 1.0
        if hflip:
            flip = jax.random.bernoulli(k_flip, 0.5, (bsz, 1, 1, 1))
            x_real = jnp.where(flip, x_real[:, :, ::-1, :], x_real)

        # --- D update (every call) ---
        # Parity harness hook: externally-injected noise ("z_d"/"z_g" in the
        # batch) replaces the internal draw so torch-twin runs can be fed
        # bit-identical inputs. Normal training never passes these keys.
        z_d = batch.get("z_d")
        if z_d is None:
            z_d = jax.random.normal(k_zd, (bsz, nz), jnp.float32)
        y_fake_d = batch.get("y_fake_d")
        if y_fake_d is None:
            y_fake_d = (jax.random.randint(k_yd, (bsz,), 0, n_classes)
                        if conditional else None)

        # ADA adaptation: one on-device control loop — fold this batch's
        # r_t into the EMA, nudge p toward holding it at the target, clip
        # to [0, 1].  Per-step nudge = bsz / (ada_kimg * 1000): p can
        # traverse [0,1] in ada_kimg thousand images (the paper's rule).
        # The r_t blend is likewise image-budget-scaled (ada_rt_alpha):
        # the paper integrates the overfitting heuristic over a fixed
        # number of IMAGES, so a fixed per-step 0.9/0.1 blend would make
        # the estimate noisy at tiny batches and sluggish at huge ones.
        rt_alpha = ada_rt_alpha(bsz)

        def _ada_update(metrics):
            if not ada_on:
                return state.ada_p, state.ada_rt, metrics
            metrics = dict(metrics)
            rt_b = metrics.pop("rt_batch")
            metrics["ada_rt_batch"] = rt_b  # observability + window tests
            rt = state.ada_rt * rt_alpha + rt_b * (1.0 - rt_alpha)
            adj = jnp.sign(rt - cfg.train.ada_target) * (
                bsz / (cfg.train.ada_kimg * 1000.0))
            p = jnp.clip(state.ada_p + adj, 0.0, 1.0)
            metrics["ada_p"] = p
            metrics["ada_rt"] = rt
            return p, rt, metrics

        if fused_prop:
            (grads_d, grads_g, state_d, state_g, metrics,
             loss_g) = fused_updates(state, x_real, y_real, z_d, y_fake_d,
                                     k_aug_d)
            ada_p, ada_rt, metrics = _ada_update(metrics)
            updates, opt_d = tx_d.update(grads_d, state.opt_d,
                                         state.params_d)
            params_d = jax.tree.map(jnp.add, state.params_d, updates)
            if clip is not None:
                params_d = jax.tree.map(
                    lambda p: jnp.clip(p, -clip, clip), params_d)
            updates_g, opt_g = tx_g.update(grads_g, state.opt_g,
                                           state.params_g)
            params_g = jax.tree.map(jnp.add, state.params_g, updates_g)
            ema = state.params_g_ema
            if ema is not None:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema, params_g)
            return TrainState(
                params_g=params_g, state_g=state_g, opt_g=opt_g,
                params_d=params_d, state_d=state_d, opt_d=opt_d,
                rng=rng, step=state.step + 1, params_g_ema=ema,
                ada_p=ada_p, ada_rt=ada_rt,
            ), dict(metrics, loss_g=loss_g)

        if accum > 1:
            grads, (state_d, state_g, metrics) = accum_d_grads(
                state.params_d, state.state_d, state.params_g,
                state.state_g, x_real, y_real, z_d, y_fake_d, k_gp,
                batch.get("gp_alpha"), k_aug_d, state.ada_p)
        else:
            grads, (state_d, state_g, metrics) = d_grad(
                state.params_d, state.state_d, state.params_g,
                state.state_g, x_real, y_real, z_d, y_fake_d, k_gp,
                batch.get("gp_alpha"), k_aug_d, state.ada_p)
        ada_p, ada_rt, metrics = _ada_update(metrics)
        updates, opt_d = tx_d.update(grads, state.opt_d, state.params_d)
        params_d = jax.tree.map(jnp.add, state.params_d, updates)
        if clip is not None:
            # Original WGAN critic weight clipping (Lipschitz constraint).
            params_d = jax.tree.map(
                lambda p: jnp.clip(p, -clip, clip), params_d)

        # --- G update (every n_critic-th call) ---
        z_g = batch.get("z_g")
        if z_g is None:
            z_g = jax.random.normal(k_zg, (bsz, nz), jnp.float32)
        y_fake_g = batch.get("y_fake_g")
        if y_fake_g is None:
            y_fake_g = (jax.random.randint(k_yg, (bsz,), 0, n_classes)
                        if conditional else None)

        def do_g_with_loss(args):
            params_g, opt_g, state_g, state_d, ema = args
            if accum > 1:
                grads_g, loss_g, state_g, state_d = accum_g_update(
                    params_g, state_g, params_d, state_d, z_g, y_fake_g,
                    k_aug_g, state.ada_p)
            else:
                (loss_g, (state_g, state_d)), grads_g = jax.value_and_grad(
                    g_loss, argnums=0, has_aux=True)(
                        params_g, state_g, params_d, state_d, z_g, y_fake_g,
                        k_aug_g, state.ada_p)
            updates_g, opt_g = tx_g.update(grads_g, opt_g, params_g)
            params_g = jax.tree.map(jnp.add, params_g, updates_g)
            if ema is not None:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema, params_g)
            return (params_g, opt_g, state_g, state_d, ema), loss_g

        def skip_g_with_loss(args):
            return args, jnp.zeros((), jnp.float32)

        g_args = (state.params_g, state.opt_g, state_g, state_d,
                  state.params_g_ema)
        if n_critic == 1:
            (params_g, opt_g, state_g, state_d, ema), loss_g = (
                do_g_with_loss(g_args))
        else:
            is_g_step = (state.step % n_critic) == (n_critic - 1)
            (params_g, opt_g, state_g, state_d, ema), loss_g = lax.cond(
                is_g_step, do_g_with_loss, skip_g_with_loss, g_args)

        metrics = dict(metrics, loss_g=loss_g)
        new_state = TrainState(
            params_g=params_g, state_g=state_g, opt_g=opt_g,
            params_d=params_d, state_d=state_d, opt_d=opt_d,
            rng=rng, step=state.step + 1, params_g_ema=ema,
            ada_p=ada_p, ada_rt=ada_rt,
        )
        return new_state, metrics

    donate = (0,) if cfg.train.donate else ()
    k = cfg.train.steps_per_call
    if k <= 1:
        return jax.jit(step, donate_argnums=donate)

    # Multi-step dispatch: K alternating D/G iterations compile into one
    # scan — one host dispatch per K steps. Two input forms:
    #  - device-resident dataset (step-invariant batch): scan with a
    #    constant carry-through batch;
    #  - K host minibatches stacked on a leading axis (image: (K,B,H,W,C)):
    #    scan consumes one per step (pipeline stack=K).
    def multi_step(state: TrainState, batch):
        if "dataset_images" in batch:
            def body(s, _):
                return step(s, batch)

            state, ms = jax.lax.scan(body, state, None, length=k)
        else:
            def body(s, b):
                return step(s, b)

            state, ms = jax.lax.scan(body, state, batch, length=k)
        metrics = {name: vals[-1] for name, vals in ms.items()}
        return state, metrics

    return jax.jit(multi_step, donate_argnums=donate)

