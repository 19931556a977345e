"""Export a tpugan checkpoint as a reference-style torch ``.pth``.

The exact inverse of ``ckpt/torch_import.py``: where import lets a
gan-playground user bring their trained ``.pth`` into tpugan, export lets
them go back — a model trained (or fine-tuned) on the TPU becomes a
``torch.save``'d dict of G/D ``state_dict``s in the reference's own
checkpoint contract (SURVEY §3.5: ``{'G': ..., 'D': ..., 'step': ...}``),
loadable by any torch DCGAN-family codebase and by ``tpugan import-torch``
itself (round-trip pinned by tests/test_torch_export.py).

The torch modules are the parity twins (tpugan/parity/torch_twin.py) —
the declared reference-idiom architectures whose forwards are proven
bit-close to tpugan's — so the exported weights mean in torch exactly what
they meant here: BatchNorm running statistics and spectral-norm ``u``
buffers are carried, not reinitialized.

Optimizer state IS exported (``opt_G``/``opt_D``), in torch's own native
``optimizer.state_dict()`` format, indexed by the twin's ``parameters()``
order — an order tpugan itself defines, which is what makes the export
lossless where importing a FOREIGN .pth's moments would not be (the
reference's training scripts don't standardize param order; see
ckpt/torch_import.py).  A torch user can ``opt.load_state_dict(d["opt_G"])``
and fine-tune warm; ``tpugan import-torch`` recognizes its own export (the
``tpugan_export`` marker) and restores the optax moments losslessly, so
the full tpugan→torch→tpugan round trip resumes warm on both sides.

Every export self-describes provenance: ``d["ema"]`` records whether the
``G`` slot holds EMA or raw generator weights (round-4 VERDICT: an
unmarked EMA export loses provenance on the way back in), and
``d["tpugan_export"]`` records the exporting optimizer so import never
loads moments into the wrong update rule.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

EXPORT_VERSION = 1


def _opt_moments(opt_state) -> Tuple[int, Optional[Dict], Optional[Dict]]:
    """(count, mu, nu) out of an optax chain state.

    Walks the top-level transform states: adam carries (count, mu, nu) in
    ScaleByAdamState; rmsprop carries nu alone in ScaleByRmsState (no count
    — it does no bias correction, so none is needed).
    """
    count, mu, nu = 0, None, None
    for s in opt_state:
        fields = getattr(s, "_fields", ())
        if "mu" in fields:
            mu = s.mu
        if "nu" in fields:
            nu = s.nu
        if "count" in fields:
            count = max(count, int(s.count))
    return count, mu, nu


def _moment_trees_as_torch(cfg, state, columns
                           ) -> List[Tuple[Optional[List], Optional[List]]]:
    """Layout-convert params-shaped moment trees to torch tensors in the
    twins' ``parameters()`` order.

    ``columns`` is a list of ``(g_tree, d_tree)`` pairs (each None-able;
    e.g. Adam's mu and nu); returns the matching list of
    ``(g_params, d_params)``.  Adam/RMSprop moments are elementwise
    companions of their parameters, so the jax→torch layout transform for
    a moment is EXACTLY the weight's own (ConvT HWIO→IOHW etc.).  Rather
    than duplicating those transposes, each moment tree is transplanted
    through the same twin builders the weights use — guaranteed-consistent
    by construction — with ONE scratch twin pair reused across columns.
    """
    from tpugan.parity.runners import build_torch_twins

    twins = None
    out: List[Tuple[Optional[List], Optional[List]]] = []
    for g_tree, d_tree in columns:
        repl = {}
        if g_tree is not None:
            repl["params_g"] = g_tree
        if d_tree is not None:
            repl["params_d"] = d_tree
        if not repl:
            out.append((None, None))
            continue
        twins = build_torch_twins(cfg, state.replace(**repl), into=twins)
        tg, td = twins
        pick = lambda m: [p.detach().clone() for p in m.parameters()]
        out.append((pick(tg) if g_tree is not None else None,
                    pick(td) if d_tree is not None else None))
    return out


def _effective_lr(cfg, lr: float, count: int, every: int = 1) -> float:
    """The LR actually in effect at the exported update count.

    torch's ``load_state_dict`` replaces the constructor's lr with the
    saved param_group's, so under ``optim.schedule='linear'`` exporting
    the INITIAL lr would make a "warm" torch fine-tune step at the
    un-decayed rate on a converged model (round-5 review).  Evaluate the
    same schedule ``make_optimizers`` built, at the optimizer's own count.
    """
    from tpugan.train.state import lr_schedule

    s = lr_schedule(cfg, lr, every)
    return float(s(count)) if callable(s) else float(s)


def _torch_opt_state_dict(o, lr: float, mu_list, nu_list, count: int) -> Dict:
    """torch-native ``optimizer.state_dict()`` for the configured rule.

    ``params`` indices follow the twin's ``parameters()`` order; hyperparams
    come from cfg.optim so a torch ``Adam``/``RMSprop`` built over the twin
    loads this dict directly and continues with tpugan's settings.  ``lr``
    is the schedule-effective value at ``count``, not the initial one.
    """
    import torch

    n = len(nu_list)
    if o.optimizer == "adam":
        state = {i: {"step": torch.tensor(float(count)),
                     "exp_avg": mu_list[i],
                     "exp_avg_sq": nu_list[i]} for i in range(n)}
        group = {"lr": lr, "betas": (o.beta1, o.beta2), "eps": o.eps,
                 "weight_decay": 0.0, "amsgrad": False, "maximize": False,
                 "foreach": None, "capturable": False,
                 "differentiable": False, "fused": None,
                 "params": list(range(n))}
    elif o.optimizer == "rmsprop":
        state = {i: {"step": count, "square_avg": nu_list[i]}
                 for i in range(n)}
        group = {"lr": lr, "momentum": 0.0, "alpha": o.rmsprop_decay,
                 "eps": o.eps, "centered": False, "weight_decay": 0.0,
                 "foreach": None, "maximize": False, "capturable": False,
                 "differentiable": False, "params": list(range(n))}
    else:  # pragma: no cover - make_optimizers rejects these earlier
        raise ValueError(f"unknown optimizer {o.optimizer!r}")
    return {"state": state, "param_groups": [group]}


def export_torch_checkpoint(cfg, state, use_ema: bool = False,
                            include_opt: bool = True) -> Dict:
    """TrainState -> ``{"G", "D", "step", "ema", "opt_G", "opt_D",
    "tpugan_export"}``.

    ``use_ema=True`` exports the EMA generator weights (the weights the
    Sampler/eval prefer) in place of the raw ones; requires the run to
    have tracked them (``train.ema > 0``).  The ``ema`` key marks which
    was written, so a later ``import-torch`` (or any torch consumer) can
    tell them apart.  ``include_opt=False`` drops the optimizer state for
    a weights-only .pth (smaller file, cold fine-tune).

    Caveat on ``use_ema=True`` + optimizer state: ``opt_G`` is always the
    RAW generator trajectory's moments (EMA weights are an average, not an
    optimized point — they have no moments of their own).  They remain the
    best available warm start for fine-tuning from the nearby EMA weights,
    but they do not "belong" to them; pass ``include_opt=False`` for a
    semantically clean EMA snapshot.
    """
    from tpugan.parity.runners import build_torch_twins

    if use_ema:
        if state.params_g_ema is None:
            raise ValueError(
                "use_ema=True but the checkpoint has no EMA weights "
                "(train.ema was 0 for this run)")
        state = state.replace(params_g=state.params_g_ema)
    tg, td = build_torch_twins(cfg, state)
    out = {"G": tg.state_dict(), "D": td.state_dict(),
           "step": int(state.step), "ema": bool(use_ema),
           "tpugan_export": {"version": EXPORT_VERSION,
                             "optimizer": cfg.optim.optimizer,
                             "ema": bool(use_ema)}}
    if include_opt:
        cg, mu_g, nu_g = _opt_moments(state.opt_g)
        cd, mu_d, nu_d = _opt_moments(state.opt_d)
        (mu_tg, mu_td), (nu_tg, nu_td) = _moment_trees_as_torch(
            cfg, state, [(mu_g, mu_d), (nu_g, nu_d)])
        o = cfg.optim
        if nu_tg is not None:
            lr_g = _effective_lr(cfg, o.lr_g, cg,
                                 every=max(cfg.loss.n_critic, 1))
            out["opt_G"] = _torch_opt_state_dict(o, lr_g, mu_tg, nu_tg, cg)
        if nu_td is not None:
            lr_d = _effective_lr(cfg, o.lr_d, cd)
            out["opt_D"] = _torch_opt_state_dict(o, lr_d, mu_td, nu_td, cd)
    return out
