"""Import a trained reference-style torch ``state_dict`` into tpugan.

The one asset a gan-playground user owns after training is a ``.pth``
checkpoint (SURVEY §3.5: a dict of G/D state_dicts + optimizer states +
epoch).  ``docs/MIGRATION.md`` maps every other surface; this module maps
that one: it inverts the parity harness's jax→torch transplant maps
(tpugan/parity/torch_twin.py — the declared reference-idiom stand-in
architectures) so torch weights, BatchNorm running stats, and
spectral-norm ``u`` vectors land in a tpugan ``TrainState`` that the
Sampler/Trainer/exporter consume directly.

Layout inversions (the exact inverses of torch_twin's transplant_*):

    torch Conv2d   OIHW (co,ci,kh,kw)  -> tpugan HWIO via transpose(2,3,1,0)
    torch ConvT2d  IOHW (ci,co,kh,kw)  -> tpugan HWIO via transpose(2,3,0,1)
    torch Linear   (dout,din)          -> tpugan Dense (din,dout) via .T

Optimizer state from FOREIGN .pth files is NOT imported: torch
Adam/RMSprop moments are keyed by parameter *order* inside opaque param
groups, and the reference's training scripts don't standardize that order
— a silent mis-alignment would be worse than a cold optimizer.  Those
importers get fresh optimizer state and a printed note (resume fine-tuning
warms it up within a few hundred steps).

tpugan's OWN exports are the exception: ``tpugan export-torch`` writes
``opt_G``/``opt_D`` in torch-native format indexed by the twin's
``parameters()`` order — an order tpugan defines — plus a
``tpugan_export`` marker recording the optimizer rule.  When that marker
is present (``import_optimizer_state``), the moments round-trip
losslessly back into optax state and fine-tuning resumes warm
(tests/test_torch_export.py pins bit-exactness for adam and rmsprop).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# Keys every torch module carries that have no tpugan counterpart.
_IGNORED_SUFFIXES = ("num_batches_tracked",)


def _a(t) -> np.ndarray:
    """torch tensor -> float32/int numpy array."""
    a = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.ascontiguousarray(a)


def _strip_module_prefix(sd: Dict) -> Dict:
    """Drop DataParallel's 'module.' wrapper if present."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


class _SD:
    """state_dict view that records consumed keys so leftovers (an
    architecture mismatch) fail loudly instead of silently half-importing."""

    def __init__(self, sd: Dict):
        self.sd = _strip_module_prefix(sd)
        self.used = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"torch state_dict is missing {key!r} — wrong architecture "
                f"or wrong preset? (have e.g. {sorted(self.sd)[:6]} ...)")
        self.used.add(key)
        return _a(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def assert_exhausted(self, what: str) -> None:
        left = [k for k in self.sd if k not in self.used
                and not k.endswith(_IGNORED_SUFFIXES)]
        if left:
            raise ValueError(
                f"{what}: {len(left)} torch keys had no tpugan destination "
                f"(wrong preset / architecture?): {left[:8]}")


def _copy_tree(tree):
    """Deep host copy of a params/state pytree as mutable plain dicts."""
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.array(np.asarray(tree))


def _import_bn(sd: _SD, prefix: str, bn_params: Dict, bn_state: Dict) -> None:
    bn_params["scale"] = sd.take(f"{prefix}.weight")
    bn_params["bias"] = sd.take(f"{prefix}.bias")
    bn_state["mean"] = sd.take(f"{prefix}.running_mean")
    bn_state["var"] = sd.take(f"{prefix}.running_var")


def import_g(sd: Dict, params: Dict, state: Dict,
             _check_exhausted: bool = True) -> Tuple[Dict, Dict]:
    """TorchGenerator.state_dict() -> (params_g, state_g) matching the
    tpugan Generator templates (shape/layout-converted copies)."""
    sd = sd if isinstance(sd, _SD) else _SD(sd)
    params, state = _copy_tree(params), _copy_tree(state)
    head = params["head"]
    head["dense"]["w"] = sd.take("head.weight").T
    if "b" in head["dense"]:
        head["dense"]["b"] = sd.take("head.bias")
    if "bn" in head:
        _import_bn(sd, "head_bn", head["bn"], state["head"]["bn"])
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        # blocks is Sequential(ConvT, BN|Identity, ReLU) triplets
        blk["conv"]["w"] = sd.take(f"blocks.{3*i}.weight").transpose(
            2, 3, 0, 1)
        if "b" in blk["conv"]:
            blk["conv"]["b"] = sd.take(f"blocks.{3*i}.bias")
        if "bn" in blk:
            _import_bn(sd, f"blocks.{3*i + 1}", blk["bn"],
                       state[f"block{i}"]["bn"])
        i += 1
    params["final"]["conv"]["w"] = sd.take("final.weight").transpose(
        2, 3, 0, 1)
    params["final"]["conv"]["b"] = sd.take("final.bias")
    if _check_exhausted:
        sd.assert_exhausted("import_g")
    return params, state


def import_d(sd: Dict, params: Dict, state: Dict,
             _check_exhausted: bool = True) -> Tuple[Dict, Dict]:
    """TorchDiscriminator.state_dict() -> (params_d, state_d), including
    BatchNorm running stats and spectral-norm u buffers."""
    sd = sd if isinstance(sd, _SD) else _SD(sd)
    params, state = _copy_tree(params), _copy_tree(state)
    idx = 0  # torch Sequential index: conv, (bn), leaky per block
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        blk["conv"]["w"] = sd.take(f"features.{idx}.weight").transpose(
            2, 3, 1, 0)
        if "b" in blk["conv"]:
            blk["conv"]["b"] = sd.take(f"features.{idx}.bias")
        if sd.has(f"features.{idx}.u"):  # SNConv2d buffer
            state[f"block{i}"]["conv"]["u"] = sd.take(f"features.{idx}.u")
        idx += 1
        if "bn" in blk:
            _import_bn(sd, f"features.{idx}", blk["bn"],
                       state[f"block{i}"]["bn"])
            idx += 1
        idx += 1  # LeakyReLU
        i += 1
    params["tail"]["dense"]["w"] = sd.take("tail.weight").T
    params["tail"]["dense"]["b"] = sd.take("tail.bias")
    if sd.has("tail.u"):  # SNLinear buffer
        state["tail"]["dense"]["u"] = sd.take("tail.u")
    if _check_exhausted:
        sd.assert_exhausted("import_d")
    return params, state


def import_cond_g(sd: Dict, params: Dict, state: Dict) -> Tuple[Dict, Dict]:
    """TorchCondGenerator.state_dict() (embed + nested 'g.') -> cdcgan G."""
    sd = _SD(sd)
    params, state = _copy_tree(params), _copy_tree(state)
    params["embed"]["table"] = sd.take("embed.weight")
    sub = _SD({k[len("g."):]: v for k, v in sd.sd.items()
               if k.startswith("g.")})
    params["g"], state["g"] = import_g(sub, params["g"], state.get("g", {}))
    sd.used |= {f"g.{k}" for k in sub.used}
    sd.assert_exhausted("import_cond_g")
    return params, state


def import_cond_d(sd: Dict, params: Dict, state: Dict) -> Tuple[Dict, Dict]:
    """TorchCondDiscriminator.state_dict() (embed + proj + nested 'd.')."""
    sd = _SD(sd)
    params, state = _copy_tree(params), _copy_tree(state)
    params["embed"]["table"] = sd.take("embed.weight")
    params["proj"]["w"] = sd.take("proj.weight").T
    params["proj"]["b"] = sd.take("proj.bias")
    sub = _SD({k[len("d."):]: v for k, v in sd.sd.items()
               if k.startswith("d.")})
    params["d"], state["d"] = import_d(sub, params["d"], state.get("d", {}))
    sd.used |= {f"d.{k}" for k in sub.used}
    sd.assert_exhausted("import_cond_d")
    return params, state


# ---------------------------------------------------------------------------
# Whole-checkpoint import
# ---------------------------------------------------------------------------

# Key aliases under which reference-style .pth checkpoints store the two
# state_dicts (SURVEY §3.5's dict-of-everything contract).
_G_KEYS = ("G", "g", "generator", "netG", "g_state", "model_g",
           "generator_state_dict")
_D_KEYS = ("D", "d", "discriminator", "netD", "d_state", "model_d",
           "discriminator_state_dict")
_STEP_KEYS = ("step", "iter", "iteration", "global_step")


def split_reference_checkpoint(obj) -> Tuple[Optional[Dict], Optional[Dict],
                                             int]:
    """A loaded .pth is either a bare state_dict (G or D alone) or a dict
    holding both under conventional keys; return (g_sd, d_sd, step)."""
    if not isinstance(obj, dict):
        raise ValueError(f"expected a dict checkpoint, got {type(obj)}")
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    g_sd = next((obj[k] for k in _G_KEYS if isinstance(obj.get(k), dict)),
                None)
    d_sd = next((obj[k] for k in _D_KEYS if isinstance(obj.get(k), dict)),
                None)
    step = 0
    for k in _STEP_KEYS:
        if isinstance(obj.get(k), (int, float)):
            step = int(obj[k])
            break
    # NOTE: an 'epoch' field alone is NOT converted — epochs don't map to
    # steps without the original loader size; importers pass --step if they
    # know it.
    if g_sd is None and d_sd is None:
        # bare state_dict: tell G from D by their distinctive keys
        # (check D first — 'embed' appears in BOTH conditional nets, but
        # 'proj'/'features'/'d.' only in D)
        keys = {k.split(".")[0] for k in obj}
        if keys & {"features", "tail", "proj", "d"}:
            d_sd = obj
        elif keys & {"head", "head_bn", "blocks", "final", "g"}:
            g_sd = obj
        else:
            raise ValueError(
                "could not locate G/D state_dicts in the checkpoint "
                f"(top-level keys: {sorted(obj)[:10]})")
    return g_sd, d_sd, step


def _assert_shapes_match(what: str, imported, template) -> None:
    """Same keys but different widths (e.g. weights trained at ngf=64
    imported into an ngf=8 preset) would otherwise land silently — the
    assignment just swaps the array.  Walk both trees and fail loudly."""
    bad = []

    def walk(path, a, b):
        if isinstance(b, dict):
            for k in b:
                walk(f"{path}.{k}" if path else k, a[k], b[k])
        else:
            sa, sb = tuple(np.shape(a)), tuple(np.shape(np.asarray(b)))
            if sa != sb:
                bad.append(f"{path}: torch {sa} vs tpugan {sb}")

    walk("", imported, template)
    if bad:
        raise ValueError(
            f"{what}: architecture mismatch — {len(bad)} tensors disagree "
            f"in shape (wrong preset or nz/ngf/ndf overrides?): "
            + "; ".join(bad[:6]))


# Keys under which tpugan export-torch stores the optimizer state_dicts —
# EXACTLY the exporter's own, no foreign aliases ('optimizerG' etc.):
# moments are only trusted under the tpugan_export marker, and a merged
# dict could carry the marker next to a foreign optimizer whose
# parameters() order we never promised (round-5 review).
_OPT_G_KEYS = ("opt_G",)
_OPT_D_KEYS = ("opt_D",)


def extract_export_meta(obj) -> Tuple[Optional[Dict], Optional[Dict],
                                      Optional[Dict]]:
    """(tpugan_export marker, opt_G sd, opt_D sd) from a loaded .pth —
    all None-able; callers gate optimizer import on the marker."""
    if not isinstance(obj, dict):
        return None, None, None
    meta = obj.get("tpugan_export")
    if not isinstance(meta, dict):
        meta = None
    opt_g = next((obj[k] for k in _OPT_G_KEYS
                  if isinstance(obj.get(k), dict)), None)
    opt_d = next((obj[k] for k in _OPT_D_KEYS
                  if isinstance(obj.get(k), dict)), None)
    return meta, opt_g, opt_d


def _rebuild_moment_tree(twin, opt_sd: Dict, field: str, import_fn,
                         params, net_state):
    """One torch moment column (exp_avg / exp_avg_sq / square_avg) -> a
    params-shaped jax tree.

    The inverse of export's moments-as-weights transplant: substitute the
    moment tensors for the parameter entries of the twin's state_dict (the
    index→name map is ``named_parameters()`` order, which tpugan's own
    export defined) and run the WEIGHT importer on it — the layout
    transposes are guaranteed to match the weights' own by construction.
    """
    names = [n for n, _ in twin.named_parameters()]
    st = opt_sd.get("state", {})
    if len(st) != len(names):
        raise ValueError(
            f"optimizer state has {len(st)} param entries but the "
            f"architecture has {len(names)} parameters — wrong preset or "
            "a foreign checkpoint (only tpugan-exported .pth carry "
            "importable optimizer state)")
    fake = dict(twin.state_dict())
    for i, name in enumerate(names):
        entry = st[i] if i in st else st[str(i)]
        if field not in entry:
            raise ValueError(
                f"optimizer state entry {i} has no {field!r} "
                f"(have {sorted(entry)}) — optimizer rule mismatch?")
        fake[name] = entry[field]
    tree, _ = import_fn(fake, params, net_state)
    return tree


def _opt_count(opt_sd: Dict) -> int:
    for entry in opt_sd.get("state", {}).values():
        if "step" in entry:
            return int(entry["step"])
    return 0


def import_optimizer_state(cfg, state, opt_g_sd: Optional[Dict] = None,
                           opt_d_sd: Optional[Dict] = None):
    """Restore optax opt_g/opt_d from tpugan-exported torch optimizer
    state_dicts (the warm half of the tpugan→torch→tpugan round trip).

    ONLY call this for checkpoints carrying the ``tpugan_export`` marker
    with a matching ``optimizer`` — the index→param mapping is the twin's
    ``parameters()`` order, which foreign checkpoints don't promise.
    """
    import jax
    import jax.numpy as jnp

    from tpugan.parity.runners import build_torch_twins
    from tpugan.train.state import make_optimizers

    # Build (and weight-transplant) only the twin(s) whose moments are
    # actually being restored — a single-net restore (e.g. the CLI's --g
    # override dropping G's moments) shouldn't pay for the other net's
    # module construction + tensor copies (round-5 review).
    only = ("g" if opt_g_sd is not None else "") + \
           ("d" if opt_d_sd is not None else "")
    if not only:
        return state
    twin_g, twin_d = build_torch_twins(cfg, state, only=only)
    tx_g, tx_d = make_optimizers(cfg)
    conditional = cfg.model.arch == "cdcgan"
    o = cfg.optim

    def rebuild(twin, tx, opt_sd, import_fn, params, net_state):
        if o.optimizer == "adam":
            mu = _rebuild_moment_tree(twin, opt_sd, "exp_avg",
                                      import_fn, params, net_state)
            nu = _rebuild_moment_tree(twin, opt_sd, "exp_avg_sq",
                                      import_fn, params, net_state)
        else:  # rmsprop: second moment only, no bias-correction count
            mu = None
            nu = _rebuild_moment_tree(twin, opt_sd, "square_avg",
                                      import_fn, params, net_state)
        count = _opt_count(opt_sd)
        cast = lambda init_tree, tree: jax.tree.map(
            lambda i, v: jnp.asarray(np.asarray(v), i.dtype),
            init_tree, tree)
        new = []
        for s in tx.init(params):
            fields = getattr(s, "_fields", ())
            kw = {}
            if "mu" in fields and mu is not None:
                kw["mu"] = cast(s.mu, mu)
            if "nu" in fields and nu is not None:
                kw["nu"] = cast(s.nu, nu)
            if "count" in fields:
                kw["count"] = jnp.asarray(count, jnp.int32)
            new.append(s._replace(**kw) if kw else s)
        return tuple(new)

    repl = {}
    if opt_g_sd is not None:
        repl["opt_g"] = rebuild(
            twin_g, tx_g, opt_g_sd,
            import_cond_g if conditional else import_g,
            state.params_g, state.state_g)
    if opt_d_sd is not None:
        repl["opt_d"] = rebuild(
            twin_d, tx_d, opt_d_sd,
            import_cond_d if conditional else import_d,
            state.params_d, state.state_d)
    return state.replace(**repl) if repl else state


def import_torch_state(cfg, g_sd: Optional[Dict] = None,
                       d_sd: Optional[Dict] = None, step: int = 0):
    """Build a tpugan TrainState for ``cfg`` with G/D weights imported from
    torch state_dicts.  Missing nets keep their seeded init; optimizer
    state is FRESH by design (see module docstring)."""
    from tpugan.models import build_models
    from tpugan.train.state import create_train_state

    g, d = build_models(cfg.model, cfg.train.precision)
    state = create_train_state(cfg, g, d)
    repl = {}
    conditional = cfg.model.arch == "cdcgan"
    if g_sd is not None:
        imp = import_cond_g if conditional else import_g
        pg, sg = imp(g_sd, state.params_g, state.state_g)
        _assert_shapes_match("import G", pg, state.params_g)
        _assert_shapes_match("import G state", sg, state.state_g)
        repl.update(params_g=pg, state_g=sg)
        if state.params_g_ema is not None:
            repl["params_g_ema"] = _copy_tree(pg)
    if d_sd is not None:
        imp = import_cond_d if conditional else import_d
        pd, sdd = imp(d_sd, state.params_d, state.state_d)
        _assert_shapes_match("import D", pd, state.params_d)
        _assert_shapes_match("import D state", sdd, state.state_d)
        repl.update(params_d=pd, state_d=sdd)
    if step:
        repl["step"] = np.asarray(step, np.int32)
    return state.replace(**repl)
