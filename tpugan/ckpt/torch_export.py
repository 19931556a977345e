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

Optimizer state is NOT exported, mirroring import's reasoning: torch
moment tensors are keyed by parameter order inside opaque param groups and
there is no canonical order to target; a silent misalignment would be
worse than a cold optimizer.
"""

from __future__ import annotations

from typing import Dict


def export_torch_checkpoint(cfg, state, use_ema: bool = False) -> Dict:
    """TrainState -> ``{"G": state_dict, "D": state_dict, "step": int}``.

    ``use_ema=True`` exports the EMA generator weights (the weights the
    Sampler/eval prefer) in place of the raw ones; requires the run to
    have tracked them (``train.ema > 0``).
    """
    from tpugan.parity.runners import build_torch_twins

    if use_ema:
        if state.params_g_ema is None:
            raise ValueError(
                "use_ema=True but the checkpoint has no EMA weights "
                "(train.ema was 0 for this run)")
        state = state.replace(params_g=state.params_g_ema)
    tg, td = build_torch_twins(cfg, state)
    return {"G": tg.state_dict(), "D": td.state_dict(),
            "step": int(state.step)}
