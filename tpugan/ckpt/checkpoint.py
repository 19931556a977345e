"""Checkpoint save/resume for the full TrainState pytree.

Contract (mirrors the reference's ``torch.save``/``--resume`` dict of
G/D/optG/optD/epoch, extended for exact resume): one checkpoint carries G and
D parameters, both optimizer states, BatchNorm running statistics,
spectral-norm u vectors, the RNG key, and the step counter — restoring it
continues training bit-for-bit, including the noise stream.

Implementation: orbax CheckpointManager with async saves (the device keeps
training while the previous state serializes) and bounded retention.  The
run config is saved alongside as JSON so a checkpoint is self-describing.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)
        # highest step handed to save() (an async save isn't in
        # latest_step() until it commits) — used to detect rewrites
        self._last_saved_step: Optional[int] = None

    def save(self, step: int, state: Any, config_json: str = "") -> None:
        ocp = self._ocp
        step = int(step)
        # torch.save overwrite semantics: orbax refuses to write a step
        # number that already exists (raises StepAlreadyExistsError with
        # force=True, silently skips without — verified on orbax 0.11.32,
        # where force means "ignore save_interval", not "overwrite") —
        # which would leave STALE weights in a reused directory.
        # Delete-then-save instead; the delete→save window is not atomic,
        # so a crash inside it loses this step (resume falls back to the
        # previous retained step — max_to_keep>1 keeps that fallback real).
        # Wait for in-flight async saves only when this step COULD collide
        # (a still-serializing save of the same step is not yet listed by
        # all_steps()).  Normal monotonic saves skip the wait and keep the
        # async overlap the class advertises — an unconditional wait made
        # every save block on the previous serialization.
        latest = self.mgr.latest_step()
        if self._last_saved_step is not None and (
                latest is None or self._last_saved_step > latest):
            latest = self._last_saved_step
        if latest is not None and step <= latest:
            self.mgr.wait_until_finished()
            if step in (self.mgr.all_steps() or []):
                self.mgr.delete(step)
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        self._last_saved_step = step
        if config_json and jax.process_index() == 0:
            # checkpoint saves run on ALL processes in multi-host runs
            # (orbax coordinates the array writes itself) — the JSON side
            # file must have ONE writer, and an atomic rename so a reader
            # or crash never sees a torn file
            path = os.path.join(self.directory, "config.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(config_json)
            os.replace(tmp, path)

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``template`` (a freshly-created
        TrainState); returns the restored pytree."""
        ocp = self._ocp
        if step is None:
            step = self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template)
        try:
            return self.mgr.restore(
                int(step), args=ocp.args.StandardRestore(abstract))
        except ValueError as first_err:
            # Cross-topology restore (e.g. a TPU-trained checkpoint opened
            # on a CPU host for export/serving): the sharding metadata in
            # the file names devices that don't exist here, so orbax
            # demands explicit concrete shardings.  Use the TEMPLATE's own
            # leaf shardings — the freshly-created state is already placed
            # where the caller wants the restore (replicated/FSDP mesh in
            # the Trainer, the local default device standalone), so this
            # restores directly into placement without staging the whole
            # state through one device.
            # Don't key on orbax's exact message ("sharding passed to
            # deserialization" on 0.11.x — wording drifts across versions):
            # attempt the fallback for ANY restore ValueError and re-raise
            # the ORIGINAL error if the fallback fails too (a genuine
            # template/checkpoint mismatch fails both ways).
            local = jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0])
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=getattr(x, "sharding", None) or local),
                template)
            try:
                return self.mgr.restore(
                    int(step), args=ocp.args.StandardRestore(abstract))
            except Exception:
                raise first_err

    def wait(self) -> None:
        """Block until any in-flight async save completes."""
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
