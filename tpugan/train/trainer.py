"""The public trainer API.

``Trainer(cfg).train()`` reproduces the reference's training contract
(alternating D/G optimization, periodic fixed-noise sample grids, periodic
checkpoints, scalar logging, ``--resume``) on top of the single jitted train
step.  Host-side behaviour is deliberately thin:

- The step function runs async; the host only synchronizes on the metrics it
  actually logs (every ``log_every`` steps), so the device queue stays full.
- The input pipeline prefetches uint8 batches to the device in a background
  thread (see data/pipeline.py).
- Checkpoints save asynchronously (orbax) off the critical path.
- The north-star counter ``images_per_sec`` (data images consumed per wall
  second per chip) is computed between log points and logged with the losses.
"""

from __future__ import annotations

import os
import signal
import threading
import time
from typing import Dict, Optional

import jax
import numpy as np

from tpugan.ckpt import CheckpointManager
from tpugan.configs import Config
from tpugan.data import load_dataset, make_input_pipeline
from tpugan.models import build_models
from tpugan.sample import Sampler
from tpugan.train.state import TrainState, create_train_state
from tpugan.train.steps import build_train_step
from tpugan.utils import MetricsLogger, make_grid, save_png, to_uint8


# Graceful preemption for production runs: on the scheduler's eviction
# signal (SIGTERM; SIGINT likewise) the trainer finishes the in-flight
# dispatch, saves a checkpoint, and returns cleanly — the run resumes
# bit-exactly via ``train.resume``.  A second signal restores the default
# disposition and re-raises it (force-quit).  Handlers can only be
# installed on the main thread; elsewhere preemption just isn't armed.
_PREEMPTED = threading.Event()


class NonFiniteLossError(RuntimeError):
    """Raised (with a checkpoint already saved) when train.halt_on_nonfinite
    is set and a logged metric goes NaN/inf — the GAN diverged."""


class _NullLogger:
    """Metrics sink for non-main processes in a multi-host run: the numbers
    are identical on every process (replicated), so only process 0 writes."""

    def log(self, *a, **k):
        pass

    def log_image(self, *a, **k):
        pass

    def close(self):
        pass


def _on_preempt(signum, frame):
    if _PREEMPTED.is_set():  # second signal: give up gracefulness
        signal.signal(signum, signal.SIG_DFL)
        signal.raise_signal(signum)
    _PREEMPTED.set()


def _arm_preemption():
    """Install the graceful handlers; returns the previous handlers dict
    (to restore when training ends) or None off the main thread."""
    if threading.current_thread() is not threading.main_thread():
        return None
    _PREEMPTED.clear()
    prev = {}
    for s in (signal.SIGTERM, signal.SIGINT):
        prev[s] = signal.signal(s, _on_preempt)
    return prev


def _disarm_preemption(prev) -> None:
    if prev:
        for s, h in prev.items():
            signal.signal(s, h)


class Trainer:
    def __init__(self, cfg: Config, data: Optional[dict] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        # Config validation FIRST — before any process-global side effect
        # (set_spatial_mesh below mutates trace-time dispatch state that
        # must not leak out of a rejected constructor).
        if cfg.train.fsdp_shards > 0 and cfg.train.spatial_shards > 0:
            raise ValueError(
                "train.fsdp_shards and train.spatial_shards both claim "
                "the second mesh axis; choose one")
        if (cfg.train.steps_per_call > 1
                and cfg.train.total_steps % cfg.train.steps_per_call):
            # the scan length is compiled in, so a partial last dispatch
            # would silently OVERSHOOT total_steps by up to k-1 optimizer
            # updates — sweeps comparing configs at a fixed budget must
            # compare equal step counts
            raise ValueError(
                f"train.total_steps={cfg.train.total_steps} is not a "
                f"multiple of train.steps_per_call="
                f"{cfg.train.steps_per_call}; the compiled scan advances "
                f"k steps per dispatch, so the run would overshoot — "
                f"round total_steps or change steps_per_call")
        if (cfg.data.sampling == "epoch"
                and (cfg.train.total_steps + 1) * cfg.data.batch_size
                >= 2 ** 31):
            raise ValueError(
                f"sampling='epoch' computes run positions as "
                f"step*batch_size in on-device int32; total_steps="
                f"{cfg.train.total_steps} x batch_size="
                f"{cfg.data.batch_size} overflows 2^31 and would silently "
                f"corrupt the epoch permutation — use "
                f"sampling='replacement' for runs this long")
        if (cfg.data.device_resident and cfg.train.spatial_shards > 0
                and jax.process_count() > 1):
            raise ValueError(
                "data.device_resident with train.spatial_shards is not "
                "supported in multi-host runs: the dataset sharding is "
                "H-sharded, so make_array_from_process_local_data would "
                "treat each process's full dataset copy as its local shard "
                "(wrong global shape) — use the host pipeline "
                "(data.device_resident=false) or drop spatial_shards")
        self._restored = False  # set by restore(): gates watermark reload
        self._best_cleared = False  # first fresh train() resets ckpt/best
        # NOTE: train.kernels affects SAMPLING/EVAL only (the Pallas kernels
        # have no autodiff rules — the differentiated train step always uses
        # the XLA conv path; see DESIGN.md §4).  train.fuse_stats is the one
        # train-path Pallas fusion (conv+BN-stats, custom_vjp); single-chip
        # only — under DP the BN stats must reduce cross-replica, which the
        # unfused jnp.mean path gets from XLA for free.
        from tpugan import ops

        self._fuse_mode = ("off" if (mesh is not None
                                     and len(mesh.devices.flat) > 1)
                           else cfg.train.fuse_stats)
        ops.set_fuse_stats(self._fuse_mode)
        self.g, self.d = build_models(cfg.model, cfg.train.precision)
        self.state: TrainState = create_train_state(cfg, self.g, self.d)
        self.mesh = mesh
        # how restore() re-places a freshly-restored host state on the mesh
        from tpugan.parallel import shard_train_state as _place_dp

        self._place_state = _place_dp
        self.batch_sharding = None
        if mesh is not None:
            from tpugan.parallel import shard_train_state, batch_sharding

            self.state = shard_train_state(self.state, mesh)
            self.batch_sharding = batch_sharding(mesh)
        # Spatial (H-axis) sharding for ≥256px maps: hold the trace-time
        # context for the whole run; the ops seam routes qualifying convs
        # to the halo primitives (parallel/spatial.py).
        self.spatial_mesh = None
        if cfg.train.spatial_shards > 0 and (mesh is not None
                                             or cfg.train.mesh_shape):
            # 2-D DP x spatial: batch over ('data',), feature-map H over
            # ('space',) — gradient psums ride the data axis, halo
            # ppermutes the space axis.  Supersedes any 1-D mesh passed in.
            from tpugan.parallel import shard_train_state
            from tpugan.parallel.spatial import (make_mesh_dp_spatial,
                                                 set_spatial_mesh)

            n_data = (cfg.train.mesh_shape or
                      len(mesh.devices.flat) // cfg.train.spatial_shards)
            mesh = make_mesh_dp_spatial(n_data, cfg.train.spatial_shards)
            self.spatial_mesh = mesh
            set_spatial_mesh(mesh)
            # redo the placement done above for the superseded 1-D mesh
            from tpugan.parallel import batch_sharding

            self.mesh = mesh
            self.state = shard_train_state(self.state, mesh)
            self.batch_sharding = batch_sharding(mesh)
        elif cfg.train.spatial_shards > 0 and mesh is None:
            import numpy as _np
            from jax.sharding import Mesh

            from tpugan.parallel.spatial import set_spatial_mesh

            devs = jax.devices()
            if len(devs) < cfg.train.spatial_shards:
                raise ValueError(
                    f"train.spatial_shards={cfg.train.spatial_shards} but "
                    f"only {len(devs)} device(s) are visible — refusing to "
                    f"build a silently smaller mesh (per-shard extent and "
                    f"HBM footprint would double); fail like make_mesh")
            devs = devs[:cfg.train.spatial_shards]
            self.spatial_mesh = Mesh(_np.array(devs), ("space",))
            set_spatial_mesh(self.spatial_mesh)
        # FSDP: shard params + optimizer moments over a second 'model'
        # axis (ZeRO-3 as shardings — parallel/fsdp.py); supersedes the
        # plain-DP placement done above, same compiled step.
        if cfg.train.fsdp_shards > 0:
            from tpugan.parallel.fsdp import (
                batch_sharding_2d,
                make_mesh_2d,
                shard_train_state_fsdp,
            )

            n_model = cfg.train.fsdp_shards
            n_data = (cfg.train.mesh_shape
                      or max(len(jax.devices()) // n_model, 1))
            self.mesh = make_mesh_2d(n_data, n_model)
            self.state = shard_train_state_fsdp(self.state, self.mesh)
            self.batch_sharding = batch_sharding_2d(self.mesh)
            self._place_state = shard_train_state_fsdp

        # fuse_stats guard, re-checked against the FINAL placement (the 2-D
        # DP x spatial branch above may have built a multi-device mesh after
        # the first check): the fused BN-stats path is single-chip only.
        if ((self.mesh is not None and len(self.mesh.devices.flat) > 1)
                or self.spatial_mesh is not None):
            ops.set_fuse_stats("off")
        # Step built AFTER mesh resolution: device-resident gathers need the
        # final mesh to shard their in-step batch (see build_train_step).
        self.step_fn = build_train_step(cfg, self.g, self.d, mesh=self.mesh)
        self._data = data  # injected dataset (tests); else loaded lazily
        self.logger: Optional[MetricsLogger] = None

    # -- data ---------------------------------------------------------------
    def _dataset(self) -> dict:
        if self._data is None:
            c = self.cfg
            self._data = load_dataset(
                c.data.dataset, c.data.data_dir,
                image_size=c.model.image_size, channels=c.model.channels,
                synthetic_size=c.data.synthetic_size, seed=c.train.seed,
                n_classes=c.model.n_classes, streaming=c.data.streaming,
                max_ram_mb=c.data.max_ram_mb)
        return self._data

    def _gen_params(self):
        """Generator params for sampling/eval: EMA weights when enabled."""
        if self.state.params_g_ema is not None:
            return self.state.params_g_ema
        return self.state.params_g

    # -- checkpoints --------------------------------------------------------
    def save_checkpoint(self, ckpt: CheckpointManager) -> None:
        ckpt.save(int(self.state.step), self.state, self.cfg.to_json())

    def restore(self, path_or_dir: str) -> int:
        ckpt = CheckpointManager(path_or_dir)
        self.state = TrainState(**ckpt.restore(dict(self.state)))
        if self.mesh is not None:
            # replicated for DP, FSDP-sharded under fsdp_shards
            self.state = self._place_state(self.state, self.mesh)
        self._restored = True
        return int(self.state.step)

    # -- keep_best watermark -------------------------------------------------
    def _best_meta_path(self) -> str:
        return os.path.join(self.cfg.train.ckpt_dir, "best", "best_fid.json")

    def _load_best_meta(self):
        """The banked keep_best watermark as {'fid', 'step'}, or None.
        The one reader of the watermark file's schema — external consumers
        (e.g. benchmarks/config_sweep.py) go through this, not the path."""
        import json

        try:
            with open(self._best_meta_path()) as f:
                meta = json.load(f)
            return {"fid": float(meta["fid"]), "step": int(meta["step"])}
        except (FileNotFoundError, KeyError, ValueError, TypeError):
            return None

    def _load_best_watermark(self):
        meta = self._load_best_meta()
        return None if meta is None else meta["fid"]

    def _save_best_watermark(self, step: int, fid: float) -> None:
        import json

        if jax.process_index() != 0:
            # multi-host: the FID is replicated; only process 0 writes the
            # shared file (same gating as PNGs/metrics — concurrent
            # os.replace on one path would race)
            return
        path = self._best_meta_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"fid": float(fid), "step": int(step)}, f)
        os.replace(tmp, path)

    # -- training -----------------------------------------------------------
    def train(self, total_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total_steps = total_steps or cfg.train.total_steps
        out_dir = cfg.train.out_dir
        # Multi-host: compute runs on every process (single-program SPMD
        # over the global mesh); host side effects — metric files, PNG
        # grids — are written once, by process 0.  Checkpoint saves run on
        # ALL processes (orbax coordinates the distributed write itself).
        multiproc = jax.process_count() > 1 and self.mesh is not None
        is_main = jax.process_index() == 0
        os.makedirs(out_dir, exist_ok=True)
        self.logger = logger = (MetricsLogger(out_dir) if is_main
                                else _NullLogger())
        ckpt = CheckpointManager(cfg.train.ckpt_dir)

        if cfg.train.resume:
            start = self.restore(cfg.train.resume)
            print(f"resumed from step {start}")
        elif not self._restored:
            prev = ckpt.latest_step()
            if prev is not None and prev > int(self.state.step):
                # reused ckpt_dir: same-numbered steps are overwritten, but
                # the old run's HIGHER steps would still win latest_step()
                # on a later resume — tell the user now, not at deploy time
                print(f"warning: {cfg.train.ckpt_dir} already holds step "
                      f"{prev} from a previous run; this fresh run starts "
                      f"at 0 — pass train.resume to continue the old run, "
                      f"or use a fresh ckpt_dir to avoid mixed checkpoints")

        data = self._dataset()
        if cfg.model.arch == "cdcgan" and cfg.model.n_classes > 1:
            # The dataset loaders fall back to all-zero labels when the
            # label file is absent (MNIST labels idx, CelebA
            # list_attr_celeba.txt) — fine for unconditional training,
            # garbage for a conditional model: every real image would be
            # class 0 while y_fake is uniform over n_classes.
            lab = data.get("labels")
            lab = np.asarray(lab) if lab is not None else np.empty(0)
            if lab.size and int(lab.max()) == 0:
                raise ValueError(
                    "conditional training (model.arch='cdcgan', "
                    f"n_classes={cfg.model.n_classes}) but the dataset's "
                    "labels are all zero — label file missing? (MNIST: "
                    "train-labels-idx1-ubyte[.gz]; CelebA: "
                    "list_attr_celeba.txt)")
        k_steps = max(cfg.train.steps_per_call, 1)
        spatial_sh = None
        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # image batches sharded on H over the spatial mesh
            spatial_sh = NamedSharding(self.spatial_mesh,
                                       P(None, "space", None, None))
        if cfg.data.device_resident and hasattr(data["images"], "gather"):
            raise ValueError(
                "data.device_resident requires the decoded dataset in "
                "memory; this dataset is streaming (larger than "
                f"data.max_ram_mb={cfg.data.max_ram_mb}) — set "
                "data.streaming='off' or drop device_resident")
        if cfg.data.device_resident:
            import itertools

            ds_sharding = spatial_sh  # H-sharded when spatially sharded
            lbl_sharding = None
            if ds_sharding is None and self.mesh is not None:
                # Plain DP mesh: replicate the HBM dataset onto the mesh
                # (committed placement — a bare device_put would pin it to
                # one device and clash with the mesh-sharded state under
                # jit); the step shards each gathered batch over 'data'.
                from jax.sharding import NamedSharding, PartitionSpec as P

                ds_sharding = NamedSharding(self.mesh, P())
            if self.mesh is not None or self.spatial_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                lbl_sharding = NamedSharding(
                    self.mesh or self.spatial_mesh, P())
            if multiproc:
                # every process holds the full dataset; assemble the global
                # (replicated) array — device_put cannot target another
                # process's devices
                put = lambda v, sh: jax.make_array_from_process_local_data(  # noqa: E731
                    sh, np.asarray(v))
            else:
                put = jax.device_put
            dev_batch = {"dataset_images": put(data["images"], ds_sharding)}
            if cfg.model.arch == "cdcgan":
                dev_batch["dataset_labels"] = put(data["labels"],
                                                  lbl_sharding)
            pipeline = itertools.repeat(dev_batch)
        else:
            # the pipeline applies one sharding to every batch entry, so
            # spatial only when unstacked and label-free (otherwise jit
            # reshards at the step boundary — same numbers)
            sharding = self.batch_sharding or (
                spatial_sh if k_steps == 1 and cfg.model.arch != "cdcgan"
                else None)
            if k_steps > 1 and self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # stacked batches: (K, batch, ...) — shard the batch axis
                sharding = NamedSharding(self.mesh, P(None, "data"))
            if multiproc and sharding is None:
                # multi-host needs a mesh placement for the global batch
                from jax.sharding import NamedSharding, PartitionSpec as P

                sharding = NamedSharding(self.mesh, P("data"))
            pipeline = make_input_pipeline(
                data, cfg.data.batch_size, seed=cfg.train.seed,
                with_labels=cfg.model.arch == "cdcgan",
                sharding=sharding, stack=k_steps, multiprocess=multiproc,
                # resume: continue the deterministic stream where the
                # checkpoint left off instead of replaying epoch 0
                start_step=int(self.state.step))

        sampler = Sampler(cfg, self.g, self.state.params_g,
                          self.state.state_g)
        fixed_z = sampler.noise(64, cfg.train.seed)
        fixed_y = sampler.labels(64, cfg.train.seed)

        last_metrics: Dict[str, float] = {}
        t0 = time.perf_counter()
        imgs_since = 0
        pending = None  # metrics pytree still on device

        profiling = False
        it = iter(pipeline)
        start_step = int(self.state.step)
        prev_handlers = _arm_preemption()
        preemptible = prev_handlers is not None
        preempted = False
        best_ckpt = None
        if not hasattr(self, "_best_fid"):
            self._best_fid = float("inf")
        if cfg.train.keep_best:
            if self._restored:
                # The watermark must survive preemption: a RESUMED run
                # (via train.resume OR an explicit Trainer.restore()) that
                # reset it to inf would overwrite ckpt_dir/best with a
                # worse model on its first eval — exactly the preemptible
                # runs keep_best targets.
                prev_best = self._load_best_watermark()
                if prev_best is not None:
                    self._best_fid = min(self._best_fid, prev_best)
            elif jax.process_index() == 0 and not self._best_cleared:
                # FRESH run: the best slot belongs to this run.  Clear any
                # stale previous-run contents — orbax silently skips saving
                # an already-existing step and its retention keeps the
                # HIGHEST step, so without the reset a reused ckpt_dir
                # would keep the old run's weights under this run's
                # freshly-written watermark (inconsistent deploy point).
                # Only on the FIRST train() of this Trainer: later calls
                # share the in-memory _best_fid watermark, so deleting
                # would orphan it (no best checkpoint under a live
                # watermark until a new all-time best).
                best_dir = os.path.join(cfg.train.ckpt_dir, "best")
                if os.path.isdir(best_dir):
                    import shutil

                    print(f"warning: clearing stale best slot {best_dir} "
                          f"from a previous run (fresh run owns "
                          f"ckpt_dir/best; resume the old run to keep it)")
                    shutil.rmtree(best_dir)
            self._best_cleared = True
        if self.spatial_mesh is not None:
            # (re-)install the spatial dispatch context for this run — it
            # is cleared in the finally below so it cannot leak into other
            # Trainer instances
            from tpugan.parallel.spatial import set_spatial_mesh

            set_spatial_mesh(self.spatial_mesh)
        # Re-assert the fused-stats mode too: it is the same kind of
        # process-global TRACE-time switch, and the step traces at its
        # first dispatch below — a second Trainer constructed in the
        # meantime must not flip this trainer's step into the wrong mode
        # (the fused path has no cross-replica BN reduction).
        from tpugan import ops as _ops

        _ops.set_fuse_stats(self._fuse_mode)
        try:
            # steps advanced per dispatch (scan-fused)
            k = k_steps
            for i in range(start_step, total_steps, k):
                if preemptible and _PREEMPTED.is_set():
                    preempted = True
                    break
                # optional profiler window (skip step 1: compile)
                if cfg.train.profile_steps:
                    if i == start_step + k and not profiling:
                        jax.profiler.start_trace(os.path.join(out_dir, "prof"))
                        profiling = True
                    elif profiling and i >= start_step + k * (
                            1 + cfg.train.profile_steps):
                        jax.profiler.stop_trace()
                        profiling = False
                batch = next(it)
                self.state, metrics = self.step_fn(self.state, batch)
                imgs_since += cfg.data.batch_size * k
                pending = metrics

                step_no = i + k
                if cfg.train.log_every and (
                        step_no % cfg.train.log_every < k
                        or step_no >= total_steps):
                    host = {k: float(v) for k, v in
                            jax.device_get(pending).items()}
                    dt = time.perf_counter() - t0
                    host["images_per_sec"] = imgs_since / max(dt, 1e-9)
                    logger.log(step_no, host)
                    last_metrics = host
                    if cfg.train.halt_on_nonfinite:
                        bad = [k for k, v in host.items()
                               if not np.isfinite(v)]
                        if bad:
                            self.save_checkpoint(ckpt)
                            ckpt.close()
                            if best_ckpt is not None:
                                # flush the async best-slot write: the
                                # deploy-point checkpoint must not be left
                                # half-written by this abort
                                best_ckpt.close()
                            if profiling:
                                jax.profiler.stop_trace()
                            logger.close()
                            raise NonFiniteLossError(
                                f"non-finite metrics {bad} at step {step_no}; "
                                f"checkpoint saved to {cfg.train.ckpt_dir}")
                    t0 = time.perf_counter()
                    imgs_since = 0

                if cfg.train.sample_every and (
                        step_no % cfg.train.sample_every < k
                        or step_no >= total_steps):
                    # computed on every process (collective-free eval-mode
                    # forward on replicated weights); written once
                    sampler.update(self._gen_params(), self.state.state_g)
                    imgs = sampler.sample_fixed(fixed_z, fixed_y)
                    if is_main:
                        grid = make_grid(to_uint8(imgs), nrow=8)
                        save_png(os.path.join(
                            out_dir, f"samples_{step_no:07d}.png"), grid)
                        logger.log_image(step_no, "samples", grid)
                    t0 = time.perf_counter()  # grid D2H+PNG out of img/s
                    imgs_since = 0

                if cfg.train.eval_every and (
                        step_no % cfg.train.eval_every < k
                        or step_no >= total_steps):
                    from tpugan.eval import evaluate

                    # pass the dataset unsliced: evaluate() slices to
                    # eval.fid_n itself and, for a streaming dataset, keys
                    # its real-feature cache on dataset identity BEFORE
                    # decoding — repeated eval ticks cost zero decodes
                    scores = evaluate(cfg, self.g, self._gen_params(),
                                      self.state.state_g, seed=cfg.train.seed,
                                      real_images=data["images"])
                    logger.log(step_no,
                               {k: v for k, v in scores.items()
                                if isinstance(v, (int, float))}, prefix="eval")
                    if (cfg.train.keep_best
                            and scores["fid"] < self._best_fid):
                        # GAN quality oscillates — keep the best-FID weights
                        # in a sibling dir (latest checkpoint stays the
                        # resume point; 'best' is the deploy point)
                        self._best_fid = scores["fid"]
                        if best_ckpt is None:
                            best_ckpt = CheckpointManager(
                                os.path.join(cfg.train.ckpt_dir, "best"),
                                max_to_keep=1)
                        self.save_checkpoint(best_ckpt)
                        self._save_best_watermark(step_no, scores["fid"])
                        logger.log(step_no, {"best_fid": scores["fid"]},
                                   prefix="eval")
                    t0 = time.perf_counter()  # don't count eval in images/sec
                    imgs_since = 0

                if cfg.train.ckpt_every and step_no % cfg.train.ckpt_every < k:
                    self.save_checkpoint(ckpt)

            if profiling:
                jax.profiler.stop_trace()
            self.save_checkpoint(ckpt)
            ckpt.close()
            if best_ckpt is not None:
                best_ckpt.close()
            logger.close()
            if preempted:
                print(f"preempted at step {int(self.state.step)}: checkpoint "
                      f"saved to {cfg.train.ckpt_dir}; rerun with "
                      f"train.resume={cfg.train.ckpt_dir!r} to continue")
            return last_metrics
        finally:
            # always restore the process signal handlers (a swallowed
            # SIGTERM after training would make the process unkillable
            # gracefully) and drop the global spatial context so later
            # Trainer instances in this process start clean
            _disarm_preemption(prev_handlers)
            if self.spatial_mesh is not None:
                from tpugan.parallel.spatial import set_spatial_mesh

                set_spatial_mesh(None)

    # -- public eval handle --------------------------------------------------
    def evaluate(self, seed: int = 0) -> Dict[str, float]:
        """FID/KID/IS(+PRDC) of the current generator (EMA weights when
        tracked) against the run's dataset — the reference's eval entry as
        one call on the live Trainer."""
        from tpugan.eval import evaluate as _evaluate

        data = self._dataset()
        # unsliced: evaluate() slices to eval.fid_n and handles streaming
        # datasets without decoding on a cache hit
        return _evaluate(self.cfg, self.g, self._gen_params(),
                         self.state.state_g, seed=seed,
                         real_images=data["images"])

    # -- public sampler handle ---------------------------------------------
    def sampler(self) -> Sampler:
        return Sampler(self.cfg, self.g, self._gen_params(),
                       self.state.state_g)
