"""Host→device input pipeline.

TPU-first decisions:

- **Transfer uint8, normalize on device.** The reference normalizes to
  [-1, 1] on the host (float32) and ships 4 bytes/px over the bus; we ship
  the raw uint8 and let the train step fuse ``x/127.5 - 1`` into its first
  conv — 4× less host→device bandwidth, which is the actual bottleneck for
  small models.
- **Background prefetch.** A producer thread assembles the next batches and
  ``jax.device_put``s them (optionally with a batch-sharded ``Sharding`` for
  data parallelism) while the device runs the current step, so the chip
  never waits on the host.
- **Deterministic order.** Shuffling uses a ``numpy`` generator seeded from
  the config seed and the epoch index; restarting an epoch reproduces the
  same batch sequence (part of the per-seed fidelity contract).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from tpugan import native


class make_input_pipeline:
    """Iterator of device-resident {'image': uint8 NHWC, 'label': int32}."""

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int, *,
                 seed: int = 0, drop_remainder: bool = True,
                 with_labels: bool = True,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 prefetch: int = 2, stack: int = 1,
                 multiprocess: bool = False, start_step: int = 0):
        self.images = data["images"]
        self.labels = data.get("labels") if with_labels else None
        self.batch_size = batch_size
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        # Multi-host mode: every process computes the SAME seeded global
        # shuffle, gathers/decodes only its local_batch_slice rows, and the
        # producer stitches them into global arrays over the mesh
        # (parallel/multihost.py).  Requires a NamedSharding over the
        # global mesh.
        self.multiprocess = bool(multiprocess)
        if self.multiprocess and sharding is None:
            raise ValueError("multiprocess pipeline needs a mesh sharding")
        if self.multiprocess and batch_size % jax.process_count():
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"{jax.process_count()} processes")
        # stack > 1: yield K minibatches stacked on a leading axis, for the
        # scan-fused multi-step dispatch (one big transfer per K steps)
        self.stack = max(stack, 1)
        n = len(self.images)
        if n < batch_size:
            raise ValueError(f"dataset size {n} < batch size {batch_size}")
        self.steps_per_epoch = n // batch_size if drop_remainder else -(-n // batch_size)
        # Resume support: fast-forward the deterministic stream to this
        # step (index arithmetic only — skipped batches are never decoded).
        # Without it a resumed run would replay epoch 0's batches, silently
        # diverging from the uninterrupted run the bit-exact-resume
        # contract promises (the device-resident path derives its position
        # from state.step; this is the host-pipeline equivalent).
        self.start_step = int(start_step)

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch, s0 = divmod(self.start_step, self.steps_per_epoch)
        n = len(self.images)
        while True:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).permutation(n)
            for s in range(s0, self.steps_per_epoch):
                idx = order[s * self.batch_size:(s + 1) * self.batch_size]
                if self.multiprocess:
                    # identical global order everywhere; each host touches
                    # only its own rows (bandwidth + decode split across
                    # hosts)
                    from tpugan.parallel.multihost import local_batch_slice

                    idx = idx[local_batch_slice(self.batch_size)]
                if hasattr(self.images, "gather"):
                    # streaming dataset (larger-than-RAM folder): decode
                    # this batch's files now, in its thread pool
                    batch = {"image": self.images.gather(idx)}
                else:
                    # native C++ threaded gather (2-3x numpy fancy
                    # indexing); numpy fallback when the lib is absent
                    batch = {"image": native.batch_gather(self.images, idx)}
                if self.labels is not None:
                    batch["label"] = self.labels[idx]
                yield batch
            epoch += 1
            s0 = 0

    def _stacked_batches(self):
        if self.stack == 1:
            yield from self._host_batches()
            return
        it = self._host_batches()
        while True:
            group = [next(it) for _ in range(self.stack)]
            yield {key: np.stack([b[key] for b in group])
                   for key in group[0]}

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for batch in self._stacked_batches():
                    if stop.is_set():
                        return
                    if self.multiprocess:
                        from tpugan.parallel.multihost import \
                            make_global_batch

                        dev = make_global_batch(batch, self.sharding)
                    else:
                        dev = {k: jax.device_put(v, self.sharding)
                               for k, v in batch.items()}
                    while not stop.is_set():
                        try:
                            q.put(dev, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # propagate, don't hang the consumer
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.5)
                        return
                    except queue.Full:
                        continue

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "input pipeline producer failed") from item
                yield item
        finally:
            stop.set()
