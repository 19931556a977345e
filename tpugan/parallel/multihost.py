"""Multi-host (multi-slice) initialization — the DCN story.

Single-host multi-chip needs nothing beyond ``jax.devices()`` (mesh.py /
fsdp.py).  Scaling across hosts only changes process bootstrap: every host
calls :func:`initialize_multihost`, after which ``jax.devices()`` globally
enumerates all chips and the SAME mesh/sharding code runs unchanged — XLA
routes in-slice collectives over ICI and cross-slice traffic over DCN.

This box has one chip, so the function is exercised only in its no-op
single-process form; the multi-process path follows the standard
``jax.distributed`` contract (coordinator address + process count via args
or TPU metadata autodetection).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         autodetect: bool = False) -> int:
    """Initialize cross-host JAX; returns this process's index.

    With no arguments on a single process this is a no-op returning 0
    (keeps one code path for scripts that may run either way).  On TPU pods
    pass ``autodetect=True`` (or set any explicit arg): a bare
    ``jax.distributed.initialize()`` reads the topology from the TPU
    metadata service / cluster env, which is the canonical pod bootstrap.
    """
    if autodetect and coordinator_address is None and num_processes is None:
        # TPU-pod path: topology comes from the metadata service, not args.
        jax.distributed.initialize()
        return jax.process_index()
    if coordinator_address is None and num_processes in (None, 1):
        if process_id not in (None, 0):
            # A lone process_id is a half-specified cluster: silently
            # running single-process would train every host independently
            # with no gradient sync.
            raise ValueError(
                f"process_id={process_id} given without "
                f"coordinator_address/num_processes — pass both (or "
                f"autodetect=True on a TPU pod) to initialize the cluster")
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def local_batch_slice(global_batch: int) -> slice:
    """The host-local slice of a globally-sharded batch (data loading:
    each host feeds only its own shard of the global batch)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def is_main_process() -> bool:
    """True on the process that owns side effects (PNG grids, metric files);
    compute still runs everywhere — only host writes are deduplicated."""
    return jax.process_index() == 0


def make_global_batch(local_batch, sharding):
    """Assemble global device arrays from this process's LOCAL slice.

    Each process gathers/decodes only its ``local_batch_slice`` rows; this
    stitches those host shards into one global jax.Array laid out by
    ``sharding`` (a NamedSharding over the global mesh) — the multi-host
    form of the pipeline's ``jax.device_put(batch, sharding)``.
    """
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local_batch.items()}
