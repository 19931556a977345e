"""Test environment: CPU backend with 8 fake devices.

This module is imported by pytest before any test module imports jax, so the
env vars below take effect at backend-init time:

- ``JAX_PLATFORMS=cpu``: tests never touch the (single, shared) TPU chip —
  even though the axon PJRT plugin may already be registered by the
  container's sitecustomize, backend selection happens lazily and honors
  this variable.
- ``xla_force_host_platform_device_count=8``: 8 virtual CPU devices, the
  standard JAX trick for testing mesh sharding / collectives on one host
  (this box has exactly one physical TPU; the multi-chip path is validated
  on the fake mesh and by ``__graft_entry__.dryrun_multichip``).

Faster local runs: prepend ``PALLAS_AXON_POOL_IPS=`` to skip the
sitecustomize's TPU-relay dial entirely, e.g.
``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q``.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Blank the relay pool so python SUBPROCESSES spawned by tests (multihost,
# dryrun-gate, streaming) skip the sitecustomize TPU-relay dial at
# interpreter start — with the pool set, every child pays (or hangs on)
# a PJRT plugin registration it will never use.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    # Some container images pre-import jax from sitecustomize (the axon
    # relay registers its PJRT plugin at interpreter start). That is fine
    # as long as no backend has been *initialized* yet: platform selection
    # and the fake-device count are read at client-creation time, and
    # jax.config.update can still steer them.
    from jax._src import xla_bridge as _xb

    assert not _xb._backends, (
        "conftest must run before any jax backend is initialized so the "
        "CPU/fake-device settings take effect")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # Per-test seed derived from the test's nodeid: deterministic AND
    # independent of collection order.  The old session-scoped generator
    # advanced across tests, so ADDING a test reshuffled every later
    # test's draws — draw-sensitive assertions (power-iteration
    # tolerances) failed or passed depending on what ran before them.
    import zlib

    seed = zlib.adler32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)
