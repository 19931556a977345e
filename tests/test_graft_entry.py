"""The driver deliverables stay green: entry() compiles, dryrun passes."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # 76s: five-placement gate; the driver runs the
# IDENTICAL dryrun_multichip(8) out-of-band every round, so the default
# tier keeps only the single-device entry() compile check.
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)  # asserts internally (DP + FSDP placements)
