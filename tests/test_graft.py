"""Driver entry points compile and run (single chip + 8-device mesh)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    state, outputs = jax.jit(fn)(*args)
    jax.block_until_ready(outputs)
    assert np.isfinite(np.asarray(outputs["X_world_cam"])).all()


def test_dryrun_multichip():
    ge.dryrun_multichip(8)
