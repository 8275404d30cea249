"""Driver contract: entry() compiles and runs; dryrun_multichip executes a
sharded training step on a small virtual mesh."""

import sys

import jax
import numpy as np


def test_entry_jits():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_small():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
    ge.dryrun_multichip(8)
