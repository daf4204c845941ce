"""The driver-facing entry points must stay importable and runnable."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["hist"].shape == (128, 128)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
