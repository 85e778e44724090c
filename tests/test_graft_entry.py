"""Driver contract: __graft_entry__.entry() jits; dryrun_multichip(8) runs."""

import sys

import pytest


def test_entry_jits():
    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    vals, docs = jax.jit(fn)(*args)
    assert vals.shape == (10,)
    assert docs.shape == (10,)
    assert float(vals[0]) > 0


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
