"""Driver-contract smoke tests for __graft_entry__.py (virtual CPU devices)."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    flows, carry = jax.jit(fn)(*args)
    assert flows.shape == (4, 1, 128, 128, 2)
    assert np.all(np.isfinite(np.asarray(flows)))


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
