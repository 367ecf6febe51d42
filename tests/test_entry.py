"""Driver-entry contract tests: entry() compiles, dryrun_multichip executes."""

import sys

import jax
import numpy as np
import pytest


def test_entry_compiles():
    sys.path.insert(0, ".")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (256,)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_1():
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(1)
