"""Driver entry-point contracts: single-chip compile check and the
multi-chip dry run on the virtual 8-device CPU mesh."""

import sys
import pytest

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    u, s, v = jax.block_until_ready(out)
    assert u.shape == (1024, 64) and s.shape == (64,) and v.shape == (1024, 64)
    assert bool(jax.numpy.all(jax.numpy.isfinite(s)))
    # descending spectrum
    s_np = np.asarray(s)
    assert np.all(np.diff(s_np) <= 1e-3 * s_np[0])


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
