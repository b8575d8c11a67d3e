"""Driver entry points: single-chip forward and 8-device SPMD dry run."""

import pytest
import jax
import numpy as np


@pytest.mark.slow
def test_entry_forward():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # raises on failure
