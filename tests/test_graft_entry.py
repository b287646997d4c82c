"""Driver entry-point checks: entry() compiles and runs single-device.
(dryrun_multichip is covered by test_multichip.py on the 8-device mesh.)"""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 7)
    assert np.isfinite(np.asarray(out)).all()
