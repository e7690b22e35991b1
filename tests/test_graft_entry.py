"""Driver contracts (__graft_entry__): the flagship forward step jits and
the full dp x tp training step executes on the virtual mesh. Keeping these
under test means the driver's compile-check can never silently rot."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile failure


# test tier (see conftest): excluded from the `-m fast` iteration loop
import pytest as _pytest  # noqa: E402
pytestmark = _pytest.mark.slow
