"""Driver entry points stay healthy: entry() lowers at full geometry;
dryrun_multichip exercises the DPxTP train step on the virtual mesh."""

import jax
import pytest


def test_entry_lowers_full_geometry():
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    lowered = jax.jit(fn).lower(params, batch)
    (out,) = jax.tree.leaves(lowered.out_info)
    assert out.shape == (8, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
