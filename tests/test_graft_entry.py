"""Driver entry points stay healthy: entry() lowers at full geometry;
dryrun_multichip exercises the DPxTP train step on the virtual mesh;
_pin_cpu_mesh fails LOUDLY when its private-API reset path breaks."""

import os
import subprocess
import sys
import textwrap

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_lowers_full_geometry():
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    lowered = jax.jit(fn).lower(params, batch)
    (out,) = jax.tree.leaves(lowered.out_info)
    assert out.shape == (8, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_pin_cpu_mesh_fails_loudly_when_reset_path_breaks(tmp_path):
    """Round-1 regression guard: a backend pre-initialized with too few
    devices PLUS a broken private reset API (the jax-upgrade hazard,
    VERDICT round 2 weak #6) must raise, never silently run mis-pinned."""
    script = tmp_path / "worker.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ.pop("XLA_FLAGS", None)
        sys.path.insert(0, {REPO!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.device_count() == 1  # backend now initialized, 1 device
        from jax._src import xla_bridge

        def broken(*a, **k):  # simulate the private API going away
            raise AttributeError("simulated: _clear_backends removed")

        xla_bridge._clear_backends = broken
        import __graft_entry__ as g
        try:
            g._pin_cpu_mesh(8)
        except RuntimeError as e:
            assert "_pin_cpu_mesh failed" in str(e), e
            print("LOUD ok", flush=True)
        else:
            print("SILENT mis-pin: device_count", jax.device_count(),
                  flush=True)
            sys.exit(1)
    """))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    proc = subprocess.run([sys.executable, str(script)], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "LOUD ok" in proc.stdout, proc.stdout + proc.stderr
