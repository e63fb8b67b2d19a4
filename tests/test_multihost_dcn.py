"""Multi-host (DCN) communication backend, validated for real: two OS
processes each owning 2 virtual CPU devices initialize
``parallel.mesh.init_distributed``, build ONE global 4-device data mesh,
and run a jitted DP gradient step — replicated weights, batch sharded
across processes — so GSPMD's gradient all-reduce actually crosses the
process boundary (SURVEY.md §2.8 communication-backend row; the reference
has no distributed backend at all)."""

import os
import pytest
import socket
import subprocess
import sys
import textwrap

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    pid, port = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vault_tpu.parallel.mesh import init_distributed
    init_distributed(f"localhost:{port}", 2, pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4, devs          # 2 local x 2 processes
    assert jax.process_count() == 2
    mesh = Mesh(np.array(devs).reshape(4), ("data",))

    # replicated params, globally batch-sharded inputs
    w = jax.device_put(jnp.ones((4, 3)), NamedSharding(mesh, P()))
    xs = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    ys = np.arange(8, dtype=np.float32)
    x = jax.make_array_from_callback((8, 4), NamedSharding(mesh, P("data")),
                                     lambda idx: xs[idx])
    y = jax.make_array_from_callback((8,), NamedSharding(mesh, P("data")),
                                     lambda idx: ys[idx])

    @jax.jit
    def grad_step(w, x, y):
        def loss(w):
            pred = (x @ w).sum(-1)
            return jnp.mean((pred - y) ** 2)
        return jax.grad(loss)(w)   # GSPMD all-reduces over "data" (DCN)

    g = grad_step(w, x, y)
    # reference value computed locally on the full batch
    def ref_loss(w):
        pred = (xs @ w).sum(-1)
        return np.mean((pred - ys) ** 2)
    eps = 1e-3
    w0 = np.ones((4, 3))
    num = np.zeros_like(w0)
    for i in range(4):
        for j in range(3):
            wp = w0.copy(); wp[i, j] += eps
            wm = w0.copy(); wm[i, j] -= eps
            num[i, j] = (ref_loss(wp) - ref_loss(wm)) / (2 * eps)
    got = np.asarray(jax.device_get(g))
    assert np.allclose(got, num, atol=1e-2), (got, num)
    print("RESULT", pid, "ok", flush=True)
""")


def test_two_process_dp_gradient_allreduce(tmp_path):
    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i}:\n{out[-3000:]}"
        assert f"RESULT {i} ok" in out, out[-2000:]
