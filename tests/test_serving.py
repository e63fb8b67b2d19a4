"""Micro-batching inference server: correctness, coalescing, HTTP surface.

The reference has no serving layer; this validates the TPU-style design
(vault_tpu/serving.py): fixed max_batch padding => one compiled program,
concurrent requests coalesced into shared device calls."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.serving import BatchingEngine, InferenceServer, decode_image
from vault_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] a cat dog couch on the".split()
MAX_BATCH = 4


def _setup():
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=8),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    tok = WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})
    proc = VaultProcessor(tok, max_length=8, canvas=(32, 32))
    fwd = jax.jit(lambda b: vault_for_classification(
        params, cfg, b, head_dropout=0.0, deterministic=True))
    return cfg, params, proc, fwd


def _img(seed, size=(40, 30)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (*size, 3)).astype(np.uint8)


def test_engine_matches_direct_call_and_pads():
    cfg, params, proc, fwd = _setup()
    eng = BatchingEngine(proc, fwd, max_batch=MAX_BATCH, max_wait_ms=1.0)
    try:
        img, text = _img(0), "a cat on the couch"
        out = eng.predict(img, text)
        enc = proc([img], [text])
        feats = {k: np.concatenate([v, v[:1], v[:1], v[:1]]) for k, v in enc.items()}
        direct = np.asarray(fwd({k: jnp.asarray(v) for k, v in feats.items()}))
        np.testing.assert_allclose(np.asarray(out), direct[0], atol=1e-5)
        assert out.shape == (3,)
    finally:
        eng.close()


def test_engine_coalesces_concurrent_requests():
    cfg, params, proc, fwd = _setup()
    eng = BatchingEngine(proc, fwd, max_batch=MAX_BATCH, max_wait_ms=300.0)
    try:
        eng.predict(_img(0), "a cat")  # warm: compile outside the timed part
        results = [None] * MAX_BATCH

        def call(i):
            results[i] = eng.predict(_img(i), "a dog on the couch")

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(MAX_BATCH)]
        before = eng.batches_run
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and r.shape == (3,) for r in results)
        # 4 concurrent requests within the wait window -> shared batches
        assert eng.batches_run - before < MAX_BATCH
        assert eng.requests_served >= MAX_BATCH + 1
    finally:
        eng.close()


def test_http_server_predict_and_health():
    cfg, params, proc, fwd = _setup()
    server = InferenceServer(proc, fwd, port=0, max_batch=MAX_BATCH,
                             max_wait_ms=1.0).start()
    try:
        buf = io.BytesIO()
        Image.fromarray(_img(3)).save(buf, format="PNG")
        payload = json.dumps({
            "text": "a cat on the couch",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read())
        assert len(body["output"]) == 3
        # decode path matches the direct engine path
        direct = server.engine.predict(decode_image(buf.getvalue()),
                                       "a cat on the couch")
        np.testing.assert_allclose(body["output"], np.asarray(direct),
                                   atol=1e-5)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["requests_served"] >= 2
        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
    finally:
        server.close()


def test_serve_cli_prequantized_e2e(tmp_path):
    """scripts/serve.py end-to-end: --debug_tiny + a PRE-QUANTIZED (w8a8)
    checkpoint.  The CLI must detect the stored int8 form from the npz keys,
    build the quantized restore target, warm up, and answer HTTP requests —
    the quantize-once deployment flow."""
    import os
    import socket
    import subprocess
    import sys
    import time
    import urllib.error

    from vault_tpu.ops.quantize import quantize_model_params
    from vault_tpu.training.checkpoint import save_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # the one shared --debug_tiny geometry (restore target must match)
    from vault_tpu.config import debug_tiny_vault_config

    cfg = debug_tiny_vault_config()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    ckpt = str(tmp_path / "model")
    save_checkpoint(ckpt, {"params": quantize_model_params(params,
                                                           mode="w8a8")})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # --merge_to 8 composes ToMe patch merging with the w8a8 path (the
    # debug_tiny geometry has 16 patch tokens)
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--debug_tiny",
         "--ckpt", ckpt, "--port", str(port), "--max_batch", "2",
         "--max_wait_ms", "1", "--merge_to", "8"],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 420
        health = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve.py exited {proc.returncode}:\n"
                    f"{proc.stdout.read()[-3000:]}")
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(1.0)
        assert health is not None and health["ok"], "server never came up"

        buf = io.BytesIO()
        Image.fromarray(_img(0)).save(buf, format="PNG")
        payload = json.dumps({
            "text": "a cat on the couch",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = json.loads(resp.read())
        assert len(body["output"]) == 3
        assert all(np.isfinite(v) for v in body["output"])
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_metrics_endpoint_and_latency_stats():
    """/metrics (Prometheus text) + latency/queue fields in /healthz."""
    cfg, params, proc, fwd = _setup()
    server = InferenceServer(proc, fwd, port=0, max_batch=MAX_BATCH,
                             max_wait_ms=1.0).start()
    try:
        server.engine.predict(_img(1), "a dog")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["requests_served"] >= 1
        assert health["queue_depth"] == 0
        assert health["request_latency_ms_p50"] > 0
        assert health["batch_ms_p50"] > 0
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/metrics", timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE vault_requests_served counter" in text
        assert "vault_request_latency_ms_p50" in text
        served = [l for l in text.splitlines()
                  if l.startswith("vault_requests_served ")]
        assert served and float(served[0].split()[1]) >= 1
    finally:
        server.close()


def test_quantize_ckpt_cli(tmp_path):
    """scripts/quantize_ckpt.py: fp checkpoint -> int8 npz that serve.py's
    key-detection recognizes, values matching an in-process quantization."""
    import os
    import subprocess
    import sys

    from vault_tpu.ops.quantize import quantize_model_params
    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the one shared --debug_tiny geometry (restore target must match)
    from vault_tpu.config import debug_tiny_vault_config

    cfg = debug_tiny_vault_config()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    fp_ckpt = str(tmp_path / "model")
    save_checkpoint(fp_ckpt, {"params": params})

    out = str(tmp_path / "model_w8a8.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "scripts/quantize_ckpt.py", "--debug_tiny",
         "--ckpt", fp_ckpt, "--out", out, "--mode", "w8a8"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]

    keys = [k.rsplit("::", 1)[0] for k in np.load(out).files]
    assert any(k.endswith("/w_q8") for k in keys)
    # values match the in-process quantize-then-save of the same weights
    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    want = quantize_model_params(bf16, mode="w8a8")
    got = restore_checkpoint(out, {"params": want})["params"]
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_check_serving_composition_budgets():
    """The measured-bad composition guard (docs/BENCHMARKS.md head table):
    wide-argmax heads in the 16.7%-VQA-flip regime must REFUSE; single
    levers on wide heads warn; narrow pooled heads (<=1/48 flips measured)
    stay silent under every composition."""
    from vault_tpu.serving import check_serving_composition

    # the red regime: wide head + ANY int8 mode + merge@0 (round 5 measured
    # w8+merge@0 at 12.5% VQA flips — same regime as w8a8's 16.7%)
    for q in ("w8", "w8a8"):
        refusals, warnings = check_serving_composition(3129, q, 87, 0)
        assert refusals and not warnings
    # merge@4 defuses the refusal, but the composed rate (8.3-10.4%
    # measured round 5) still warns
    for q in ("w8", "w8a8"):
        refusals, warnings = check_serving_composition(3129, q, 87, 4)
        assert not refusals and warnings
    # single levers on a wide head: warn, don't refuse.  w8 and w8a8
    # measured IDENTICAL 6.2% VQA flips (round 5), so BOTH warn
    refusals, warnings = check_serving_composition(3129, None, 87, 0)
    assert not refusals and warnings
    for q in ("w8", "w8a8"):
        refusals, warnings = check_serving_composition(3129, q, None, 0)
        assert not refusals and warnings
    # single-lever merge@4 on a wide head: the measured-green cell (2.1%)
    assert check_serving_composition(3129, None, 87, 4) == ([], [])
    # narrow heads measured robust under everything
    for n in (2, 3):
        assert check_serving_composition(n, "w8a8", 87, 0) == ([], [])
    # quantize=None merge=None: silent
    assert check_serving_composition(3129, None, None, 0) == ([], [])


def test_serve_cli_refuses_measured_bad_composition():
    """scripts/serve.py must exit non-zero (without --force) when asked to
    serve the measured-bad wide-head w8a8+merge@0 composition — the
    VERDICT r4 #4 runtime guard, not just --help advice."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, "scripts/serve.py", "--debug_tiny",
         "--n_classes", "3129", "--quantize", "w8a8", "--merge_to", "8",
         "--merge_at_layer", "0"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 2, (res.returncode, res.stderr[-2000:])
    assert "REFUSING" in res.stderr and "16.7%" in res.stderr
