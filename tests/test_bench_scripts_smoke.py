"""CPU smoke of the TPU bench scripts' env-flag combinations — exactly the
legs scripts/run_r04_tpu_queue.sh runs. A flag typo or a broken
composition (quant x merge, merge in the train step) must fail HERE in
seconds, not after a ~6-minute tunnel compile inside a scarce TPU window.
Tiny canvas; merge_to=3 so merging actually fires on the 2x2 patch grid."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, env_overrides, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.update(env_overrides)
    res = subprocess.run([sys.executable, script], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (env_overrides, res.stdout[-2000:],
                                 res.stderr[-3000:])
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert lines, (env_overrides, res.stdout[-2000:])
    return [json.loads(ln) for ln in lines]


@pytest.mark.parametrize("extra", [
    {},
    {"TRAIN_BENCH_MERGE_TO": "3"},
    {"TRAIN_BENCH_MERGE_TO": "3", "TRAIN_BENCH_MERGE_LAYER": "4"},
], ids=["control", "merge", "merge_at_4"])
def test_train_bench_queue_legs(extra):
    out = _run("scripts/train_bench.py",
               {"TRAIN_BENCH_BATCH": "2", "TRAIN_BENCH_CANVAS": "64,64",
                **extra})
    assert out[-1]["value"] > 0


@pytest.mark.parametrize("extra", [
    {"PERF_SWEEP_IMPLS": "1"},
    {"PERF_SWEEP_IMPLS": "fuselnqkv+fusemlp", "PERF_SWEEP_QUANT": "w8a8",
     "PERF_SWEEP_MERGE_TO": "3"},
    {"PERF_SWEEP_IMPLS": "1", "PERF_SWEEP_MERGE_TO": "3",
     "PERF_SWEEP_MERGE_LAYER": "4"},
], ids=["bf16_control", "w8a8_merge", "merge_at_4"])
def test_perf_sweep_queue_legs(extra):
    out = _run("scripts/perf_sweep.py",
               {"PERF_SWEEP_CANVAS": "64,64", "PERF_SWEEP_BATCHES": "2",
                **extra})
    assert out[-1]["pairs_per_sec"] > 0


@pytest.mark.parametrize("extra", [
    # the queue-8 ceiling probe: SwiGLU chain at non-default geometry
    {"PROBE_ROWS": "8", "PROBE_H": "32", "PROBE_I": "64",
     "PROBE_SWIGLU": "1"},
], ids=["swiglu"])
def test_int8_probe_leg(extra):
    rec = _run("scripts/probe_int8_matmul.py", extra)[-1]
    assert rec["int8_ms"] > 0 and rec["bf16_ms"] > 0
    assert rec["swiglu"] is True and rec["i"] == 64


@pytest.mark.parametrize("extra", [
    {},
    {"LLAMA_LAYER_MODE": "mlp"},
    # the queue-12 GQA-kernel A/B leg
    {"LLAMA_LAYER_ATTN": "pallas"},
    # the queue-13 fused-SwiGLU-kernel A/B legs (mlp-only + full layer)
    {"LLAMA_LAYER_MODE": "mlp", "LLAMA_LAYER_MLP": "pallas"},
    {"LLAMA_LAYER_MLP": "pallas"},
], ids=["full", "mlp", "pallas_attn", "pallas_mlp", "full_pallas_mlp"])
def test_llama_layer_probe_leg(extra):
    # the queue-11/12 flat-layer decomposition legs
    rec = _run("scripts/probe_llama_layer.py",
               {"LLAMA_LAYER_TINY": "1", "LLAMA_LAYER_BATCH": "2",
                "LLAMA_LAYER_SEQ": "8", **extra})[-1]
    assert rec["metric"] == "llama_layer_flat_ms" and rec["value"] > 0


@pytest.mark.parametrize("extra", [
    {},
    # the queue-7 batch-sweep combination: w8a8 mode with a non-default
    # batch (the r05 legs run LLAMA_BENCH_QUANT=w8a8 LLAMA_BENCH_BATCH=32/64)
    {"LLAMA_BENCH_QUANT": "w8a8", "LLAMA_BENCH_BATCH": "4"},
    # the queue-9 decomposition leg: tower-only timing, no ViLT side
    {"LLAMA_BENCH_QUANT": "w8a8", "LLAMA_BENCH_TOWER_ONLY": "1"},
    # the queue-10 scan-unroll leg (tiny config has 2 layers; unroll=2
    # exercises the full-unroll edge)
    {"LLAMA_BENCH_QUANT": "w8a8", "LLAMA_BENCH_TOWER_ONLY": "1",
     "LLAMA_BENCH_UNROLL": "2"},
    # the queue-13 fused-SwiGLU full-step leg
    {"LLAMA_BENCH_QUANT": "w8a8", "LLAMA_BENCH_MLP": "pallas"},
], ids=["w8_default", "w8a8_batch", "tower_only", "tower_unroll",
        "pallas_mlp"])
def test_llama_probe_leg(extra):
    out = _run("scripts/probe_llama8b.py",
               {"LLAMA_BENCH_TINY": "1", "LLAMA_BENCH_BATCH": "2",
                "LLAMA_BENCH_CANVAS": "64,64", **extra})
    rec = out[-1]
    assert rec["value"] > 0
    assert rec["params_bytes"] > 0
    assert "implied_tflops_per_sec" in rec
    assert rec["batch"] == int(extra.get("LLAMA_BENCH_BATCH", "2"))
