#!/usr/bin/env python
"""One REAL Llama layer, chained flat — the last decomposition cut.

Round-5 ladder so far (docs/r05_tpu_results.jsonl, BENCHMARKS "Llama"
section): bare int8 SwiGLU chain at the tower's MLP shapes = 0.687 ms
(328 TFLOP/s); full tower = 42.23 ms / 32 layers = 1.32 ms/layer
(227 TFLOP/s); scan unroll=4 made it WORSE (61 ms), so the per-layer
overhead is not the loop boundary per se.  This probe times the actual
``models/llama._layer`` composition (RMSNorm -> w8a8 GQA attention with
rope -> RMSNorm -> w8a8 SwiGLU MLP -> residuals) for ONE layer's params
chained k deep, outside any scan and with NO stacked-weight
dynamic-slicing.  The output feeds the next iteration's input directly,
so every iteration is data-dependent (no LICM hazard) and the slope is
ms per flat layer.

  flat layer ~= 0.9-1.0 ms  -> the gap is the scan's stacked-weight
                               slicing / scheduling, not the layer math
  flat layer ~= 1.3 ms      -> the layer internals (rope/rms/attention
                               elementwise) cost ~2x their byte budget

Run on TPU: python scripts/probe_llama_layer.py (one ~6 min compile).
CPU smoke: LLAMA_LAYER_TINY=1 (tests/test_bench_scripts_smoke.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.models.llama import LlamaConfig, _layer, tiny_llama_config

BATCH = int(os.environ.get("LLAMA_LAYER_BATCH", 16))
SEQ = int(os.environ.get("LLAMA_LAYER_SEQ", 40))
# "full" = the whole _layer; "mlp" = RMSNorm -> SwiGLU MLP -> residual
# only (the attention half excised) — layer_full - layer_mlp isolates
# the attention block's cost (projections + rope + grouped attention)
MODE = os.environ.get("LLAMA_LAYER_MODE", "full")
if MODE not in ("full", "mlp"):
    raise SystemExit(f"LLAMA_LAYER_MODE={MODE!r}: use full or mlp")
K_LO, K_HI = 4, 44


def _np_quant_linear(rng, in_dim, out_dim, key="w_q8"):
    w = (rng.standard_normal((in_dim, out_dim), dtype=np.float32) * 0.02)
    absmax = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8)
    scale = absmax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {key: q, "w_scale": scale.astype(np.float32)}


def main():
    attn = os.environ.get("LLAMA_LAYER_ATTN", "xla")
    mlp = os.environ.get("LLAMA_LAYER_MLP", "xla")
    if os.environ.get("LLAMA_LAYER_TINY") == "1":
        cfg = tiny_llama_config(attn_impl=attn, mlp_impl=mlp)
    else:
        cfg = LlamaConfig(attn_impl=attn, mlp_impl=mlp)
    rng = np.random.default_rng(0)
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    lp = {
        "input_ln": np.ones((h,), np.float32),
        "q": _np_quant_linear(rng, h, h),
        "k": _np_quant_linear(rng, h, kvh),
        "v": _np_quant_linear(rng, h, kvh),
        "o": _np_quant_linear(rng, h, h),
        "post_ln": np.ones((h,), np.float32),
        "gate": _np_quant_linear(rng, h, i),
        "up": _np_quant_linear(rng, h, i),
        "down": _np_quant_linear(rng, i, h),
    }
    lp = jax.device_put(lp)
    x0 = jnp.asarray(rng.standard_normal((BATCH, SEQ, h)) * 0.5,
                     jnp.bfloat16)
    position_ids = jnp.broadcast_to(jnp.arange(SEQ), (BATCH, SEQ))
    causal = jnp.tril(jnp.ones((SEQ, SEQ), jnp.float32))[None, None]
    bias = (1.0 - causal) * jnp.finfo(jnp.float32).min

    if MODE == "mlp":
        from vault_tpu.models.llama import _mlp_block

        def step(lp, x):
            return _mlp_block(lp, cfg, x)
    else:
        def step(lp, x):
            return _layer(lp, cfg, x, bias, position_ids)

    def chained(lp, x0, bias, position_ids, k):
        def body(_, x):
            # residual structure keeps activations bounded; the output
            # IS the next input, so every iteration is data-dependent
            y = step(lp, x)
            return (y * jnp.bfloat16(0.25)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, k, body, x0)[0, 0]

    run = jax.jit(chained)
    t0 = time.time()
    np.asarray(run(lp, x0, bias, position_ids, jnp.int32(1)))
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(lp, x0, bias, position_ids, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    per_layer_ms = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO) * 1e3
    # matmul flops (weight-bearing dots only) for what this mode runs
    if MODE == "mlp":
        gf = 2 * BATCH * SEQ * (3 * h * i) / 1e9
    else:
        gf = 2 * BATCH * SEQ * (h * h * 2 + h * kvh * 2 + 3 * h * i) / 1e9
    print(json.dumps({
        "metric": "llama_layer_flat_ms",
        "value": round(per_layer_ms, 4),
        "unit": "ms/layer",
        "mode": MODE,
        "attn_impl": attn,
        "mlp_impl": mlp,
        "batch": BATCH, "seq": SEQ,
        "approx_matmul_gflops_per_layer": round(gf, 1),
        # GFLOP per ms == TFLOP per s
        "implied_tflops_per_sec": round(gf / per_layer_ms, 1)
        if per_layer_ms > 0 else None,
    }))


if __name__ == "__main__":
    main()
