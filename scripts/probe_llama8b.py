#!/usr/bin/env python
"""BASELINE config 5 at HONEST scale: Llama-3-8B-geometry text tower
(random init — no checkpoints can download here) feeding the ViLT
co-encoder (`vault_with_llama_tower`), batched inference on ONE v5e chip.

The bf16 8B tower is ~16 GB — right at the 15.75 GB HBM limit — so the
tower ships w8-quantized (~8.1 GB int8 + per-channel scales; ops/
quantize.py, dequant fused into the matmul operand load), leaving room
for the bf16 embed table, the ViLT side, and activations.  Weights are
initialized AND quantized host-side in numpy (an on-device fp32 init
would need 32 GB), then placed once; the jitted step takes the param
tree as an argument (tunnel gotcha: closed-over trees bake into the HLO
and 413 the compile relay).

Slope-timed like bench.py.  Prints one JSON line with pairs/s, ms/step,
and per-device HBM stats.  Run on the TPU: python scripts/probe_llama8b.py
(expect the ~6 min remote compile; serialize with other TPU jobs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import ViltConfig
from vault_tpu.models.llama import LlamaConfig
from vault_tpu.models.vault import vault_with_llama_tower
from vault_tpu.models.vilt import init_vilt
from vault_tpu.utils.benchloop import make_chained_forward

BATCH = int(os.environ.get("LLAMA_BENCH_BATCH", 16))
SEQ = 40
CANVAS = tuple(int(v) for v in
               os.environ.get("LLAMA_BENCH_CANVAS", "384,608").split(","))
K_LO, K_HI = 2, 6


def _np_quant_linear(rng, in_dim, out_dim):
    """Host-side init + w8 quantization in one pass, matching
    ops/quantize.quantize_weight's format exactly ({w_q int8, w_scale
    (1, out) fp32}, absmax/127 per out-channel)."""
    w = (rng.standard_normal((in_dim, out_dim), dtype=np.float32) * 0.02)
    absmax = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8)
    scale = absmax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w_q": q, "w_scale": scale.astype(np.float32)}


def build_llama_w8(cfg: LlamaConfig, seed=0):
    rng = np.random.default_rng(seed)
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    layers = []
    for li in range(cfg.num_hidden_layers):
        layers.append({
            "input_ln": np.ones((h,), np.float32),
            "q": _np_quant_linear(rng, h, h),
            "k": _np_quant_linear(rng, h, kvh),
            "v": _np_quant_linear(rng, h, kvh),
            "o": _np_quant_linear(rng, h, h),
            "post_ln": np.ones((h,), np.float32),
            "gate": _np_quant_linear(rng, h, i),
            "up": _np_quant_linear(rng, h, i),
            "down": _np_quant_linear(rng, i, h),
        })
        print(f"init layer {li + 1}/{cfg.num_hidden_layers}", file=sys.stderr)
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    embed = (rng.standard_normal((cfg.vocab_size, cfg.hidden_size),
                                 dtype=np.float32) * 0.02)
    return {
        "embed": embed.astype(jnp.bfloat16),
        "layers": stacked,
        "final_ln": np.ones((cfg.hidden_size,), np.float32),
    }


def main():
    if os.environ.get("LLAMA_BENCH_TINY") == "1":
        # CPU smoke of the exact probe code path (flag combos, the chained
        # loop, the JSON shape) at toy geometry — tests/
        # test_bench_scripts_smoke.py runs this before a tunnel window is
        # spent on the real 8B compile
        from vault_tpu.models.llama import tiny_llama_config
        llama_cfg = tiny_llama_config(vocab_size=512)
    else:
        llama_cfg = LlamaConfig()       # Llama-3-8B geometry
    vilt_cfg = ViltConfig()

    t0 = time.time()
    llama = build_llama_w8(llama_cfg)
    print(f"host init+quant: {time.time() - t0:.1f}s", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    vilt = init_vilt(k1, vilt_cfg)
    proj = {"w": np.asarray(jax.random.normal(
                k2, (llama_cfg.hidden_size, vilt_cfg.hidden_size),
                jnp.float32) * 0.02),
            "b": np.zeros((vilt_cfg.hidden_size,), np.float32)}

    def bf16(t):
        # dtype check must not touch values: np.asarray(x) would fetch
        # every leaf host-side through the tunnel just to read its dtype
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, t)

    params = {"llama": llama, "vilt": bf16(vilt), "lm_proj": bf16(proj)}
    t0 = time.time()
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"device_put: {time.time() - t0:.1f}s", file=sys.stderr)

    drng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            drng.integers(0, llama_cfg.vocab_size, (BATCH, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((BATCH, SEQ), jnp.int32),
        "token_type_ids": jnp.zeros((BATCH, SEQ), jnp.int32),
        "pixel_values": jnp.asarray(drng.normal(size=(BATCH, 3, *CANVAS)),
                                    jnp.bfloat16),
        "pixel_mask": jnp.ones((BATCH, *CANVAS), jnp.int32),
    }

    # all inputs loop-carried: the first run of this probe fed back only
    # pixel_values and XLA hoisted the ENTIRE 8B text tower out of the
    # loop, reporting a physically impossible 6.91 ms/step (>= 24 ms at
    # int8 peak) — vault_tpu/utils/benchloop.py documents the hazard
    chained = make_chained_forward(
        lambda p, b: vault_with_llama_tower(
            p, vilt_cfg, llama_cfg, **b).pooler_output,
        (BATCH, vilt_cfg.hidden_size))

    run = jax.jit(chained)
    t0 = time.time()
    np.asarray(run(params, batch, jnp.int32(1)))
    print(f"compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)

    # param-tree footprint from array metadata (no value fetch): the floor
    # of HBM in use, reported even when the tunnel backend returns no
    # memory_stats (the first run came back with all-null hbm fields)
    mem = {"params_bytes": int(sum(x.nbytes for x in jax.tree.leaves(params)
                                   if hasattr(x, "nbytes")))}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem.update({"hbm_bytes_in_use": stats.get("bytes_in_use"),
                    "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
                    "hbm_limit_bytes": stats.get("bytes_limit")})
        if not stats:
            mem["hbm_stats_note"] = "backend returned no memory_stats"
    except Exception as e:  # tunnel backends may not expose stats
        mem["hbm_stats_error"] = str(e)

    # matmul FLOPs: llama tower 2*N_active*B*L (weight FLOPs; ~7.5e9
    # matmul params/tok) + the vilt side, scaled from bench.py's 861 GF
    # batch-16 derivation (docs/BENCHMARKS.md "MFU accounting") — both
    # terms must scale with BATCH or non-default LLAMA_BENCH_BATCH runs
    # misreport the ViLT contribution
    llama_gf = 2 * 7.50e9 * BATCH * SEQ / 1e9
    vilt_gf = 861 * BATCH / 16
    implied_tflops = (llama_gf + vilt_gf) / per_step / 1e3
    # physical-sanity guard: the tower is w8 so the relevant ceiling is
    # the v5e int8 peak (394 TOPS); an implied rate above it means work
    # was optimized out of the loop (exactly the first run's failure mode)
    int8_peak = float(os.environ.get("VAULT_INT8_PEAK_TOPS", "394"))
    suspect = implied_tflops > int8_peak
    if suspect:
        print(f"WARNING: implied {implied_tflops:.0f} TFLOP/s exceeds the "
              f"{int8_peak:.0f} TOPS int8 peak — part of the model was "
              "optimized out of the timing loop", file=sys.stderr)
    print(json.dumps({
        "metric": "llama8b_vault_forward_pairs_per_sec_per_chip",
        "value": round(BATCH / per_step, 2),
        "unit": "pairs/sec/chip",
        "ms_per_step": round(per_step * 1e3, 2),
        "batch": BATCH,
        "tower": "llama3-8B-geometry w8",
        "approx_matmul_gflops_per_step": round(llama_gf + vilt_gf, 0),
        "implied_tflops_per_sec": round(implied_tflops, 1),
        **({"suspect": "implied rate exceeds int8 peak"} if suspect else {}),
        **mem,
    }))


if __name__ == "__main__":
    main()
