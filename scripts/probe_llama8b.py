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

Slope-timed like bench.py.  Prints one JSON line per mode with pairs/s,
ms/step, and per-device HBM stats; LLAMA_BENCH_QUANT=both additionally
prints a w8a8-vs-w8 record (speedup + pooled-output divergence from the
same int8 weights — the a8 activation-quant effect in isolation).  Run on
the TPU: python scripts/probe_llama8b.py (expect the ~6 min remote
compile per mode; serialize with other TPU jobs).
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
# LLAMA_BENCH_QUANT: "w8" (default; weight-only int8, bf16 matmuls),
# "w8a8" (activations row-quantized too -> int8 x int8 on the MXU's
# double-rate path), or "both" — time BOTH modes from the SAME int8
# arrays in one session (the w8a8 tree is a host-side re-keying of the
# w8 tree: w_q -> w_q8 selects the int8-matmul path in ops/nn.linear via
# jit-static tree structure, zero extra HBM) and report the pooled-output
# divergence between them (same inputs, k=1 through the chained program).
# The r4 verdict's last big perf lever: the w8 tower measured 56.43
# ms/step at ~94% of the bf16 matmul peak — compute-bound, so int8
# double-rate is the remaining headroom (expect ~1.5-1.9x).
QUANT = os.environ.get("LLAMA_BENCH_QUANT", "w8")
if QUANT not in ("w8", "w8a8", "both"):
    raise SystemExit(f"LLAMA_BENCH_QUANT={QUANT!r}: use w8, w8a8, or both")
# LLAMA_BENCH_TOWER_ONLY=1: time ONLY the Llama tower + LM projection
# (no image patches, no ViLT co-encoder) with the same chained-slope
# method — the decomposition leg for the round-5 ceiling question.  The
# bare int8 SwiGLU chain at this tower's MLP geometry measured 328
# implied TFLOP/s (int8_ceiling_llama_mlp_r640) while the FULL step
# implies 213-219, and full-minus-tower separates "the gap is ViLT-side
# + glue" from "the gap is inside the tower layers" before any kernel
# work.  Reported under a DIFFERENT metric name so bench.py's
# best-recorded-Llama selection (full-forward rows only) never picks it.
TOWER_ONLY = os.environ.get("LLAMA_BENCH_TOWER_ONLY", "0") == "1"


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
    # lax.scan unroll factor (semantics-preserving; see LlamaConfig) —
    # the queue-10 experiment for the scan-boundary pipelining hypothesis
    unroll = int(os.environ.get("LLAMA_BENCH_UNROLL", "1"))
    # attention impl: "xla" or "pallas" (fused_attention_gqa)
    attn = os.environ.get("LLAMA_BENCH_ATTN", "xla")
    # MLP impl: "xla" or "pallas" (ops/pallas_swiglu fused w8a8 kernel;
    # only takes effect on the w8a8 leg — w8 params fall back to XLA)
    mlp = os.environ.get("LLAMA_BENCH_MLP", "xla")
    if os.environ.get("LLAMA_BENCH_TINY") == "1":
        # CPU smoke of the exact probe code path (flag combos, the chained
        # loop, the JSON shape) at toy geometry — tests/
        # test_bench_scripts_smoke.py runs this before a tunnel window is
        # spent on the real 8B compile
        from vault_tpu.models.llama import tiny_llama_config
        llama_cfg = tiny_llama_config(vocab_size=512, scan_unroll=unroll,
                                      attn_impl=attn, mlp_impl=mlp)
    else:
        llama_cfg = LlamaConfig(scan_unroll=unroll,  # Llama-3-8B geometry
                                attn_impl=attn, mlp_impl=mlp)
    vilt_cfg = ViltConfig()

    t0 = time.time()
    llama = build_llama_w8(llama_cfg)
    print(f"host init+quant: {time.time() - t0:.1f}s", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    vilt = None if TOWER_ONLY else init_vilt(k1, vilt_cfg)
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

    params = {"llama": llama, "lm_proj": bf16(proj)}
    if not TOWER_ONLY:
        params["vilt"] = bf16(vilt)
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

    def rekey_w8a8(tree):
        """w8 -> w8a8 param view: same int8/scale device arrays, the
        linear dicts re-keyed w_q -> w_q8 (ops/nn.linear dispatches on the
        jit-static tree structure, so this flips every tower matmul to the
        int8 x int8 MXU path with ZERO extra HBM — both modes cannot
        otherwise fit on one chip for a same-session A/B)."""
        if isinstance(tree, dict):
            return {("w_q8" if k == "w_q" else k): rekey_w8a8(v)
                    for k, v in tree.items()}
        return tree

    # all inputs loop-carried: the first run of this probe fed back only
    # pixel_values and XLA hoisted the ENTIRE 8B text tower out of the
    # loop, reporting a physically impossible 6.91 ms/step (>= 24 ms at
    # int8 peak) — vault_tpu/utils/benchloop.py documents the hazard
    if TOWER_ONLY:
        from vault_tpu.models.llama import llama_apply
        from vault_tpu.ops.nn import linear

        batch = {k: batch[k] for k in ("input_ids", "attention_mask")}

        def tower_fwd(p, b):
            hidden = llama_apply(p["llama"], llama_cfg, b["input_ids"],
                                 b["attention_mask"])
            return linear(p["lm_proj"], hidden)[:, 0]

        chained = make_chained_forward(tower_fwd,
                                       (BATCH, vilt_cfg.hidden_size))
    else:
        chained = make_chained_forward(
            lambda p, b: vault_with_llama_tower(
                p, vilt_cfg, llama_cfg, **b).pooler_output,
            (BATCH, vilt_cfg.hidden_size))
    run = jax.jit(chained)

    # matmul FLOPs: llama tower 2*N_active*B*L (weight FLOPs; ~7.5e9
    # matmul params/tok) + the vilt side, scaled from bench.py's 861 GF
    # batch-16 derivation (docs/BENCHMARKS.md "MFU accounting") — both
    # terms must scale with BATCH or non-default LLAMA_BENCH_BATCH runs
    # misreport the ViLT contribution
    llama_gf = 2 * 7.50e9 * BATCH * SEQ / 1e9
    vilt_gf = 0.0 if TOWER_ONLY else 861 * BATCH / 16

    def measure(mode):
        p = {**params, "llama": rekey_w8a8(params["llama"])} \
            if mode == "w8a8" else params
        t0 = time.time()
        pooled = np.asarray(run(p, batch, jnp.int32(1)))
        print(f"[{mode}] compile+first step: {time.time() - t0:.1f}s",
              file=sys.stderr)

        def timed(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(p, batch, jnp.int32(k)))
                best = min(best, time.perf_counter() - t0)
            return best

        per_step = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)

        # param-tree footprint from array metadata (no value fetch): the
        # floor of HBM in use, reported even when the tunnel backend
        # returns no memory_stats (the first run came back all-null)
        mem = {"params_bytes": int(sum(
            x.nbytes for x in jax.tree.leaves(p) if hasattr(x, "nbytes")))}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            mem.update({"hbm_bytes_in_use": stats.get("bytes_in_use"),
                        "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
                        "hbm_limit_bytes": stats.get("bytes_limit")})
            if not stats:
                mem["hbm_stats_note"] = "backend returned no memory_stats"
        except Exception as e:  # tunnel backends may not expose stats
            mem["hbm_stats_error"] = str(e)

        implied_tflops = (llama_gf + vilt_gf) / per_step / 1e3
        # physical-sanity guard: w8 matmuls run bf16 (dequant on load), so
        # the ceiling is the v5e bf16 peak; w8a8's is the int8 double rate.
        # An implied rate above the ceiling means work was optimized out
        # of the loop (exactly the first run's failure mode)
        peak = float(os.environ.get(
            "VAULT_INT8_PEAK_TOPS" if mode == "w8a8"
            else "VAULT_BF16_PEAK_TFLOPS",
            "394" if mode == "w8a8" else "197"))
        suspect = implied_tflops > peak
        if suspect:
            print(f"WARNING: implied {implied_tflops:.0f} TFLOP/s exceeds "
                  f"the {peak:.0f} {mode} peak — part of the model was "
                  "optimized out of the timing loop", file=sys.stderr)
        print(json.dumps({
            "metric": ("llama8b_tower_only_pairs_per_sec_per_chip"
                       if TOWER_ONLY else
                       "llama8b_vault_forward_pairs_per_sec_per_chip"),
            "value": round(BATCH / per_step, 2),
            "unit": "pairs/sec/chip",
            "ms_per_step": round(per_step * 1e3, 2),
            "batch": BATCH,
            "tower": f"llama3-8B-geometry {mode}",
            "approx_matmul_gflops_per_step": round(llama_gf + vilt_gf, 0),
            "implied_tflops_per_sec": round(implied_tflops, 1),
            **({"suspect": f"implied rate exceeds {mode} peak"}
               if suspect else {}),
            **({"scan_unroll": unroll} if unroll != 1 else {}),
            **({"attn_impl": attn} if attn != "xla" else {}),
            **({"mlp_impl": mlp} if mlp != "xla" else {}),
            **mem,
        }), flush=True)
        return pooled, per_step

    modes = ("w8", "w8a8") if QUANT == "both" else (QUANT,)
    results = {m: measure(m) for m in modes}
    if QUANT == "both":
        a, b = results["w8"][0].astype(np.float32), \
               results["w8a8"][0].astype(np.float32)
        print(json.dumps({
            "metric": "llama8b_w8a8_vs_w8",
            "speedup": round(results["w8"][1] / results["w8a8"][1], 3),
            "pooled_max_abs_diff": round(float(np.abs(a - b).max()), 4),
            "pooled_mean_abs_diff": round(float(np.abs(a - b).mean()), 5),
            "pooled_rms": round(float(np.sqrt((a * a).mean())), 4),
            "batch": BATCH,
        }), flush=True)


if __name__ == "__main__":
    main()
