"""Probe: is an int8 x int8 -> int32 matmul actually ~2x bf16 on this chip?

The v5e datasheet lists 394 TOPS int8 vs 197 TFLOP/s bf16.  The forward's
matmuls-only floor is already ~87% of the bf16 peak (docs/BENCHMARKS.md
"MFU accounting"), so the only way to push the serving forward further is
to move the projection matmuls onto the int8 MXU path (w8a8: int8 weights
AND dynamically-quantized int8 activations).  Whether XLA actually lowers
``lax.dot_general(int8, int8, preferred_element_type=int32)`` onto the
double-rate MXU path — rather than widening to 32-bit — is a toolchain
property this script measures before any w8a8 code is built.

Timing: bench.py's chained-``fori_loop`` K-slope method (tunnel RTT and
transfers cancel).  Each int8 iteration includes the dynamic per-row
requantization (absmax reduce + scale + round + clip) the real w8a8 path
pays between layers, so the reported ratio is an honest end-to-end bound,
not a bare-matmul best case.

Shapes: the deployed MLP pair (rows=4096, 768<->3072), i.e. batch 16 at
L=256 — the geometry docs/BENCHMARKS.md attributes 87%-of-peak bf16 to.
Round 5 adds PROBE_H / PROBE_I / PROBE_SWIGLU=1 to re-ask the question at
the Llama-8B tower MLP geometry (rows=640 = batch 16 x seq 40, 4096<->
14336, gate/up/silu-mul/down): the full w8a8 tower step implies only
213-219 TFLOP/s against the 394 TOPS int8 nameplate, flat in batch, and
this probe separates "XLA's int8 lowering tops out near 220 at these
shapes" from "the model composition around the matmuls leaves time on
the table".

Output: one JSON line {"bf16_ms": ..., "int8_ms": ..., "ratio": ...,
"int8_implied_tflops": ...}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

ROWS = int(os.environ.get("PROBE_ROWS", "4096"))
H = int(os.environ.get("PROBE_H", "768"))
I = int(os.environ.get("PROBE_I", "3072"))
# SwiGLU chain (gate/up matmuls + silu-mul + down) instead of the 2-matmul
# GELU-free pair — the Llama tower MLP shape (models/llama.py _layer).
SWIGLU = os.environ.get("PROBE_SWIGLU", "0") == "1"
K_LO, K_HI = 4, 44


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, H)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, I)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(I, H)) * 0.02, jnp.bfloat16)
    w1q = jnp.asarray(rng.integers(-127, 128, (H, I)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, (I, H)), jnp.int8)
    if SWIGLU:  # the "up" projection alongside "gate"
        w3 = jnp.asarray(rng.normal(size=(H, I)) * 0.02, jnp.bfloat16)
        w3q = jnp.asarray(rng.integers(-127, 128, (H, I)), jnp.int8)

    # fp -> per-row int8: the SAME dynamic activation quant the deployed
    # w8a8 path uses (one definition; see ops/quantize.py)
    from vault_tpu.ops.quantize import quantize_activation as requant

    def chained_bf16(x, w1, w2, k):
        def body(_, carry):
            xc, acc = carry
            h = jnp.matmul(xc, w1, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            y = jnp.matmul(h, w2, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            return (x + y * jnp.bfloat16(1e-6), acc + y[0, 0])

        _, acc = lax.fori_loop(0, k, body, (x, jnp.bfloat16(0.0)))
        return acc

    def chained_int8(x, w1q, w2q, k):
        xq0, xs0 = requant(x.astype(jnp.float32))

        def body(_, carry):
            xq, xs, acc = carry
            h = jnp.matmul(xq, w1q, preferred_element_type=jnp.int32)
            hf = h.astype(jnp.float32) * xs          # per-row dequant
            hq, hs = requant(hf)                     # dynamic requant
            y = jnp.matmul(hq, w2q, preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * hs
            xq2, xs2 = requant(yf * 1e-6 + xq.astype(jnp.float32))
            return (xq2, xs2, acc + yf[0, 0])

        _, _, acc = lax.fori_loop(0, k, body, (xq0, xs0, jnp.float32(0.0)))
        return acc

    def chained_bf16_swiglu(x, w1, w3, w2, k):
        """gate/up/silu-mul/down — the llama.py _layer MLP composition,
        loop-carried like chained_bf16."""
        def body(_, carry):
            xc, acc = carry
            g = jnp.matmul(xc, w1, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            u = jnp.matmul(xc, w3, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            h = jax.nn.silu(g) * u
            y = jnp.matmul(h, w2, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            return (x + y * jnp.bfloat16(1e-6), acc + y[0, 0])

        _, acc = lax.fori_loop(0, k, body, (x, jnp.bfloat16(0.0)))
        return acc

    def chained_int8_swiglu(x, w1q, w3q, w2q, k):
        """Same composition on the w8a8 path: ONE activation quant feeds
        both gate and up (exactly what nn.linear pays twice today — the
        probe uses the shared-quant form since that's the obvious model-
        side fix if the dots themselves are fast)."""
        xq0, xs0 = requant(x.astype(jnp.float32))

        def body(_, carry):
            xq, xs, acc = carry
            g = jnp.matmul(xq, w1q, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * xs
            u = jnp.matmul(xq, w3q, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * xs
            h = jax.nn.silu(g) * u
            hq, hs = requant(h)
            y = jnp.matmul(hq, w2q, preferred_element_type=jnp.int32
                           ).astype(jnp.float32) * hs
            xq2, xs2 = requant(y * 1e-6 + xq.astype(jnp.float32))
            return (xq2, xs2, acc + y[0, 0])

        _, _, acc = lax.fori_loop(0, k, body, (xq0, xs0, jnp.float32(0.0)))
        return acc

    results = {}
    legs = ((("bf16", chained_bf16_swiglu, (x, w1, w3, w2)),
             ("int8", chained_int8_swiglu, (x, w1q, w3q, w2q)))
            if SWIGLU else
            (("bf16", chained_bf16, (x, w1, w2)),
             ("int8", chained_int8, (x, w1q, w2q))))
    for name, fn, args in legs:
        run = jax.jit(fn)
        np.asarray(run(*args, jnp.int32(1)))  # compile

        def timed(k):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(*args, jnp.int32(k)))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = timed(K_LO), timed(K_HI)
        per_iter_ms = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
        results[f"{name}_ms"] = round(per_iter_ms, 4)
        print(f"{name}: {per_iter_ms:.4f} ms/iter", file=sys.stderr)

    results["ratio"] = round(results["bf16_ms"] / results["int8_ms"], 3)
    # theoretical bf16 floor: 2 matmuls for the pair, 3 for SwiGLU, each
    # 2*ROWS*H*I FLOPs, at the chip's bf16 peak — same env knob as bench.py
    # so the two MFU numbers agree on every chip generation (ADVICE r3)
    flops = (3 if SWIGLU else 2) * 2 * ROWS * H * I
    peak = float(os.environ.get("VAULT_BF16_PEAK_TFLOPS", "197")) * 1e12
    results["bf16_mfu_pct"] = round(
        100 * flops / (results["bf16_ms"] * 1e-3) / peak, 1)
    results["int8_implied_tflops"] = round(
        flops / (results["int8_ms"] * 1e-3) / 1e12, 1)
    results.update(rows=ROWS, h=H, i=I, swiglu=SWIGLU)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
