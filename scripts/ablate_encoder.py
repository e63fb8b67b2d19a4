#!/usr/bin/env python
"""Co-encoder perf decomposition on the TPU (VERDICT r1 item 4 evidence).

Times the 12-layer ViLT co-encoder block (B=16, L=256, H=768, bf16) and
surgical variants of it with the slope method, so the 6.6 ms forward block
(docs/BENCHMARKS.md component ablation) decomposes into:

  matmuls   the exact matmul sequence alone (QKV, scores, ctx, out, MLP)
            -> the achievable-MXU floor for this shape
  nosoftmax full minus the softmax (scores -> scaled scores @ v)
  noattn    full minus the attention core (attend -> v)
  nolnact   full minus layernorms + GELU
  full      the real layer

Differences between variants attribute time to softmax, LN/GELU, and the
attention-core matmuls; `full - matmuls` is the total non-matmul overhead
XLA fails to hide.  Each variant is one jitted program; run serialized on
the tunnel (~6 min compile each).
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import vilt_b32_config
from vault_tpu.models.vilt import init_vilt
from vault_tpu.ops.attention import merge_heads, split_heads
from vault_tpu.ops.nn import act_fn, layer_norm, linear

B, L = 16, 256
K_LO, K_HI = 2, 22


def make_layer(cfg, with_ln, with_act, attn, with_ln1=None, with_resid=True):
    """attn: 'full' | 'nosoftmax' | 'skip'; with_ln1 overrides the
    attention-entry LN alone (None = follow with_ln); with_resid=False drops
    the two residual adds (attributes the elementwise add passes)."""
    ln = (lambda p, x: layer_norm(p, x, cfg.layer_norm_eps)) if with_ln \
        else (lambda p, x: x)
    ln1 = ln if with_ln1 is None else (
        (lambda p, x: layer_norm(p, x, cfg.layer_norm_eps)) if with_ln1
        else (lambda p, x: x))
    act = act_fn(cfg.hidden_act) if with_act else (lambda x: x)

    def attend(q, k, v, bias):
        if attn == "skip":
            return v
        d = q.shape[-1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (d ** 0.5) + bias
        if attn == "full":
            scores = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", scores.astype(v.dtype), v)

    def layer(lp, x, bias):
        y = ln1(lp["ln_before"], x)
        q = split_heads(linear(lp["q"], y), cfg.num_attention_heads)
        k = split_heads(linear(lp["k"], y), cfg.num_attention_heads)
        v = split_heads(linear(lp["v"], y), cfg.num_attention_heads)
        a = linear(lp["attn_out"], merge_heads(attend(q, k, v, bias)))
        x = x + a if with_resid else a
        y = ln(lp["ln_after"], x)
        m = linear(lp["mlp_out"], act(linear(lp["mlp_in"], y)))
        return x + m if with_resid else m

    return layer


def make_encoder(cfg, layers, variant):
    table = {
        "full": dict(with_ln=True, with_act=True, attn="full"),
        "matmuls": dict(with_ln=False, with_act=False, attn="nosoftmax"),
        "nosoftmax": dict(with_ln=True, with_act=True, attn="nosoftmax"),
        "noattn": dict(with_ln=True, with_act=True, attn="skip"),
        "nolnact": dict(with_ln=False, with_act=False, attn="full"),
        # finer attribution of the residual non-matmul time (round 3,
        # VERDICT item 8 closure evidence):
        "noln1": dict(with_ln=True, with_act=True, attn="full",
                      with_ln1=False),            # full - noln1 = entry LN
        "noresid": dict(with_ln=True, with_act=True, attn="full",
                        with_resid=False),        # full - noresid = resid adds
    }
    layer = make_layer(cfg, **table[variant])

    def encoder(x, bias):
        def body(h, lp):
            return layer(lp, h, bias), None

        x, _ = jax.lax.scan(body, x, layers)
        return x

    return encoder


def measure(cfg, layers, variant):
    enc = make_encoder(cfg, layers, variant)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, L, cfg.hidden_size)) * 0.02,
                     jnp.bfloat16)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)

    def chained(layers, x0, bias, k):
        def body(_, h):
            # renormalize so the chain can't blow up across iterations
            h = h / (jnp.max(jnp.abs(h)) + 1e-3)
            return enc(h, bias)

        return jax.lax.fori_loop(0, k, body, x0)

    run = jax.jit(chained)
    np.asarray(run(layers, x0, bias, jnp.int32(1))[0, 0, 0])

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(layers, x0, bias, jnp.int32(k))[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)


def main():
    cfg = vilt_b32_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    layers = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params["layers"])

    variants = os.environ.get(
        "ABLATE_VARIANTS", "matmuls,nosoftmax,noattn,nolnact,full").split(",")
    for v in variants:
        try:
            s = measure(cfg, layers, v)
            print(json.dumps({"variant": v, "ms": round(s * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
