"""Llama-architecture text tower (BASELINE.json stretch config 5: swap the
BERT tower for Llama-3-8B embeddings feeding the ViLT co-encoder).

From-scratch JAX implementation of the HF ``LlamaModel`` numerical contract:
RMSNorm (pre-norm), rotary position embeddings (rotate-half convention),
grouped-query attention, SwiGLU MLP, no biases, causal + padding mask.
Layers stacked under lax.scan like the other towers.  A projection adapter
(``init_lm_projection``) maps the tower width (4096 for 8B) onto ViLT's 768
before the co-encoder consumes it as inputs_embeds.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.ops.attention import attend
from vault_tpu.ops.nn import init_linear, linear


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    intermediate_size: int = 14336
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    initializer_range: float = 0.02
    # lax.scan unroll factor for the layer stack — semantics-preserving
    # (scan traces ``unroll`` copies of the body per while iteration).
    # 1 = one compiled layer body (fast compile).  >1 lets XLA overlap
    # the next layer's weight fetches with the current layer's matmuls
    # across what would otherwise be a hard loop boundary — a serving
    # knob for the composition gap the round-5 ceiling probe exposed
    # (bare int8 MLP chain 328-348 TFLOP/s vs 213-219 for the full step).
    # Measured on the 8B tower: unroll=4 is 31% SLOWER (docs/BENCHMARKS
    # Llama section) — keep 1 unless re-measured.
    scan_unroll: int = 1
    # attention implementation: "xla" (grouped einsums, _gqa_attend) or
    # "pallas" (ops/pallas_attention.fused_attention_gqa — the fp32
    # score tile stays in VMEM; exactness-tested vs the XLA path).
    # Measured on the flat 8B layer: pallas LOSES ~2% at seq 40
    # (docs/BENCHMARKS.md) — keep xla unless re-measured at long seq.
    attn_impl: str = "xla"
    # MLP implementation: "xla" or "pallas" (ops/pallas_swiglu fused
    # w8a8 RMSNorm->SwiGLU->residual kernel; I-dim tiled so the 3x56 MB
    # weights stream through VMEM once per row tile and the (rows, I)
    # intermediate never touches HBM).  Only takes effect when the
    # gate/up/down projections carry w8a8 params; requant grouping is
    # per-(row, i-tile) — finer than the XLA path's per-row.  Measured
    # on the 8B tower: the kernel wins 17% on the isolated MLP block
    # but loses 26% under the scan (custom-call operands materialize
    # each layer's stacked-weight slice; see pallas_swiglu docstring) —
    # keep "xla" for scanned towers.
    mlp_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_llama_config(**kw) -> LlamaConfig:
    base = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=64, max_position_embeddings=64,
                rope_theta=10000.0)
    base.update(kw)
    return LlamaConfig(**base)


def _rms_norm(weight, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (weight * y).astype(x.dtype)


def _rope(x, position_ids, theta, head_dim):
    """HF rotate-half RoPE: cos/sin over [0, d/2) frequencies, applied as
    x*cos + rotate_half(x)*sin."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                                / head_dim))
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq[None, None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # (B, L, D)
    cos = jnp.cos(emb)[:, None]                          # (B, 1, L, D)
    sin = jnp.sin(emb)[:, None]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


def _init_layer(rng, cfg: LlamaConfig):
    ks = jax.random.split(rng, 7)
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    s = cfg.initializer_range
    return {
        "input_ln": jnp.ones((h,), jnp.float32),
        "q": init_linear(ks[0], h, h, s, bias=False),
        "k": init_linear(ks[1], h, kvh, s, bias=False),
        "v": init_linear(ks[2], h, kvh, s, bias=False),
        "o": init_linear(ks[3], h, h, s, bias=False),
        "post_ln": jnp.ones((h,), jnp.float32),
        "gate": init_linear(ks[4], h, i, s, bias=False),
        "up": init_linear(ks[5], h, i, s, bias=False),
        "down": init_linear(ks[6], i, h, s, bias=False),
    }


def init_llama(rng, cfg: LlamaConfig):
    k_emb, k_layers = jax.random.split(rng)
    layers = [_init_layer(k, cfg)
              for k in jax.random.split(k_layers, cfg.num_hidden_layers)]
    return {
        "embed": jax.random.normal(k_emb, (cfg.vocab_size, cfg.hidden_size),
                                   jnp.float32) * cfg.initializer_range,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": jnp.ones((cfg.hidden_size,), jnp.float32),
    }


def _gqa_attend(q, k, v, bias, rep):
    """Grouped-query attention without materializing repeated K/V.

    HF ``repeat_kv`` + standard attention (modeling_llama.py) tiles each
    of the ``kvh`` K/V heads ``rep`` times so q head ``i`` attends to kv
    head ``i // rep`` — the repeat writes rep x the K/V activations to
    HBM every layer just to feed a contraction that never needed them
    materialized.  This computes the identical math by folding the group
    into the einsum batch dims: q (B, H, L, D) -> (B, kvh, rep, L, D)
    against k/v (B, kvh, L, D).  Contraction order over D is unchanged,
    so results match the repeat form exactly (pinned by a parity test);
    the HF numerical contract (fp32 scores/softmax, dtype cast points)
    is the same as ops/attention.attend_xla."""
    b, h, l, d = q.shape
    kvh = h // rep
    qg = q.reshape(b, kvh, rep, l, d)
    scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d))
    if bias is not None:  # (B, 1, Lq, Lk) -> broadcast over (g, r);
        # a per-head (B, H, Lq, Lk) bias folds into the same grouping
        if bias.shape[1] == 1:
            bias5 = bias[:, :, None]
        else:
            bias5 = bias.reshape(*bias.shape[:1], kvh, rep, *bias.shape[2:])
        scores = scores + bias5.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype).reshape(b, h, l, d)


def _layer(lp, cfg: LlamaConfig, x, bias, position_ids):
    h = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    d = cfg.head_dim
    b, l, _ = x.shape

    y = _rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
    q = linear(lp["q"], y).reshape(b, l, h, d).transpose(0, 2, 1, 3)
    k = linear(lp["k"], y).reshape(b, l, kvh, d).transpose(0, 2, 1, 3)
    v = linear(lp["v"], y).reshape(b, l, kvh, d).transpose(0, 2, 1, 3)
    q = _rope(q, position_ids, cfg.rope_theta, d)
    k = _rope(k, position_ids, cfg.rope_theta, d)
    if cfg.attn_impl == "pallas":
        from vault_tpu.ops.pallas_attention import fused_attention_gqa

        bias4 = jnp.broadcast_to(bias, (b, 1, l, l)).astype(jnp.float32)
        ctx = fused_attention_gqa(q, k, v, bias4)
    elif kvh != h:  # GQA: grouped attention, no materialized K/V repeat
        ctx = _gqa_attend(q, k, v, bias, h // kvh)
    else:
        ctx = attend(q, k, v, bias)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, h * d)
    x = x + linear(lp["o"], ctx)

    return _mlp_block(lp, cfg, x)


def _mlp_block(lp, cfg: LlamaConfig, x):
    """The layer's MLP half: x + down(silu(gate(rms(x))) * up(rms(x)))."""
    if cfg.mlp_impl == "pallas":
        from vault_tpu.ops.pallas_swiglu import swiglu_block

        return swiglu_block(lp["post_ln"], lp["gate"], lp["up"],
                            lp["down"], x, cfg.rms_norm_eps)
    y = _rms_norm(lp["post_ln"], x, cfg.rms_norm_eps)
    mlp = jax.nn.silu(linear(lp["gate"], y)) * linear(lp["up"], y)
    return x + linear(lp["down"], mlp)


def llama_apply(params, cfg: LlamaConfig, input_ids, attention_mask=None,
                position_ids=None):
    """Returns last_hidden_state (B, L, H) with causal+padding masking."""
    b, l = input_ids.shape
    x = params["embed"][input_ids]
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
    causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
    if attention_mask is not None:
        pad = attention_mask.astype(jnp.float32)[:, None, None, :]
        keep = causal * pad
    else:
        keep = causal
    bias = (1.0 - keep) * jnp.finfo(jnp.float32).min

    def body(carry, lp):
        return _layer(lp, cfg, carry, bias, position_ids), None

    x, _ = jax.lax.scan(body, x, params["layers"],
                        unroll=cfg.scan_unroll)
    return _rms_norm(params["final_ln"], x, cfg.rms_norm_eps)


def init_lm_projection(rng, in_dim: int, out_dim: int, stddev: float = 0.02):
    """Width adapter: Llama hidden -> ViLT hidden, applied to the tower's
    last_hidden_state before it enters the co-encoder as inputs_embeds."""
    return init_linear(rng, in_dim, out_dim, stddev)


def llama_params_from_torch(state_dict, cfg: LlamaConfig, prefix: str = ""):
    from vault_tpu.models.convert import strip_prefix, _np

    sd = strip_prefix(state_dict, prefix)
    if any(k.startswith("model.") for k in sd):
        sd = strip_prefix(sd, "model.")

    def lin_t(name):
        return {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}"
        layers.append({
            "input_ln": jnp.asarray(_np(sd[f"{p}.input_layernorm.weight"])),
            "q": lin_t(f"{p}.self_attn.q_proj"),
            "k": lin_t(f"{p}.self_attn.k_proj"),
            "v": lin_t(f"{p}.self_attn.v_proj"),
            "o": lin_t(f"{p}.self_attn.o_proj"),
            "post_ln": jnp.asarray(_np(sd[f"{p}.post_attention_layernorm.weight"])),
            "gate": lin_t(f"{p}.mlp.gate_proj"),
            "up": lin_t(f"{p}.mlp.up_proj"),
            "down": lin_t(f"{p}.mlp.down_proj"),
        })
    return {
        "embed": jnp.asarray(_np(sd["embed_tokens.weight"])),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": jnp.asarray(_np(sd["norm.weight"])),
    }
