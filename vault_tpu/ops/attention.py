"""Multi-head self-attention core.

Numerics mirror HF BERT/ViLT self-attention (modeling_vilt.py ViltSelfAttention):
scores = q k^T / sqrt(head_dim) + additive bias; softmax (fp32); probs @ v.

Two execution paths, selected via ``use_pallas``:
  * XLA path (default; always available, used on CPU test meshes).
  * Pallas fused kernel (TPU; see vault_tpu/ops/pallas_attention.py) that keeps
    the whole (L, L) score tile in VMEM and fuses mask-add + softmax + pv into
    one kernel — the co-encoder hot loop identified in SURVEY.md §3 runs here.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


# What "auto" resolves to on TPU: measured 7.63 vs 8.68 ms XLA full-model
# at batch 16 on v5e (docs/BENCHMARKS.md) — fused (H,3H) QKV matmul + the
# fused LN->MLP->residual kernel; the XLA attention core stays (it beats
# every Pallas attention variant tried at L=256/d=64).
TPU_DEFAULT_IMPL = "fuseqkv+fusemlp"


def parse_impl(use_pallas):
    """The ``use_pallas`` knob is an implementation selector: False (XLA),
    True/"batched" (Pallas attention, heads looped in-kernel), "grid"
    (Pallas, (B,H) grid), "dotbatch" (Pallas, one batched dot_general over
    heads per batch row); "+"-combinable modifiers: "fuseqkv" computes Q/K/V
    with one fused (H, 3H) matmul, "fuselnqkv" additionally folds the
    pre-LN LayerNorm into that matmul's Pallas kernel, "fusemlp" runs the
    pre-LN MLP block through the fused Pallas kernel (ops/pallas_mlp.py).
    "auto" resolves to TPU_DEFAULT_IMPL on a TPU backend and False
    elsewhere.  Returns (fuse_qkv, fuse_lnqkv, fuse_mlp, attn_impl)."""
    if use_pallas == "auto":
        use_pallas = (TPU_DEFAULT_IMPL
                      if jax.default_backend() == "tpu" else False)
    elif use_pallas in ("false", "False", "0", "none", "off"):
        use_pallas = False  # CLI string forms
    if not isinstance(use_pallas, str):
        return False, False, False, use_pallas
    parts = [p for p in use_pallas.split("+") if p]
    fuse = "fuseqkv" in parts
    fuse_lnqkv = "fuselnqkv" in parts
    fuse_mlp = "fusemlp" in parts
    rest = [p for p in parts
            if p not in ("fuseqkv", "fuselnqkv", "fusemlp")]
    # unknown tokens must FAIL, not silently select a (slower) pallas
    # attention core — a typo like "fuse_mlp" would otherwise both drop
    # the intended fusion and change the attention impl
    bad = [p for p in rest if p not in ("grid", "batched", "dotbatch")]
    if bad:
        raise ValueError(
            f"unknown use_pallas token(s) {bad}; valid: fuseqkv, fuselnqkv, "
            f"fusemlp, grid, batched, dotbatch, auto, false")
    return fuse, fuse_lnqkv, fuse_mlp, (rest[0] if rest else False)


def parse_attn_impl(use_pallas):
    """(fuse_qkv, attn_impl) — see :func:`parse_impl`."""
    fuse, _, _, impl = parse_impl(use_pallas)
    return fuse, impl


def project_qkv(lp, y: jax.Array, num_heads: int, fuse: bool = False):
    """Q/K/V projections -> (B, heads, L, head_dim) each.  With ``fuse``,
    the three (H, H) matmuls run as one (H, 3H) matmul — fewer, fatter MXU
    calls (numerically identical: same contractions, fp32 accumulation).
    Quantized weights (ops/quantize.py w8 {w_q}/w8a8 {w_q8}) fuse the same
    way: weights concat along out, per-out-channel scales concat along out
    — for w8a8 this also quantizes the activations ONCE instead of three
    times (the per-row scale is the same y either way)."""
    from vault_tpu.ops.nn import linear

    wk = next((k for k in ("w", "w_q", "w_q8") if k in lp["q"]), None)
    if fuse and wk is not None:
        fused = {wk: jnp.concatenate(
            [lp["q"][wk], lp["k"][wk], lp["v"][wk]], axis=1)}
        if wk != "w":
            fused["w_scale"] = jnp.concatenate(
                [lp["q"]["w_scale"], lp["k"]["w_scale"], lp["v"]["w_scale"]],
                axis=-1)
        if "b" in lp["q"]:  # qkv_bias=False models carry no bias leaves
            fused["b"] = jnp.concatenate(
                [lp["q"]["b"], lp["k"]["b"], lp["v"]["b"]])
        q, k, v = jnp.split(linear(fused, y), 3, axis=-1)
    else:
        q, k, v = linear(lp["q"], y), linear(lp["k"], y), linear(lp["v"], y)
    return (split_heads(q, num_heads), split_heads(k, num_heads),
            split_heads(v, num_heads))


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H) -> (B, heads, L, head_dim)."""
    b, l, h = x.shape
    return x.reshape(b, l, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, heads, L, head_dim) -> (B, L, H)."""
    b, n, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * d)


def attend_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
) -> jax.Array:
    """Reference XLA attention. q/k/v: (B, heads, L, D); bias broadcastable to
    (B, heads, Lq, Lk)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(head_dim))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _pallas_dispatch(q, k, v, bias, impl):
    from vault_tpu.ops import pallas_attention as pa

    fn = {"grid": pa.fused_attention,
          "batched": pa.fused_attention_batched,
          "dotbatch": pa.fused_attention_dotbatch}.get(impl,
                                                       pa.fused_attention_batched)
    return fn(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_attend(q, k, v, bias, impl=True):
    return _pallas_dispatch(q, k, v, bias, impl)


def _pallas_attend_fwd(q, k, v, bias, impl=True):
    # custom_vjp fwd receives args in the ORIGINAL order (nondiff args are
    # prepended only for bwd)
    return _pallas_attend(q, k, v, bias, impl), (q, k, v, bias)


def _pallas_attend_bwd(impl, residuals, g):
    # backward recomputed through the XLA path (flash-style recompute: the
    # forward never materialized probs, so the bwd re-derives them)
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q, k, v: attend_xla(q, k, v, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_pallas_attend.defvjp(_pallas_attend_fwd, _pallas_attend_bwd)


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    use_pallas=False,
) -> jax.Array:
    _, impl = parse_attn_impl(use_pallas)
    if impl and deterministic:
        if bias is None:
            b, _, l, _ = q.shape
            bias = jnp.zeros((b, 1, 1, l), jnp.float32)
        return _pallas_attend(q, k, v, bias, impl)
    return attend_xla(q, k, v, bias, dropout_rng, dropout_rate, deterministic)
