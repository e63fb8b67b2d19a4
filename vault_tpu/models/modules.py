"""Reusable transformer blocks for the Tom* model families.

Rebuild of vault/modules.py (SURVEY.md §2.3):
  * cross-attention layer: Q from the querying stream, K/V from the queried
    stream, wrapped in a post-LN BERT block WITHOUT self-attention
    (vault/modules.py:22-99; built on HF BertAttention's
    encoder_hidden_states path);
  * cross encoder: stack where only the querying stream updates
    (vault/modules.py:104-166);
  * BertPoolerDim: tanh pooler generalized to arbitrary token indices
    (vault/modules.py:169-207).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from vault_tpu.config import TextTowerConfig
from vault_tpu.ops.attention import attend, merge_heads, split_heads
from vault_tpu.ops.nn import (
    act_fn,
    dropout,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


def init_cross_layer(rng, cfg: TextTowerConfig):
    ks = jax.random.split(rng, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    s = cfg.initializer_range
    return {
        "q": init_linear(ks[0], h, h, s),
        "k": init_linear(ks[1], h, h, s),
        "v": init_linear(ks[2], h, h, s),
        "attn_out": init_linear(ks[3], h, h, s),
        "attn_ln": init_layer_norm(h),
        "mlp_in": init_linear(ks[4], h, i, s),
        "mlp_out": init_linear(ks[5], i, h, s),
        "mlp_ln": init_layer_norm(h),
    }


def init_cross_encoder(rng, cfg: TextTowerConfig, num_layers: Optional[int] = None):
    n = num_layers if num_layers is not None else cfg.num_hidden_layers
    keys = jax.random.split(rng, n)
    layers = [init_cross_layer(k, cfg) for k in keys]
    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}


def cross_layer_apply(lp, cfg: TextTowerConfig, querying, queried, bias,
                      deterministic=True, rng=None, use_pallas="auto"):
    """One cross block: cross-attn + post-LN + MLP + post-LN.  The MLP half
    uses the fused post-LN kernel on TPU (same block shape as a BERT layer;
    in-fusion dropout mask, see models/bert.py)."""
    if rng is not None:
        r_attn, r_out, r_mlp = jax.random.split(rng, 3)
    else:
        r_attn = r_out = r_mlp = None
    q = split_heads(linear(lp["q"], querying), cfg.num_attention_heads)
    k = split_heads(linear(lp["k"], queried), cfg.num_attention_heads)
    v = split_heads(linear(lp["v"], queried), cfg.num_attention_heads)
    ctx = merge_heads(attend(q, k, v, bias, r_attn,
                             cfg.attention_probs_dropout_prob, deterministic))
    attn = linear(lp["attn_out"], ctx)
    attn = dropout(r_out, attn, cfg.hidden_dropout_prob, deterministic)
    x = layer_norm(lp["attn_ln"], querying + attn, cfg.layer_norm_eps)

    from vault_tpu.ops.attention import parse_impl
    _, _, fuse_mlp, _ = parse_impl(use_pallas)
    if fuse_mlp:
        from vault_tpu.ops.pallas_mlp import fused_postln_mlp

        return fused_postln_mlp(lp, cfg, x, r_mlp, deterministic)
    mlp = act_fn(cfg.hidden_act)(linear(lp["mlp_in"], x))
    mlp = linear(lp["mlp_out"], mlp)
    mlp = dropout(r_mlp, mlp, cfg.hidden_dropout_prob, deterministic)
    return layer_norm(lp["mlp_ln"], x + mlp, cfg.layer_norm_eps)


def cross_encoder_apply(params, cfg: TextTowerConfig, querying, queried, bias,
                        deterministic=True, rng=None, use_pallas="auto"):
    """Only the querying stream updates layer-to-layer
    (vault/modules.py:104-166)."""

    def body(carry, lp):
        h, i = carry
        layer_rng = None if rng is None else jax.random.fold_in(rng, i)
        h = cross_layer_apply(lp, cfg, h, queried, bias, deterministic,
                              layer_rng, use_pallas)
        return (h, i + 1), None

    (querying, _), _ = jax.lax.scan(body, (querying, 0), params["layers"])
    return querying


def init_pooler_dim(rng, hidden_size: int, num_tokens: int = 1,
                    stddev: float = 0.02):
    return {"dense": init_linear(rng, hidden_size, hidden_size, stddev)}


def pooler_dim_apply(params, hidden_states, tokens: Union[int, Sequence[int]] = 0):
    """Tanh-pool the given token index/indices (vault/modules.py:169-207)."""
    tok = hidden_states[:, tokens]
    return jnp.tanh(linear(params["dense"], tok))
