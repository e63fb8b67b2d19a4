"""BERT / RoBERTa (BERTweet) language tower — pure-functional JAX.

Re-implements the numerical contract of HF ``BertModel`` /
``RobertaModel(add_pooling_layer=False)`` as the reference uses it for the
VAuLT LM tower (vault/models/vault/model.py:82-86, 118-122, 189-190):
post-LayerNorm encoder, exact GELU, additive attention mask, fp32 LayerNorm.

TPU-first design: the 12 encoder layers are stacked along a leading axis and
executed with ``lax.scan`` (single compiled layer body; fast compile, natural
rematerialization point), instead of Python-level per-layer modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vault_tpu.config import TextTowerConfig
from vault_tpu.ops.attention import (
    attend,
    merge_heads,
    parse_impl,
    project_qkv,
    split_heads,
)
from vault_tpu.ops.masks import extend_attention_mask
from vault_tpu.ops.nn import (
    act_fn,
    dropout,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_layer(rng, cfg: TextTowerConfig):
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


def init_bert(rng, cfg: TextTowerConfig):
    k_emb, k_layers = jax.random.split(rng)
    ke = jax.random.split(k_emb, 3)
    embeddings = {
        "word": init_embedding(ke[0], cfg.vocab_size, cfg.hidden_size,
                               cfg.initializer_range, padding_idx=cfg.pad_token_id),
        "position": init_embedding(ke[1], cfg.max_position_embeddings,
                                   cfg.hidden_size, cfg.initializer_range),
        "token_type": init_embedding(ke[2], cfg.type_vocab_size, cfg.hidden_size,
                                     cfg.initializer_range),
        "ln": init_layer_norm(cfg.hidden_size),
    }
    layer_keys = jax.random.split(k_layers, cfg.num_hidden_layers)
    per_layer = [_init_layer(k, cfg) for k in layer_keys]
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return {"embeddings": embeddings, "layers": layers}


def grow_word_embeddings(bert_params, new_size: int, rng=None,
                         stddev: float = 0.02):
    """Grow a BERT tower's word table to ``new_size`` rows (new rows
    normal(0, stddev)) — HF resize_token_embeddings semantics, used by
    TomBERT's resize (reference vault/models/tombert/model.py:185-187)."""
    table = bert_params["embeddings"]["word"]
    old, dim = table.shape
    if new_size <= old:
        return bert_params
    if rng is None:
        rng = jax.random.PRNGKey(0)
    extra = jax.random.normal(rng, (new_size - old, dim), table.dtype) * stddev
    return {**bert_params,
            "embeddings": {**bert_params["embeddings"],
                           "word": jnp.concatenate([table, extra], axis=0)}}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def roberta_position_ids(input_ids, attention_mask, pad_token_id: int):
    """HF ``create_position_ids_from_input_ids``: positions count non-pad
    tokens, offset by padding_idx; pad positions get padding_idx."""
    if attention_mask is None:
        mask = (input_ids != pad_token_id).astype(jnp.int32)
    else:
        mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def bert_embed(params, cfg: TextTowerConfig, input_ids, token_type_ids=None,
               position_ids=None, inputs_embeds=None, attention_mask=None,
               deterministic=True, rng=None):
    emb = params["embeddings"]
    if inputs_embeds is None:
        inputs_embeds = emb["word"][input_ids]
    b, l = inputs_embeds.shape[:2]
    if position_ids is None:
        if cfg.position_embedding_style == "roberta":
            if input_ids is not None:
                position_ids = roberta_position_ids(input_ids, attention_mask, cfg.pad_token_id)
            else:
                position_ids = jnp.broadcast_to(
                    jnp.arange(cfg.pad_token_id + 1, l + cfg.pad_token_id + 1), (b, l))
        else:
            position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, l), jnp.int32)

    x = inputs_embeds + emb["position"][position_ids] + emb["token_type"][token_type_ids]
    x = layer_norm(emb["ln"], x, cfg.layer_norm_eps)
    x = dropout(rng, x, cfg.hidden_dropout_prob, deterministic)
    return x


def _encoder_layer(lp, cfg: TextTowerConfig, x, bias, deterministic, rng,
                   use_pallas="auto"):
    """One post-LN BERT layer."""
    if rng is not None:
        r_attn, r_attn_out, r_mlp = jax.random.split(rng, 3)
    else:
        r_attn = r_attn_out = r_mlp = None
    fuse_qkv, _, fuse_mlp, _ = parse_impl(use_pallas)
    q, k, v = project_qkv(lp, x, cfg.num_attention_heads, fuse_qkv)
    ctx = merge_heads(attend(q, k, v, bias, r_attn,
                             cfg.attention_probs_dropout_prob, deterministic,
                             use_pallas=use_pallas))
    attn = linear(lp["attn_out"], ctx)
    attn = dropout(r_attn_out, attn, cfg.hidden_dropout_prob, deterministic)
    x = layer_norm(lp["attn_ln"], x + attn, cfg.layer_norm_eps)

    if fuse_mlp:
        from vault_tpu.ops.pallas_mlp import fused_postln_mlp

        return fused_postln_mlp(lp, cfg, x, r_mlp, deterministic)
    mlp = act_fn(cfg.hidden_act)(linear(lp["mlp_in"], x))
    mlp = linear(lp["mlp_out"], mlp)
    mlp = dropout(r_mlp, mlp, cfg.hidden_dropout_prob, deterministic)
    x = layer_norm(lp["mlp_ln"], x + mlp, cfg.layer_norm_eps)
    return x


def bert_encode(params, cfg: TextTowerConfig, x, attention_mask,
                deterministic=True, rng=None, use_pallas="auto", remat=False,
                bias=None):
    """Run the stacked encoder with lax.scan over layers.  ``bias`` (a
    prebuilt additive mask) takes precedence over ``attention_mask``."""
    if bias is None and attention_mask is not None:
        bias = extend_attention_mask(attention_mask, jnp.float32)

    def body(carry, inp):
        h, i = carry
        lp = inp
        layer_rng = None if rng is None else jax.random.fold_in(rng, i)
        from vault_tpu.ops.nn import maybe_remat
        fn = maybe_remat(_encoder_layer, remat, static_argnums=(1, 4, 6))
        h = fn(lp, cfg, h, bias, deterministic, layer_rng, use_pallas)
        return (h, i + 1), None

    (x, _), _ = jax.lax.scan(body, (x, 0), params["layers"])
    return x


def bert_apply(params, cfg: TextTowerConfig, input_ids=None, attention_mask=None,
               token_type_ids=None, position_ids=None, inputs_embeds=None,
               deterministic=True, rng=None, use_pallas="auto", remat=False):
    """Full tower: embeddings + encoder.  Returns last_hidden_state (B, L, H).

    Mirrors ``self.bert(**bert_kwargs).last_hidden_state`` at
    vault/models/vault/model.py:189-190.
    """
    if rng is not None:
        r_emb, r_enc = jax.random.split(rng)
    else:
        r_emb = r_enc = None
    x = bert_embed(params, cfg, input_ids, token_type_ids, position_ids,
                   inputs_embeds, attention_mask, deterministic, r_emb)
    return bert_encode(params, cfg, x, attention_mask, deterministic, r_enc,
                       use_pallas, remat)
