"""TomBERT (IJCAI'19 re-implementation) — JAX rebuild.

Reference: vault/models/tombert/model.py:14-447.  Architecture:
tweet-BERT over tweet(+target) text; target-BERT over the target alone;
ResNet 7x7 regions -> linear map to text dim -> cross encoder where the
TARGET representation queries the regions -> tanh-pool token 0 ->
[pooled-visual token ; tweet sequence] -> BERT encoder stack -> pooling
("first" = visual token 0 / "cls" = token 1 / "both" = [0,1]) -> classifier.

``init_tombert_from_bert`` mirrors the reference's from_pretrained surgery
(model.py:131-183): one BERT checkpoint populates the tweet tower, target
tower, multimodal encoder AND cross encoder.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vault_tpu.config import TextTowerConfig
from vault_tpu.models import bert as bert_mod
from vault_tpu.models.modules import (
    cross_encoder_apply,
    init_cross_encoder,
    init_pooler_dim,
    pooler_dim_apply,
)
from vault_tpu.models.resnet import init_resnet, resnet_embed
from vault_tpu.ops.masks import extend_attention_mask
from vault_tpu.ops.nn import dropout, init_linear, linear


def init_tombert(rng, cfg: TextTowerConfig, n_classes: int = 3,
                 pooling: str = "first", vis_emb_dim: int = 2048,
                 num_hidden_cross_layers: Optional[int] = None,
                 resnet_depth: Optional[int] = None,
                 tie_target_bert: bool = False):
    """``tie_target_bert`` mirrors the reference's ``tie_target_bert_weights``
    (tombert/model.py:164-165): the target tower IS the tweet tower.  In the
    functional design that means the params tree simply has no
    "target_bert" subtree — apply reuses "tweet_bert", so gradients from
    both call sites accumulate into one set of weights."""
    ks = jax.random.split(rng, 8)
    params: Dict = {
        "tweet_bert": bert_mod.init_bert(ks[0], cfg),
        "target_bert": bert_mod.init_bert(ks[1], cfg),
        "vis_mapper": init_linear(ks[2], vis_emb_dim, cfg.hidden_size,
                                  cfg.initializer_range),
        "cross": init_cross_encoder(ks[3], cfg, num_hidden_cross_layers),
        "cross_pooler": init_pooler_dim(ks[4], cfg.hidden_size),
        # multimodal encoder = a BERT encoder stack (layers only)
        "mm_encoder": {"layers": bert_mod.init_bert(ks[5], cfg)["layers"]},
        "out_pooler": init_pooler_dim(ks[6], cfg.hidden_size),
        "classifier": init_linear(
            ks[7], cfg.hidden_size * (2 if pooling == "both" else 1),
            n_classes, cfg.initializer_range),
    }
    if tie_target_bert:
        del params["target_bert"]
    if resnet_depth is not None:
        params["resnet"] = init_resnet(jax.random.fold_in(rng, 99), resnet_depth)
    return params


def init_tombert_from_bert(bert_params, rng, cfg: TextTowerConfig,
                           n_classes: int = 3, pooling: str = "first",
                           vis_emb_dim: int = 2048,
                           num_hidden_cross_layers: Optional[int] = None,
                           resnet_params=None, tweet_params=None,
                           tie_target_bert: bool = False):
    """The reference's weight surgery: one pretrained BERT seeds all four
    text stacks (vault/models/tombert/model.py:162-176).  ``tweet_params``
    mirrors ``pretrained_tweet_model_name_or_path`` (:154-160): when given,
    the tweet AND target towers take those weights instead, while the
    multimodal/cross encoders still seed from ``bert_params``."""
    params = init_tombert(rng, cfg, n_classes, pooling, vis_emb_dim,
                          num_hidden_cross_layers,
                          tie_target_bert=tie_target_bert)
    towers = tweet_params if tweet_params is not None else bert_params
    params["tweet_bert"] = jax.tree.map(jnp.copy, towers)
    if not tie_target_bert:
        params["target_bert"] = jax.tree.map(jnp.copy, towers)
    params["mm_encoder"] = {"layers": jax.tree.map(jnp.copy, bert_params["layers"])}
    n_cross = jax.tree.leaves(params["cross"]["layers"])[0].shape[0]
    n_bert = jax.tree.leaves(bert_params["layers"])[0].shape[0]
    if n_cross <= n_bert:
        params["cross"] = {"layers": jax.tree.map(
            lambda x: jnp.copy(x[:n_cross]), bert_params["layers"])}
    else:
        # deeper cross encoder than the donor: seed the first n_bert layers
        # and keep the extras random — torch's strict=False load_state_dict
        # behavior the reference relies on (tombert/model.py:173-176)
        params["cross"] = {"layers": jax.tree.map(
            lambda rand, donor: jnp.concatenate(
                [jnp.copy(donor), rand[n_bert:]], axis=0),
            params["cross"]["layers"], bert_params["layers"])}
    if resnet_params is not None:
        params["resnet"] = resnet_params
    return params


def tombert_apply(params, cfg: TextTowerConfig, input_ids, target_input_ids,
                  visual_embeddings=None, images=None, token_type_ids=None,
                  target_type_ids=None, attention_mask=None,
                  target_attention_mask=None, pooling: str = "first",
                  resnet_depth: int = 101, train_image_encoder: bool = False,
                  tweet_cfg: "TextTowerConfig | None" = None,
                  deterministic=True, rng=None, return_embeddings=False):
    """TomBertForTMSC.forward (+ ResNet wrapper) equivalent
    (vault/models/tombert/model.py:199-332, 394-447).  ``tweet_cfg``
    supports the reference's separate tweet checkpoint
    (``tweet_model_name_or_path``, model.py:154-160: tweet AND target
    towers both come from that model); hidden sizes must match since the
    pooled visual token joins the tweet sequence."""
    rngs = (jax.random.split(rng, 5) if rng is not None else [None] * 5)
    tweet_cfg = tweet_cfg or cfg

    if visual_embeddings is None:
        visual_embeddings = resnet_embed(params["resnet"], resnet_depth,
                                         images, train=train_image_encoder)
    n_regions = visual_embeddings.shape[1]

    tweet_out = bert_mod.bert_apply(
        params["tweet_bert"], tweet_cfg, input_ids, attention_mask,
        token_type_ids, deterministic=deterministic, rng=rngs[0])
    # tied mode (no "target_bert" subtree): the tweet tower serves both
    # streams, so both call sites' gradients land on one set of weights
    target_out = bert_mod.bert_apply(
        params.get("target_bert", params["tweet_bert"]), tweet_cfg,
        target_input_ids, target_attention_mask, target_type_ids,
        deterministic=deterministic, rng=rngs[1])

    # regions are all valid (fixed 7x7 grid) -> image-part bias is zeros
    image_bias = None

    vis = linear(params["vis_mapper"],
                 visual_embeddings.astype(params["vis_mapper"]["w"].dtype))
    attended = cross_encoder_apply(params["cross"], cfg, target_out, vis,
                                   image_bias, deterministic, rngs[2])
    pooled_vis = pooler_dim_apply(params["cross_pooler"], attended, 0)  # (B, H)

    mm = jnp.concatenate([pooled_vis[:, None, :], tweet_out], axis=1)
    if attention_mask is not None:
        mm_mask = jnp.concatenate(
            [jnp.ones((mm.shape[0], 1), attention_mask.dtype), attention_mask],
            axis=1)
        mm_bias = extend_attention_mask(mm_mask, jnp.float32)
    else:
        mm_bias = None

    x = bert_mod.bert_encode(params["mm_encoder"], cfg, mm, None,
                             deterministic, rngs[3], bias=mm_bias)

    if pooling == "both":
        pooled = pooler_dim_apply(params["out_pooler"], x, [0, 1])
        pooled = pooled.reshape(pooled.shape[0], -1)
    elif pooling == "cls":
        pooled = pooler_dim_apply(params["out_pooler"], x, 1)
    else:  # "first"
        pooled = pooler_dim_apply(params["out_pooler"], x, 0)

    pooled = dropout(rngs[4], pooled, cfg.hidden_dropout_prob, deterministic)
    logits = linear(params["classifier"], pooled)
    if return_embeddings:
        return logits, visual_embeddings
    return logits
