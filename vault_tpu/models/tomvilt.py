"""TomViLT ("TomVAuLT") — TomBERT's target-attention front-end fused with
VAuLT as the multimodal encoder.

Reference: vault/models/tomvilt/model.py:14-405.  Flow (stack 3.5 in
SURVEY.md): target-BERT encodes the target; ResNet regions are mapped to
text dim and cross-attended BY the target representation; the attended
sequence (target length) is fed to VaultForTMSC via ViLT's external
``image_embeds`` input with ``pixel_mask = target_attention_mask``.
``use_tweet_bert`` toggles VAuLT (LM tower on) vs plain ViLT inside.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vault_tpu.config import TextTowerConfig, VaultConfig
from vault_tpu.models import bert as bert_mod
from vault_tpu.models import vault as vault_mod
from vault_tpu.models.modules import cross_encoder_apply, init_cross_encoder
from vault_tpu.models.resnet import init_resnet, resnet_embed
from vault_tpu.ops.masks import extend_attention_mask
from vault_tpu.ops.nn import init_linear, linear


def init_tomvilt(rng, vault_cfg: VaultConfig, target_cfg: TextTowerConfig,
                 n_classes: int = 3, vis_emb_dim: int = 2048,
                 num_hidden_cross_layers: Optional[int] = None,
                 resnet_depth: Optional[int] = None):
    ks = jax.random.split(rng, 5)
    params: Dict = {
        "target_bert": bert_mod.init_bert(ks[0], target_cfg),
        "vis_mapper": init_linear(ks[1], vis_emb_dim, target_cfg.hidden_size,
                                  target_cfg.initializer_range),
        "cross": init_cross_encoder(ks[2], target_cfg, num_hidden_cross_layers),
        "vault": {
            **vault_mod.init_vault(ks[3], vault_cfg),
            "head": vault_mod.init_classifier_head(
                jax.random.fold_in(ks[3], 1), vault_cfg.vilt.hidden_size,
                n_classes),
        },
    }
    if resnet_depth is not None:
        params["resnet"] = init_resnet(ks[4], resnet_depth)
    return params


def tomvilt_apply(params, vault_cfg: VaultConfig, target_cfg: TextTowerConfig,
                  input_ids, target_input_ids, visual_embeddings=None,
                  images=None, token_type_ids=None, target_type_ids=None,
                  attention_mask=None, target_attention_mask=None,
                  image_attention_mask=None, resnet_depth: int = 101,
                  train_image_encoder: bool = False, head_dropout: float = 0.1,
                  deterministic=True, rng=None, return_embeddings=False):
    """TomViltForTMSC.forward (+ ResNet wrapper) equivalent
    (vault/models/tomvilt/model.py:187-289, 353-405)."""
    rngs = (jax.random.split(rng, 3) if rng is not None else [None] * 3)

    if visual_embeddings is None:
        visual_embeddings = resnet_embed(params["resnet"], resnet_depth,
                                         images, train=train_image_encoder)

    target_out = bert_mod.bert_apply(
        params["target_bert"], target_cfg, target_input_ids,
        target_attention_mask, target_type_ids, deterministic=deterministic,
        rng=rngs[0])

    image_bias = None
    if image_attention_mask is not None:
        image_bias = extend_attention_mask(image_attention_mask, jnp.float32)

    vis = linear(params["vis_mapper"],
                 visual_embeddings.astype(params["vis_mapper"]["w"].dtype))
    attended = cross_encoder_apply(params["cross"], target_cfg, target_out,
                                   vis, image_bias, deterministic, rngs[1])

    logits = vault_mod.vault_for_classification(
        params["vault"], vault_cfg,
        dict(input_ids=input_ids, attention_mask=attention_mask,
             token_type_ids=token_type_ids, image_embeds=attended,
             pixel_mask=target_attention_mask),
        head_dropout=head_dropout, deterministic=deterministic, rng=rngs[2])

    if return_embeddings:
        return logits, visual_embeddings
    return logits
