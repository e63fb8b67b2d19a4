"""VAuLT: language tower -> ViLT co-encoder composition + task heads.

Reference mechanism (vault/models/vault/model.py:151-218): ``lm_preprocess``
runs BERT over ``input_ids``, nulls them, and passes ``last_hidden_state`` to
ViLT as ``inputs_embeds``; ``forward`` then defers to the wrapped HF ViLT
class.  Here the mixin-MRO chain becomes explicit function composition over
pytrees — no inheritance, no mutable module state.

Heads (reference locations):
  * TMSC / MVSA / Bloomberg classifier: Dropout + Linear on pooler_output
    (vault/models/vault/model.py:512-570)
  * MLM: HF ViltMLMHead — dense+act+LN transform, decoder tied to ViLT word
    embeddings + free bias (vault/models/vault/model.py:467-468)
  * VQA: Linear(h,2h)+LN+GELU+Linear (vault/models/vault/model.py:472-509)
  * Retrieval: rank_output Linear(h,1) (vault/models/vault/model.py:375-405)
  * Images+Text (NLVR2): per-image ViLT passes with image_token_type_idx=i+1,
    concat poolers, 2-layer classifier (vault/models/vault/model.py:408-464)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig, ViltConfig
from vault_tpu.models import bert as bert_mod
from vault_tpu.models import vilt as vilt_mod
from vault_tpu.models.vilt import ViltOutput
from vault_tpu.ops.nn import (
    act_fn,
    dropout,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------

def init_vault(rng, cfg: VaultConfig):
    k_vilt, k_bert = jax.random.split(rng)
    params = {"vilt": vilt_mod.init_vilt(k_vilt, cfg.resolved_vilt())}
    if cfg.text_tower is not None:
        params["bert"] = bert_mod.init_bert(k_bert, cfg.text_tower)
    return params


def lm_encode(params, cfg: VaultConfig, input_ids, attention_mask,
              token_type_ids=None, inputs_embeds=None, deterministic=True,
              rng=None, use_pallas="auto", remat=False):
    """The reference's ``lm_preprocess`` (vault/models/vault/model.py:151-202):
    run the LM tower; token-type guard for towers with <2 segment types
    (RoBERTa/BERTweet, :174-180); freeze-LM via stop_gradient (:189-190)."""
    tower = cfg.text_tower
    if tower.type_vocab_size < 2 and token_type_ids is not None:
        token_type_ids = jnp.zeros_like(token_type_ids)
    hidden = bert_mod.bert_apply(
        params["bert"], tower, input_ids, attention_mask, token_type_ids,
        inputs_embeds=inputs_embeds, deterministic=deterministic, rng=rng,
        use_pallas=use_pallas, remat=remat)
    if cfg.freeze_lm:
        hidden = jax.lax.stop_gradient(hidden)
    return hidden


def vault_apply(params, cfg: VaultConfig, input_ids=None, attention_mask=None,
                token_type_ids=None, pixel_values=None, pixel_mask=None,
                inputs_embeds=None, image_embeds=None, image_token_type_idx=1,
                deterministic=True, rng=None, use_pallas="auto",
                remat=False, merge_patches_to=None,
                merge_at_layer=0) -> ViltOutput:
    """VaultModel.forward equivalent (vault/models/vault/model.py:207-218,
    369-372): optional LM pass, then ViLT with inputs_embeds.

    ``merge_patches_to`` / ``merge_at_layer``: serving-only ToMe
    patch-token merging — see vilt_apply / ops/token_merge.py."""
    if rng is not None:
        r_lm, r_vilt = jax.random.split(rng)
    else:
        r_lm = r_vilt = None
    vilt_cfg = cfg.resolved_vilt()
    vilt_token_types = token_type_ids
    if cfg.text_tower is not None:
        inputs_embeds = lm_encode(params, cfg, input_ids, attention_mask,
                                  token_type_ids, inputs_embeds, deterministic,
                                  r_lm, use_pallas, remat)
        input_ids = None
        # ViLT's own text token-type add still runs on the provided ids (HF
        # TextEmbeddings applies token_type regardless of inputs_embeds).
    return vilt_mod.vilt_apply(
        params["vilt"], vilt_cfg, input_ids, attention_mask, vilt_token_types,
        pixel_values, pixel_mask, inputs_embeds, image_embeds,
        image_token_type_idx, deterministic, r_vilt, use_pallas, remat,
        merge_patches_to, merge_at_layer)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def init_classifier_head(rng, hidden_size: int, n_classes: int,
                         stddev: float = 0.02):
    """VaultForTMSC head: Dropout + Linear (vault/models/vault/model.py:540-545)."""
    return {"out": init_linear(rng, hidden_size, n_classes, stddev)}


def classifier_head_apply(head, pooled, dropout_prob=0.1, deterministic=True,
                          rng=None):
    x = dropout(rng, pooled, dropout_prob, deterministic)
    return linear(head["out"], x)


def init_mlm_head(rng, cfg: ViltConfig):
    k1, _ = jax.random.split(rng)
    return {
        "transform": init_linear(k1, cfg.hidden_size, cfg.hidden_size,
                                 cfg.initializer_range),
        "transform_ln": init_layer_norm(cfg.hidden_size),
        "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def mlm_head_apply(head, vilt_params, cfg: ViltConfig, hidden):
    """ViltMLMHead with decoder tied to ViLT's word embeddings
    (modeling_vilt.py:889-908)."""
    x = linear(head["transform"], hidden)
    x = act_fn(cfg.hidden_act)(x)
    x = layer_norm(head["transform_ln"], x, cfg.layer_norm_eps)
    logits = jnp.matmul(x, vilt_params["text_embeddings"]["word"].T,
                        preferred_element_type=jnp.float32)
    return logits + head["bias"]


def init_vqa_head(rng, cfg: ViltConfig, n_classes: int):
    k1, k2 = jax.random.split(rng)
    h = cfg.hidden_size
    return {
        "in": init_linear(k1, h, h * 2, cfg.initializer_range),
        "ln": init_layer_norm(h * 2),
        "out": init_linear(k2, h * 2, n_classes, cfg.initializer_range),
    }


def vqa_head_apply(head, cfg: ViltConfig, pooled):
    x = linear(head["in"], pooled)
    # HF builds this head with bare nn.LayerNorm -> torch default eps 1e-5,
    # not config.layer_norm_eps (modeling_vilt.py:925-929)
    x = layer_norm(head["ln"], x, 1e-5)
    x = act_fn("gelu")(x)
    return linear(head["out"], x)


def renew_vqa_classifier(rng, head, n_classes: int, stddev: float = 0.02):
    """VaultForQuestionAnswering n_classes override: re-init the final linear
    with normal(0, 0.02) weights and zero bias (vault/models/vault/model.py:472-509)."""
    in_dim = head["in"]["w"].shape[1]
    return {**head, "out": init_linear(rng, in_dim, n_classes, stddev)}


def init_rank_head(rng, cfg: ViltConfig):
    return {"out": init_linear(rng, cfg.hidden_size, 1, cfg.initializer_range)}


def rank_head_apply(head, pooled):
    return linear(head["out"], pooled)


def rank_head_from_itm(itm_head):
    """Reference checkpoint surgery (vault/models/vault/model.py:375-405): an
    `itm` checkpoint carries a 2-way itm_score head; the retrieval rank head is
    its row 1 (the "match" logit)."""
    return {"out": {"w": itm_head["w"][:, 1:2], "b": itm_head["b"][1:2]}}


def init_pair_head(rng, cfg: ViltConfig, n_classes: int = 2,
                   num_images: int = 2):
    k1, k2 = jax.random.split(rng)
    h = cfg.hidden_size * num_images
    return {
        "in": init_linear(k1, h, h, cfg.initializer_range),
        "ln": init_layer_norm(h),
        "out": init_linear(k2, h, n_classes, cfg.initializer_range),
    }


def pair_head_apply(head, cfg: ViltConfig, pooled_concat):
    x = linear(head["in"], pooled_concat)
    # bare nn.LayerNorm in HF -> torch default eps 1e-5 (modeling_vilt.py:1136-1141)
    x = layer_norm(head["ln"], x, 1e-5)
    x = act_fn("gelu")(x)
    return linear(head["out"], x)


def resize_token_embeddings(params, cfg: VaultConfig, new_size: int,
                            rng=None, stddev: float = 0.02):
    """Grow the word-embedding table to ``new_size`` rows (new rows
    normal(0, 0.02)).  Like the reference's resize_token_embeddings
    (vault/models/vault/model.py:130-135), the LM tower's table is resized
    when present, otherwise ViLT's."""
    import dataclasses

    from vault_tpu.models.bert import grow_word_embeddings

    if rng is None:
        rng = jax.random.PRNGKey(0)
    target = "bert" if cfg.text_tower is not None else "vilt"
    emb_key = "embeddings" if target == "bert" else "text_embeddings"
    table = params[target][emb_key]["word"]
    if new_size <= table.shape[0]:
        return params, cfg
    if target == "bert":
        params = {**params,
                  "bert": grow_word_embeddings(params["bert"], new_size,
                                               rng, stddev)}
        cfg = dataclasses.replace(
            cfg, text_tower=dataclasses.replace(cfg.text_tower,
                                                vocab_size=new_size))
    else:
        extra = jax.random.normal(rng, (new_size - table.shape[0],
                                        table.shape[1]),
                                  table.dtype) * stddev
        params = {**params, "vilt": {
            **params["vilt"],
            emb_key: {**params["vilt"][emb_key],
                      "word": jnp.concatenate([table, extra], axis=0)}}}
        cfg = dataclasses.replace(
            cfg, vilt=dataclasses.replace(cfg.vilt, vocab_size=new_size))
    return params, cfg


def resize_modality_type_embeddings(vilt_params, num_images: int):
    """Grow ViLT's modality-type table from 2 to num_images+1 rows, copying
    the single pretrained image row into every image slot — the reference's
    resize_token_type_embeddings (vault/models/vault/model.py:437-456)."""
    table = vilt_params["modality_type"]
    if table.shape[0] >= num_images + 1:
        return vilt_params
    image_row = table[1:2]
    new = jnp.concatenate([table[0:1]] + [image_row] * num_images, axis=0)
    return {**vilt_params, "modality_type": new}


# ---------------------------------------------------------------------------
# Task-level apply functions
# ---------------------------------------------------------------------------

def vault_with_llama_tower(params, vilt_cfg: ViltConfig, llama_cfg,
                           input_ids, attention_mask=None, token_type_ids=None,
                           pixel_values=None, pixel_mask=None,
                           image_embeds=None, deterministic=True, rng=None,
                           use_pallas="auto") -> ViltOutput:
    """Stretch composition (BASELINE.json config 5): a Llama tower's hidden
    states, width-projected to ViLT's hidden size, replace the BERT
    contextual embeddings feeding the co-encoder."""
    import dataclasses

    from vault_tpu.models.llama import llama_apply

    hidden = llama_apply(params["llama"], llama_cfg, input_ids, attention_mask)
    if "lm_proj" in params:
        hidden = linear(params["lm_proj"], hidden)
    vcfg = dataclasses.replace(vilt_cfg, add_text_position_embeddings=False)
    return vilt_mod.vilt_apply(
        params["vilt"], vcfg, attention_mask=attention_mask,
        token_type_ids=token_type_ids, pixel_values=pixel_values,
        pixel_mask=pixel_mask, inputs_embeds=hidden, image_embeds=image_embeds,
        deterministic=deterministic, rng=rng, use_pallas=use_pallas)


def vault_for_classification(params, cfg: VaultConfig, batch: Dict[str, Any],
                             head_dropout: float = 0.1, deterministic=True,
                             rng=None, use_pallas="auto", remat=False,
                             merge_patches_to=None, merge_at_layer=0):
    """VaultForTMSC.forward (vault/models/vault/model.py:547-570): backbone
    pooler -> dropout -> linear logits.  Used for TMSC (3-way), MVSA (3/6-way)
    and Bloomberg (1-logit BCE)."""
    if rng is not None:
        r_model, r_head = jax.random.split(rng)
    else:
        r_model = r_head = None
    out = vault_apply(params, cfg, deterministic=deterministic, rng=r_model,
                      use_pallas=use_pallas, remat=remat,
                      merge_patches_to=merge_patches_to,
                      merge_at_layer=merge_at_layer, **batch)
    logits = classifier_head_apply(params["head"], out.pooler_output,
                                   head_dropout, deterministic, r_head)
    return logits


def vault_for_mlm(params, cfg: VaultConfig, batch, deterministic=True,
                  rng=None, use_pallas="auto", remat=False,
                  merge_patches_to=None):
    """VaultForMaskedLM (vault/models/vault/model.py:467-468): MLM logits over
    the text span of the joint sequence (text tokens precede the patches,
    so patch merging leaves the text span's indices intact)."""
    out = vault_apply(params, cfg, deterministic=deterministic, rng=rng,
                      use_pallas=use_pallas, remat=remat,
                      merge_patches_to=merge_patches_to, **batch)
    seq_len = batch["input_ids"].shape[1]
    text_hidden = out.last_hidden_state[:, :seq_len]
    logits = mlm_head_apply(params["mlm"], params["vilt"], cfg.resolved_vilt(),
                            text_hidden)
    return logits


def vault_for_vqa(params, cfg: VaultConfig, batch, deterministic=True,
                  rng=None, use_pallas="auto", remat=False,
                  merge_patches_to=None):
    out = vault_apply(params, cfg, deterministic=deterministic, rng=rng,
                      use_pallas=use_pallas, remat=remat,
                      merge_patches_to=merge_patches_to, **batch)
    return vqa_head_apply(params["vqa"], cfg.resolved_vilt(), out.pooler_output)


def vault_for_retrieval(params, cfg: VaultConfig, batch, deterministic=True,
                        rng=None, use_pallas="auto", remat=False,
                        merge_patches_to=None):
    out = vault_apply(params, cfg, deterministic=deterministic, rng=rng,
                      use_pallas=use_pallas, remat=remat,
                      merge_patches_to=merge_patches_to, **batch)
    return rank_head_apply(params["rank"], out.pooler_output)


def vault_for_images_and_text(params, cfg: VaultConfig, batch,
                              deterministic=True, rng=None, use_pallas="auto",
                              remat=False, merge_patches_to=None):
    """VaultForImagesAndTextClassification: pixel_values (B, num_images, C, H, W);
    one backbone pass per image with its own modality slot, concat poolers."""
    pixel_values = batch["pixel_values"]
    pixel_mask = batch.get("pixel_mask")
    num_images = pixel_values.shape[1]
    pooled = []
    for i in range(num_images):
        sub = dict(batch)
        sub["pixel_values"] = pixel_values[:, i]
        sub["pixel_mask"] = None if pixel_mask is None else pixel_mask[:, i]
        sub["image_token_type_idx"] = i + 1
        r = None if rng is None else jax.random.fold_in(rng, i)
        out = vault_apply(params, cfg, deterministic=deterministic, rng=r,
                          use_pallas=use_pallas, remat=remat,
                          merge_patches_to=merge_patches_to, **sub)
        pooled.append(out.pooler_output)
    pooled_concat = jnp.concatenate(pooled, axis=-1)
    return pair_head_apply(params["pair"], cfg.resolved_vilt(), pooled_concat)
