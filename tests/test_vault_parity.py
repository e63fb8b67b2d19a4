"""Parity for the full VAuLT composition: BERT tower -> ViLT(inputs_embeds).

The torch reference behavior is reconstructed here from HF primitives exactly
as the reference wires them (vault/models/vault/model.py:151-218): run the LM,
hand its last_hidden_state to ViltModel as inputs_embeds, disable ViLT's text
position embeddings.  This validates our composition end-to-end.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.convert import bert_params_from_torch, vilt_params_from_torch
from vault_tpu.models.vault import (
    classifier_head_apply,
    init_classifier_head,
    init_mlm_head,
    init_vault,
    lm_encode,
    rank_head_from_itm,
    resize_modality_type_embeddings,
    vault_apply,
    vault_for_classification,
    vault_for_images_and_text,
    vault_for_mlm,
)

from tests.hf_utils import DeterministicMultinomial, make_hf_bert, make_hf_vilt


def _tiny_vault_cfg(**kw):
    text = tiny_text_config(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return VaultConfig(vilt=tiny_vilt_config(), text_tower=text, **kw)


def _build(seed=0):
    cfg = _tiny_vault_cfg()
    hf_bert = make_hf_bert(cfg.text_tower, seed=seed)
    hf_vilt = make_hf_vilt(cfg.vilt, seed=seed + 1)
    # reference switch: ViLT text position embeddings off when LM present
    hf_vilt.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"
    params = {
        "bert": bert_params_from_torch(hf_bert.state_dict(), cfg.text_tower),
        "vilt": vilt_params_from_torch(hf_vilt.state_dict(), cfg.resolved_vilt()),
    }
    return cfg, hf_bert, hf_vilt, params


def _inputs(cfg, batch=2, seq=12, img=(64, 96), seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, min(cfg.text_tower.vocab_size, cfg.vilt.vocab_size),
                       size=(batch, seq))
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[0, -3:] = 0
    types = np.zeros((batch, seq), dtype=np.int64)
    pixels = rng.normal(size=(batch, 3, *img)).astype(np.float32)
    pmask = np.ones((batch, *img), dtype=np.int64)
    return ids, mask, types, pixels, pmask


def test_vault_composition_parity():
    cfg, hf_bert, hf_vilt, params = _build()
    ids, mask, types, pixels, pmask = _inputs(cfg)

    with torch.no_grad(), DeterministicMultinomial():
        lm_out = hf_bert(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask),
                         token_type_ids=torch.tensor(types)).last_hidden_state
        ref = hf_vilt(inputs_embeds=lm_out,
                      attention_mask=torch.tensor(mask),
                      token_type_ids=torch.tensor(types),
                      pixel_values=torch.tensor(pixels),
                      pixel_mask=torch.tensor(pmask))

    out = vault_apply(params, cfg,
                      input_ids=jnp.asarray(ids),
                      attention_mask=jnp.asarray(mask),
                      token_type_ids=jnp.asarray(types),
                      pixel_values=jnp.asarray(pixels),
                      pixel_mask=jnp.asarray(pmask))
    d_pool = np.abs(np.asarray(out.pooler_output) - ref.pooler_output.numpy()).max()
    assert d_pool < 1e-4, d_pool
    L = min(out.last_hidden_state.shape[1], ref.last_hidden_state.shape[1])
    valid = np.asarray(out.attention_mask)[:, :L].astype(bool)
    d_last = np.abs(np.asarray(out.last_hidden_state)[:, :L]
                    - ref.last_hidden_state.numpy()[:, :L])[valid].max()
    assert d_last < 1e-4, d_last


def test_token_type_guard_for_single_segment_towers():
    # Towers with type_vocab_size < 2 must see zeroed token_type_ids
    # (vault/models/vault/model.py:174-180).
    text = tiny_text_config(type_vocab_size=1, hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0,
                            position_embedding_style="roberta", pad_token_id=1)
    cfg = VaultConfig(vilt=tiny_vilt_config(), text_tower=text)
    hf_bert = make_hf_bert(text)
    params = {"bert": bert_params_from_torch(hf_bert.state_dict(), text)}
    ids = np.array([[5, 6, 7, 8]]);  mask = np.ones((1, 4), dtype=np.int64)
    bad_types = np.ones((1, 4), dtype=np.int64)  # would be out of range
    out = lm_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                    jnp.asarray(bad_types))
    assert np.isfinite(np.asarray(out)).all()


def test_freeze_lm_stops_gradients():
    cfg = dataclasses.replace(_tiny_vault_cfg(), freeze_lm=True)
    params = init_vault(jax.random.PRNGKey(0), cfg)
    head = init_classifier_head(jax.random.PRNGKey(1), cfg.vilt.hidden_size, 3)
    params = {**params, "head": head}
    ids, mask, types, pixels, pmask = _inputs(cfg, batch=1)

    def loss_fn(p):
        logits = vault_for_classification(
            p, cfg, dict(input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                         token_type_ids=jnp.asarray(types),
                         pixel_values=jnp.asarray(pixels), pixel_mask=jnp.asarray(pmask)),
            head_dropout=0.0)
        return jnp.sum(logits ** 2)

    grads = jax.grad(loss_fn)(params)
    bert_norm = sum(jnp.abs(g).sum() for g in jax.tree.leaves(grads["bert"]))
    vilt_norm = sum(jnp.abs(g).sum() for g in jax.tree.leaves(grads["vilt"]))
    assert float(bert_norm) == 0.0
    assert float(vilt_norm) > 0.0


def test_mlm_head_shapes_and_tying():
    cfg = _tiny_vault_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["mlm"] = init_mlm_head(jax.random.PRNGKey(1), cfg.vilt)
    ids, mask, types, pixels, pmask = _inputs(cfg, batch=2, seq=10)
    logits = vault_for_mlm(params, cfg, dict(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types), pixel_values=jnp.asarray(pixels),
        pixel_mask=jnp.asarray(pmask)))
    assert logits.shape == (2, 10, cfg.vilt.vocab_size)


def test_rank_head_from_itm_surgery():
    itm = {"w": jnp.arange(8, dtype=jnp.float32).reshape(4, 2), "b": jnp.array([1.0, 2.0])}
    rank = rank_head_from_itm(itm)
    np.testing.assert_allclose(np.asarray(rank["out"]["w"]).ravel(), [1, 3, 5, 7])
    np.testing.assert_allclose(np.asarray(rank["out"]["b"]), [2.0])


def test_modality_type_resize():
    vp = {"modality_type": jnp.stack([jnp.zeros(4), jnp.ones(4)])}
    out = resize_modality_type_embeddings(vp, num_images=3)
    assert out["modality_type"].shape == (4, 4)
    np.testing.assert_allclose(np.asarray(out["modality_type"][2]), np.ones(4))
    np.testing.assert_allclose(np.asarray(out["modality_type"][3]), np.ones(4))


def test_images_and_text_multi_image():
    from vault_tpu.models.vault import init_pair_head
    cfg = _tiny_vault_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["vilt"] = resize_modality_type_embeddings(params["vilt"], 2)
    params["pair"] = init_pair_head(jax.random.PRNGKey(1), cfg.vilt, 2, 2)
    rng = np.random.default_rng(0)
    ids, mask, types, _, _ = _inputs(cfg, batch=2, seq=8)
    pixels = rng.normal(size=(2, 2, 3, 64, 64)).astype(np.float32)
    pmask = np.ones((2, 2, 64, 64), dtype=np.int64)
    logits = vault_for_images_and_text(params, cfg, dict(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types), pixel_values=jnp.asarray(pixels),
        pixel_mask=jnp.asarray(pmask)))
    assert logits.shape == (2, 2)


def test_bf16_divergence_budget():
    """Quantify the bf16-compute divergence vs fp32 (SURVEY.md §7 hard part 4:
    keep an fp32 reference path and know the gap)."""
    cfg = _tiny_vault_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    ids, mask, types, pixels, pmask = _inputs(cfg, batch=2)
    batch = dict(input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                 token_type_ids=jnp.asarray(types),
                 pixel_values=jnp.asarray(pixels),
                 pixel_mask=jnp.asarray(pmask))
    ref = vault_apply(params, cfg, **batch).pooler_output
    p16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    b16 = dict(batch, pixel_values=batch["pixel_values"].astype(jnp.bfloat16))
    out = vault_apply(p16, cfg, **b16).pooler_output
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    assert diff < 0.05, diff  # tanh-bounded pooler; typical ~1e-2
