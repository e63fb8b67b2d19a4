"""Task-head checkpoint conversion parity vs HF ViltFor* models (random-init
from config; logits compared end-to-end through our backbone+head)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import tiny_vilt_config
from vault_tpu.models.convert import (
    mlm_head_from_torch,
    pair_head_from_torch,
    rank_head_from_torch,
    vilt_params_from_torch,
    vqa_head_from_torch,
)
from vault_tpu.models.vault import (
    mlm_head_apply,
    pair_head_apply,
    rank_head_apply,
    vqa_head_apply,
)
from vault_tpu.models.vilt import vilt_apply

from tests.hf_utils import DeterministicMultinomial, hf_vilt_config


def _inputs(cfg, b=2, l=10, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, (b, l))
    mask = np.ones((b, l), np.int64)
    pixels = rng.normal(size=(b, 3, 64, 64)).astype(np.float32)
    pmask = np.ones((b, 64, 64), np.int64)
    return ids, mask, pixels, pmask


def _ours(hf_model, cfg, prefix="vilt."):
    sd = hf_model.state_dict()
    return vilt_params_from_torch(sd, cfg, prefix=prefix), sd


def test_mlm_checkpoint_parity():
    from transformers import ViltForMaskedLM

    cfg = tiny_vilt_config()
    torch.manual_seed(0)
    hf = ViltForMaskedLM(hf_vilt_config(cfg, tie_word_embeddings=True)).eval()
    params, sd = _ours(hf, cfg)
    head = mlm_head_from_torch(sd)
    ids, mask, pixels, pmask = _inputs(cfg)
    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels),
                 pixel_mask=torch.tensor(pmask)).logits.numpy()
    out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
    logits = mlm_head_apply(head, params, cfg,
                            out.last_hidden_state[:, :ids.shape[1]])
    assert np.abs(np.asarray(logits) - ref).max() < 1e-3


def test_vqa_checkpoint_parity():
    from transformers import ViltForQuestionAnswering

    cfg = tiny_vilt_config()
    torch.manual_seed(0)
    hf = ViltForQuestionAnswering(hf_vilt_config(cfg, num_labels=7)).eval()
    params, sd = _ours(hf, cfg)
    head = vqa_head_from_torch(sd)
    ids, mask, pixels, pmask = _inputs(cfg)
    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels),
                 pixel_mask=torch.tensor(pmask)).logits.numpy()
    out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
    logits = vqa_head_apply(head, cfg, out.pooler_output)
    assert np.abs(np.asarray(logits) - ref).max() < 1e-4


def test_rank_checkpoint_parity():
    from transformers import ViltForImageAndTextRetrieval

    cfg = tiny_vilt_config()
    torch.manual_seed(0)
    hf = ViltForImageAndTextRetrieval(hf_vilt_config(cfg)).eval()
    params, sd = _ours(hf, cfg)
    head = rank_head_from_torch(sd)
    ids, mask, pixels, pmask = _inputs(cfg)
    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels),
                 pixel_mask=torch.tensor(pmask)).logits.numpy()
    out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
    logits = rank_head_apply(head, out.pooler_output)
    assert np.abs(np.asarray(logits) - ref).max() < 1e-4


def test_itm_surgery_from_torch():
    # synthetic itm 2-way head -> rank head = the "match" row (row 1)
    sd = {"itm_score.weight": torch.arange(8, dtype=torch.float32).reshape(2, 4),
          "itm_score.bias": torch.tensor([1.0, 2.0])}
    head = rank_head_from_torch(sd)
    np.testing.assert_allclose(np.asarray(head["out"]["w"]).ravel(),
                               [4.0, 5.0, 6.0, 7.0])
    np.testing.assert_allclose(np.asarray(head["out"]["b"]), [2.0])


def test_pair_checkpoint_parity():
    from transformers import ViltForImagesAndTextClassification

    cfg = tiny_vilt_config(modality_type_vocab_size=3)
    torch.manual_seed(0)
    hf = ViltForImagesAndTextClassification(
        hf_vilt_config(cfg, num_images=2, num_labels=2,
                       modality_type_vocab_size=3)).eval()
    params, sd = _ours(hf, cfg)
    head = pair_head_from_torch(sd)
    ids, mask, _, _ = _inputs(cfg)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 2, 3, 64, 64)).astype(np.float32)
    pmask = np.ones((2, 2, 64, 64), np.int64)
    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 pixel_values=torch.tensor(pixels),
                 pixel_mask=torch.tensor(pmask)).logits.numpy()
    pooled = []
    for i in range(2):
        out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                         attention_mask=jnp.asarray(mask),
                         pixel_values=jnp.asarray(pixels[:, i]),
                         pixel_mask=jnp.asarray(pmask[:, i]),
                         image_token_type_idx=i + 1)
        pooled.append(out.pooler_output)
    logits = pair_head_apply(head, cfg, jnp.concatenate(pooled, axis=-1))
    assert np.abs(np.asarray(logits) - ref).max() < 1e-4


def test_bert_roundtrip_to_torch():
    from transformers import BertModel

    from vault_tpu.models.convert import bert_params_to_torch
    from vault_tpu.models.bert import bert_apply
    from vault_tpu.config import tiny_text_config
    from tests.hf_utils import hf_bert_config, make_hf_bert

    cfg = tiny_text_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    hf = make_hf_bert(cfg)
    from vault_tpu.models.convert import bert_params_from_torch
    params = bert_params_from_torch(hf.state_dict(), cfg)
    # export back out and load into a FRESH torch model
    sd = bert_params_to_torch(params, cfg)
    fresh = BertModel(hf_bert_config(cfg), add_pooling_layer=False).eval()
    missing, unexpected = fresh.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 8))
    with torch.no_grad():
        a = hf(input_ids=torch.tensor(ids)).last_hidden_state
        b = fresh(input_ids=torch.tensor(ids)).last_hidden_state
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)


def test_vilt_roundtrip_to_torch():
    from transformers import ViltModel

    from vault_tpu.models.convert import (
        vilt_params_from_torch,
        vilt_params_to_torch,
    )
    from tests.hf_utils import DeterministicMultinomial, hf_vilt_config, make_hf_vilt

    cfg = tiny_vilt_config()
    hf = make_hf_vilt(cfg)
    params = vilt_params_from_torch(hf.state_dict(), cfg)
    sd = vilt_params_to_torch(params, cfg)
    fresh = ViltModel(hf_vilt_config(cfg)).eval()
    missing, unexpected = fresh.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (1, 8))
    pixels = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad(), DeterministicMultinomial():
        a = hf(input_ids=torch.tensor(ids),
               pixel_values=torch.tensor(pixels)).pooler_output
    with torch.no_grad(), DeterministicMultinomial():
        b = fresh(input_ids=torch.tensor(ids),
                  pixel_values=torch.tensor(pixels)).pooler_output
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)
