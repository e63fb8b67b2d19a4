"""Numerical parity: vault_tpu BERT tower vs HF BertModel (fp32 CPU).

Gate: <1e-3 max-abs divergence (BASELINE.md); we typically see <1e-5.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import TextTowerConfig, tiny_text_config
from vault_tpu.models.bert import bert_apply, roberta_position_ids
from vault_tpu.models.convert import bert_params_from_torch

from tests.hf_utils import make_hf_bert


def _run_parity(cfg, batch=2, seq=16, seed=0):
    hf = make_hf_bert(cfg, seed=seed)
    params = bert_params_from_torch(hf.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, size=(batch, seq))
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[0, seq // 2:] = 0
    types = rng.integers(0, cfg.type_vocab_size, size=(batch, seq))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(types),
        ).last_hidden_state.numpy()

    out = bert_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                     jnp.asarray(types))
    return np.abs(np.asarray(out) - ref).max()


def test_tiny_bert_parity():
    assert _run_parity(tiny_text_config(hidden_dropout_prob=0.0,
                                        attention_probs_dropout_prob=0.0)) < 1e-4


def test_tiny_bert_parity_with_dropout_config():
    # dropout probs in config must not affect deterministic eval
    assert _run_parity(tiny_text_config()) < 1e-4


def test_base_geometry_bert_parity():
    cfg = TextTowerConfig(num_hidden_layers=4)  # full width, fewer layers (CI speed)
    assert _run_parity(cfg, batch=2, seq=40) < 1e-3


def test_roberta_position_ids():
    ids = jnp.array([[5, 6, 7, 1, 1], [5, 1, 1, 1, 1]])
    mask = jnp.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])
    pos = roberta_position_ids(ids, mask, pad_token_id=1)
    np.testing.assert_array_equal(np.asarray(pos),
                                  [[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]])


def test_inputs_embeds_path():
    cfg = tiny_text_config(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = make_hf_bert(cfg)
    params = bert_params_from_torch(hf.state_dict(), cfg)
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(2, 8, cfg.hidden_size)).astype(np.float32)
    mask = np.ones((2, 8), dtype=np.int64)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = bert_apply(params, cfg, inputs_embeds=jnp.asarray(embeds),
                     attention_mask=jnp.asarray(mask))
    assert np.abs(np.asarray(out) - ref).max() < 1e-4
