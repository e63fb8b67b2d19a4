"""Numerical parity: vault_tpu ViLT co-encoder vs HF ViltModel (fp32 CPU).

HF's visual path selects patches via ``torch.multinomial`` (data-dependent,
non-deterministic; modeling_vilt.py:154-160).  Tests patch it to raster order
(tests/hf_utils.DeterministicMultinomial) so both sides select identically;
our implementation is deterministic by design (SURVEY.md §7 hard part 1).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import ViltConfig, tiny_vilt_config
from vault_tpu.models.convert import vilt_params_from_torch
from vault_tpu.models.vilt import vilt_apply

from tests.hf_utils import DeterministicMultinomial, make_hf_vilt


def _make_inputs(cfg, batch, seq, img_hw, valid_hw=None, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, size=(batch, seq))
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[0, seq - 2:] = 0
    types = np.zeros((batch, seq), dtype=np.int64)
    h, w = img_hw
    pixels = rng.normal(size=(batch, cfg.num_channels, h, w)).astype(np.float32)
    pmask = np.ones((batch, h, w), dtype=np.int64)
    if valid_hw is not None:
        for i, (vh, vw) in enumerate(valid_hw):
            pmask[i, vh:, :] = 0
            pmask[i, :, vw:] = 0
    return ids, mask, types, pixels, pmask


def _parity(cfg, batch=2, seq=12, img_hw=None, valid_hw=None, seed=0,
            num_patch_tokens=None):
    if img_hw is None:
        img_hw = (cfg.image_size, cfg.image_size)
    hf = make_hf_vilt(cfg, seed=seed)
    if num_patch_tokens is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, num_patch_tokens=num_patch_tokens)
    params = vilt_params_from_torch(hf.state_dict(), cfg)
    ids, mask, types, pixels, pmask = _make_inputs(cfg, batch, seq, img_hw, valid_hw, seed)

    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(types),
            pixel_values=torch.tensor(pixels),
            pixel_mask=torch.tensor(pmask),
        )
    ref_last = ref.last_hidden_state.numpy()
    ref_pool = ref.pooler_output.numpy()

    out = vilt_apply(params, cfg,
                     input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     token_type_ids=jnp.asarray(types),
                     pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
    last = np.asarray(out.last_hidden_state)
    pool = np.asarray(out.pooler_output)
    joint_mask = np.asarray(out.attention_mask)

    # HF's output length = seq + 1 + (max effective patches); ours =
    # seq + 1 + num_patch_tokens.  Compare the common prefix at positions
    # that are valid on both sides (masked slots may differ freely).
    L = min(last.shape[1], ref_last.shape[1])
    valid = joint_mask[:, :L].astype(bool)
    diff_last = np.abs(last[:, :L] - ref_last[:, :L])[valid].max()
    diff_pool = np.abs(pool - ref_pool).max()
    return diff_last, diff_pool


def test_tiny_full_image():
    cfg = tiny_vilt_config()
    d_last, d_pool = _parity(cfg, img_hw=(64, 64))
    assert d_last < 1e-4, d_last
    assert d_pool < 1e-4, d_pool


def test_tiny_rect_image_interpolated_pos():
    # Non-square grid exercises align-corners interpolation to (4, 6).
    cfg = tiny_vilt_config()
    d_last, d_pool = _parity(cfg, img_hw=(64, 96))
    assert d_last < 1e-4, d_last
    assert d_pool < 1e-4, d_pool


def test_tiny_padded_batch_mixed_masks():
    # Batch rows with different valid regions (safe_dict_concat-style padding:
    # vault/vl_utils/dataset_utils.py:7-36): row 0 full, row 1 valid 32x48.
    cfg = tiny_vilt_config()
    d_last, d_pool = _parity(cfg, img_hw=(64, 96),
                             valid_hw=[(64, 96), (32, 48)])
    assert d_last < 1e-4, d_last
    assert d_pool < 1e-4, d_pool


def test_no_text_position_embeddings():
    # The VAuLT switch: disable ViLT text position adds (reference
    # "NOT_absolute" hack, vault/models/vault/model.py:77-79).
    import dataclasses
    cfg = tiny_vilt_config(add_text_position_embeddings=False)
    hf = make_hf_vilt(cfg)
    hf.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"
    params = vilt_params_from_torch(hf.state_dict(), cfg)
    ids, mask, types, pixels, pmask = _make_inputs(cfg, 2, 12, (64, 64))
    with torch.no_grad(), DeterministicMultinomial():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(types),
                 pixel_values=torch.tensor(pixels), pixel_mask=torch.tensor(pmask))
    out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     token_type_ids=jnp.asarray(types),
                     pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
    assert np.abs(np.asarray(out.pooler_output) - ref.pooler_output.numpy()).max() < 1e-4


def test_external_image_embeds():
    # TomViLT path: ViLT consumes precomputed image_embeds + token-level mask
    # (vault/models/tomvilt/model.py:281-287).
    cfg = tiny_vilt_config()
    hf = make_hf_vilt(cfg)
    params = vilt_params_from_torch(hf.state_dict(), cfg)
    rng = np.random.default_rng(3)
    b, l, n = 2, 10, 7
    ids = rng.integers(0, cfg.vocab_size, size=(b, l))
    mask = np.ones((b, l), dtype=np.int64)
    emb = rng.normal(size=(b, n, cfg.hidden_size)).astype(np.float32)
    emb_mask = np.ones((b, n), dtype=np.int64)
    emb_mask[1, 4:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 image_embeds=torch.tensor(emb), pixel_mask=torch.tensor(emb_mask))
    out = vilt_apply(params, cfg, input_ids=jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask),
                     image_embeds=jnp.asarray(emb), pixel_mask=jnp.asarray(emb_mask))
    assert np.abs(np.asarray(out.last_hidden_state) - ref.last_hidden_state.numpy()).max() < 1e-4


def test_base_geometry():
    # Full 768-wide geometry, 2 layers, ViltProcessor-like 384x576 canvas.
    cfg = ViltConfig(num_hidden_layers=2, num_patch_tokens=216)
    d_last, d_pool = _parity(cfg, batch=1, seq=11, img_hw=(384, 576))
    assert d_last < 1e-3, d_last
    assert d_pool < 1e-3, d_pool
