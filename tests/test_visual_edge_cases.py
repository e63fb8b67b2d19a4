"""Visual-path edge cases: budget truncation, tiny valid regions, mask
correctness under the static patch budget."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import tiny_vilt_config
from vault_tpu.models.vilt import init_vilt, vilt_apply, visual_embed


def test_budget_truncation_keeps_raster_prefix():
    # budget (4) < valid patches (16): the first 4 raster-order patches stay
    cfg = tiny_vilt_config(image_size=64, patch_size=16, num_patch_tokens=4)
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 64, 64)),
                         jnp.float32)
    pmask = jnp.ones((1, 64, 64), jnp.int32)
    tokens, mask = visual_embed(params, cfg, pixels, pmask)
    assert tokens.shape == (1, 5, cfg.hidden_size)  # CLS + 4
    assert np.asarray(mask).tolist() == [[1, 1, 1, 1, 1]]

    # same image with a bigger budget: the first 4 selected patches match
    cfg_big = dataclasses.replace(cfg, num_patch_tokens=16)
    tokens_big, _ = visual_embed(params, cfg_big, pixels, pmask)
    np.testing.assert_allclose(np.asarray(tokens[:, 1:5]),
                               np.asarray(tokens_big[:, 1:5]), atol=1e-6)


def test_tiny_valid_region():
    # only a 16x16 corner valid -> exactly 1 valid patch + padded slots masked
    cfg = tiny_vilt_config(image_size=64, patch_size=16, num_patch_tokens=6)
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 64, 64)),
                         jnp.float32)
    pmask = np.zeros((1, 64, 64), np.int32)
    pmask[0, :16, :16] = 1
    tokens, mask = visual_embed(params, cfg, pixels, jnp.asarray(pmask))
    m = np.asarray(mask)[0]
    assert m[0] == 1            # CLS
    assert m[1] == 1 and m[2:].sum() == 0  # one valid patch, rest padding


def test_all_masks_zero_is_finite():
    # degenerate all-invalid image must not NaN (softmax over CLS+text only)
    cfg = tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4)
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    out = vilt_apply(
        params, cfg,
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6))),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(1, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.zeros((1, 32, 32), jnp.int32))
    assert np.isfinite(np.asarray(out.pooler_output)).all()


def test_external_image_embeds_without_pixel_mask():
    """image_embeds with pixel_mask=None must synthesize an all-valid mask
    (the text path already does; TomViLT's default target mask is None)."""
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.models.vilt import init_vilt, vilt_apply

    cfg = tiny_vilt_config()
    params = init_vilt(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    embeds = jnp.asarray(rng.normal(size=(2, 5, cfg.hidden_size)),
                         jnp.float32)
    out = vilt_apply(params, cfg, input_ids=ids,
                     attention_mask=jnp.ones((2, 6), jnp.int32),
                     image_embeds=embeds, pixel_mask=None)
    assert np.isfinite(np.asarray(out.pooler_output)).all()
    masked = vilt_apply(params, cfg, input_ids=ids,
                        attention_mask=jnp.ones((2, 6), jnp.int32),
                        image_embeds=embeds,
                        pixel_mask=jnp.ones((2, 5), jnp.int32))
    np.testing.assert_allclose(np.asarray(out.pooler_output),
                               np.asarray(masked.pooler_output), atol=1e-6)
