"""ToMe-style patch-token merging (ops/token_merge.py).

Key properties asserted end-to-end through the real ViLT forward:
  * EXACTNESS on duplicates: merging two identical patch tokens under
    proportional attention (log-size key bias) reproduces the unmerged
    pooler output — the core ToMe identity (arXiv 2210.09461 §3).
  * invalid (padded) patch tokens are consumed first with zero weight, so
    merging them away is exactly a no-op on the visible computation.
  * static shapes: 215 -> 87 resolves to a fixed two-step cascade.

No reference counterpart (gchochla/VAuLT always serves the full joint
sequence); this is the serving accelerator built from PAPERS.md's ViT
token-reduction line.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import tiny_vilt_config
from vault_tpu.models.vilt import init_vilt, vilt_apply
from vault_tpu.ops.token_merge import bipartite_merge_step, merge_tokens_to


def _flat_pos_embeddings(params):
    """Make every position embedding row identical so that pixel-identical
    patches produce IDENTICAL tokens (the duplicate-exactness precondition);
    interpolation of a constant grid is the same constant."""
    pe = params["pos_embeddings"]
    row = pe[1:2]
    return dict(params, pos_embeddings=jnp.concatenate(
        [row] * pe.shape[0], axis=0))


def _setup(seed=0):
    cfg = tiny_vilt_config(image_size=64, patch_size=16)  # 4x4 = 16 patches
    params = init_vilt(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    b, l = 2, 6
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (b, l)), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(b, 3, 64, 64)), jnp.float32),
        pixel_mask=jnp.ones((b, 64, 64), jnp.int32),
    )
    return cfg, params, batch


def test_merge_tokens_to_shapes_and_sizes():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 215, 8)), jnp.float32)
    mask = jnp.ones((2, 215), jnp.int32)
    y, sizes, m = merge_tokens_to(x, mask, 87)
    assert y.shape == (2, 87, 8)
    assert sizes.shape == (2, 87) and m.shape == (2, 87)
    # every original token is represented exactly once somewhere
    np.testing.assert_allclose(np.asarray(sizes).sum(axis=1), 215.0, rtol=1e-6)
    assert np.asarray(m).all()
    assert float(sizes.min()) >= 1.0


def test_merge_noop_when_target_not_smaller():
    cfg, params, batch = _setup()
    base = vilt_apply(params, cfg, **batch)
    same = vilt_apply(params, cfg, merge_patches_to=16, **batch)
    np.testing.assert_array_equal(np.asarray(base.pooler_output),
                                  np.asarray(same.pooler_output))


def test_duplicate_patches_merge_exactly():
    """Two pixel-identical patches (with flattened position embeddings) must
    merge into one size-2 token whose proportional attention reproduces the
    unmerged forward bit-for-bit up to fp32 noise."""
    cfg, params, batch = _setup()
    params = _flat_pos_embeddings(params)
    # raster patches 2 (row 0, col 2 -> A set) and 3 (row 0, col 3 -> B set):
    # copy the 16x16 pixel block so their tokens are identical
    pv = np.asarray(batch["pixel_values"]).copy()
    pv[:, :, 0:16, 48:64] = pv[:, :, 0:16, 32:48]
    batch = dict(batch, pixel_values=jnp.asarray(pv))

    base = vilt_apply(params, cfg, **batch)
    merged = vilt_apply(params, cfg, merge_patches_to=15, **batch)
    assert merged.last_hidden_state.shape[1] == base.last_hidden_state.shape[1] - 1
    np.testing.assert_allclose(np.asarray(merged.pooler_output),
                               np.asarray(base.pooler_output),
                               atol=2e-5, rtol=1e-5)


def test_invalid_patches_consumed_first_exactly():
    """With 4 invalid patch slots (2 in the A set), merging 2 tokens must
    remove invalid ones with zero weight — the visible computation is
    untouched, so outputs equal the unmerged forward exactly."""
    cfg, params, batch = _setup()
    pm = np.ones((2, 64, 64), np.int32)
    pm[:, 48:, :] = 0                    # bottom patch row invalid (4 slots)
    batch = dict(batch, pixel_mask=jnp.asarray(pm))

    base = vilt_apply(params, cfg, **batch)
    merged = vilt_apply(params, cfg, merge_patches_to=14, **batch)
    np.testing.assert_allclose(np.asarray(merged.pooler_output),
                               np.asarray(base.pooler_output),
                               atol=1e-6, rtol=1e-6)
    # the merged-away tokens were masked ones: the VALID count is unchanged,
    # only the sequence (and with it the invalid slot count) shrank by 2
    assert int(merged.attention_mask.sum()) == int(base.attention_mask.sum())
    assert (merged.attention_mask.shape[1]
            == base.attention_mask.shape[1] - 2)


def test_step_never_merges_valid_into_invalid():
    """Normal merges (a valid B target exists) must never deposit weight
    into an invalid B slot: with one valid B available, every merged valid
    A lands there and the remaining invalid slots stay untouched."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 4)), jnp.float32)
    sizes = jnp.ones((1, 8), jnp.float32)
    # A (even) all valid; B (odd): only position 1 valid
    mask = jnp.asarray([[1, 1, 1, 0, 1, 0, 1, 0]], jnp.int32)
    y, s, m = bipartite_merge_step(x, sizes, mask, r=2)
    # the 3 invalid B slots received nothing: content/size/mask untouched
    np.testing.assert_array_equal(np.asarray(m)[0, -3:], 0)
    np.testing.assert_allclose(np.asarray(y)[0, -3:],
                               np.asarray(x)[0, 3::2], atol=0)
    np.testing.assert_allclose(np.asarray(s)[0, -3:], 1.0)
    # both merges landed in the single valid B slot
    assert float(np.asarray(s)[0, -4]) == 3.0
    # total valid size is conserved
    assert float((np.asarray(s) * np.asarray(m)).sum()) == 5.0


def test_no_valid_target_transfers_instead_of_discarding():
    """A VALID A row whose every B candidate is invalid must be preserved,
    not dropped with zero weight (ADVICE r3): it transfers content, size
    and validity into an invalid B slot."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 4)), jnp.float32)
    sizes = jnp.ones((1, 8), jnp.float32)
    mask = jnp.asarray([[1, 0, 1, 0, 1, 0, 1, 0]], jnp.int32)  # all B invalid
    y, s, m = bipartite_merge_step(x, sizes, mask, r=2)
    y, s, m = np.asarray(y), np.asarray(s), np.asarray(m)
    # total valid size conserved: 4 before, 4 after (2 kept A + 2 flipped B)
    assert float((s * m).sum()) == 4.0
    assert int(m.sum()) == 4
    # every valid input token's content survives somewhere in the output
    # (transfers are 1-token averages = exact copies here)
    out_rows = {tuple(np.round(y[0, i], 6)) for i in range(6) if m[0, i]}
    for i in [0, 2, 4, 6]:
        assert tuple(np.round(np.asarray(x)[0, i], 6)) in out_rows


def test_merge_composes_with_vault_classifier():
    from vault_tpu.config import VaultConfig, tiny_text_config
    from vault_tpu.models.vault import (
        init_classifier_head,
        init_vault,
        vault_for_classification,
    )

    cfg = VaultConfig(vilt=tiny_vilt_config(image_size=64, patch_size=16),
                      text_tower=tiny_text_config(num_hidden_layers=1))
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                           (2, 6)), jnp.int32),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        token_type_ids=jnp.zeros((2, 6), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(2, 3, 64, 64)), jnp.float32),
        pixel_mask=jnp.ones((2, 64, 64), jnp.int32),
    )
    fwd = jax.jit(lambda p, b: vault_for_classification(
        p, cfg, b, head_dropout=0.0, deterministic=True, merge_patches_to=8))
    logits = np.asarray(fwd(params, batch))
    assert logits.shape == (2, 3) and np.isfinite(logits).all()


def test_duplicate_patches_merge_exactly_midstack():
    """Mid-stack merging (merge_at_layer > 0): identical tokens remain
    identical after any number of encoder layers, so merging them there is
    still exact — and the returned attention_mask tracks the merged length."""
    cfg, params, batch = _setup()
    params = _flat_pos_embeddings(params)
    pv = np.asarray(batch["pixel_values"]).copy()
    pv[:, :, 0:16, 48:64] = pv[:, :, 0:16, 32:48]
    batch = dict(batch, pixel_values=jnp.asarray(pv))

    base = vilt_apply(params, cfg, **batch)
    merged = vilt_apply(params, cfg, merge_patches_to=15, merge_at_layer=1,
                        **batch)
    assert merged.last_hidden_state.shape[1] == base.last_hidden_state.shape[1] - 1
    assert merged.attention_mask.shape[1] == base.attention_mask.shape[1] - 1
    np.testing.assert_allclose(np.asarray(merged.pooler_output),
                               np.asarray(base.pooler_output),
                               atol=2e-5, rtol=1e-5)


def test_midstack_diverges_less_than_embed_merge():
    """On non-duplicate inputs, merging contextualized tokens (layer 1 of 2)
    must track the unmerged forward at least as well as embed-time merging
    tracks it (the reason merge_at_layer exists)."""
    cfg, params, batch = _setup()
    base = np.asarray(vilt_apply(params, cfg, **batch).pooler_output)
    at_embed = np.asarray(vilt_apply(
        params, cfg, merge_patches_to=8, **batch).pooler_output)
    at_mid = np.asarray(vilt_apply(
        params, cfg, merge_patches_to=8, merge_at_layer=1,
        **batch).pooler_output)
    d_embed = np.abs(at_embed - base).max()
    d_mid = np.abs(at_mid - base).max()
    assert d_mid <= d_embed * 1.05, (d_mid, d_embed)
