"""VaultPipeline serving API: fixed-shape batching + latency counters."""

import numpy as np
import jax
import pytest

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.models.vault import init_vault
from vault_tpu.pipeline_api import VaultPipeline
from vault_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = {t: i for i, t in enumerate(
    "[PAD] [UNK] [CLS] [SEP] [MASK] a cat dog couch".split())}


def test_pipeline_call_and_stats():
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    proc = VaultProcessor(WordPieceTokenizer(VOCAB), max_length=8,
                          canvas=(32, 32))
    pipe = VaultPipeline(params, cfg, proc, max_batch=4)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
            for _ in range(2)]
    last, pooled = pipe(imgs, ["a cat", "a dog on a couch"])
    assert pooled.shape == (2, cfg.vilt.hidden_size)
    assert last.shape[0] == 2
    # second call (different count, same compiled shape)
    _, pooled1 = pipe([imgs[0]], ["a cat"])
    assert pooled1.shape == (1, cfg.vilt.hidden_size)
    np.testing.assert_allclose(pooled1[0], pooled[0], atol=1e-5)

    stats = pipe.stats()
    assert stats["preprocess"]["steps"] == 2
    assert stats["forward"]["p50_s"] > 0
