#!/usr/bin/env python
"""Pooler-divergence budget for ToMe patch merging (ops/token_merge.py),
mirroring the w8/w8a8 budget convention in docs/BENCHMARKS.md: random-init
base geometry (bert-base tower + vilt-b32 co-encoder), max-abs pooler diff
vs the unmerged forward on the tanh-bounded output, plus cosine similarity.

Merging exploits IMAGE redundancy, so unlike quantization the budget is
input-dependent: natural images (smooth, locally correlated) merge nearly
for free while white noise is the adversarial worst case (no two patches
alike).  Both are reported; real deployments sit near the smooth row.

Runs on CPU (no TPU needed): python scripts/measure_merge_divergence.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from vault_tpu.models.vault import init_vault, vault_apply
from vault_tpu.presets import vault_base

BATCH, SEQ = 4, 40
CANVAS = (384, 608)


def smooth_images(rng, b):
    """Natural-statistics stand-in: random low-frequency fields (sum of a
    few 2-D cosines) + mild noise — locally correlated like photographs."""
    h, w = CANVAS
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    out = np.zeros((b, 3, h, w), np.float32)
    for i in range(b):
        for c in range(3):
            img = np.zeros((h, w), np.float32)
            for _ in range(4):
                fy, fx = rng.uniform(0.5, 4, 2)
                ph_y, ph_x = rng.uniform(0, 2 * np.pi, 2)
                img += rng.normal() * np.cos(2 * np.pi * fy * yy + ph_y) \
                    * np.cos(2 * np.pi * fx * xx + ph_x)
            out[i, c] = img + 0.05 * rng.normal(size=(h, w))
    return out / max(np.abs(out).max(), 1e-6)


def main():
    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    base_batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                           (BATCH, SEQ)), jnp.int32),
        attention_mask=jnp.ones((BATCH, SEQ), jnp.int32),
        token_type_ids=jnp.zeros((BATCH, SEQ), jnp.int32),
        pixel_mask=jnp.ones((BATCH, *CANVAS), jnp.int32),
    )
    inputs = {
        "smooth": smooth_images(rng, BATCH),
        "white_noise": rng.normal(size=(BATCH, 3, *CANVAS)).astype(np.float32),
    }

    for name, pixels in inputs.items():
        batch = dict(base_batch, pixel_values=jnp.asarray(pixels))
        ref = np.asarray(vault_apply(params, cfg, **batch).pooler_output)
        for target, layer in ((171, 0), (128, 0), (87, 0),
                              (128, 4), (87, 4), (87, 6)):
            out = np.asarray(vault_apply(
                params, cfg, merge_patches_to=target, merge_at_layer=layer,
                **batch).pooler_output)
            cos = float(np.mean([
                np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
                for a, b in zip(out, ref)]))
            print(json.dumps({
                "images": name, "merge_to": target, "merge_at_layer": layer,
                "joint_seq": SEQ + 1 + target,
                "pooler_max_abs_diff": round(float(np.abs(out - ref).max()), 4),
                "pooler_cos_sim": round(cos, 5),
            }), flush=True)


if __name__ == "__main__":
    main()
