#!/usr/bin/env python
"""Pooler-divergence budgets for ToMe patch merging (ops/token_merge.py)
and int8 quantization (ops/quantize.py), on THREE input classes:

  * real_photos — actual photographs available offline (sklearn's
    china/flower sample images, matplotlib's grace_hopper portrait,
    pygame's camera test photo), fed through the PRODUCTION
    VaultProcessor path (crop/resize/normalize/pad at the bench canvas),
    partial pixel masks included — the deployment-representative row;
  * smooth — random low-frequency fields (natural-statistics stand-in);
  * white_noise — the adversarial worst case for merging (no two patches
    alike; merging exploits image redundancy, so unlike quantization its
    budget is input-dependent).

Convention matches docs/BENCHMARKS.md: random-init base geometry
(bert-base tower + vilt-b32 co-encoder), max-abs pooler diff vs the
unmodified forward on the tanh-bounded output, plus cosine similarity.

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
from vault_tpu.ops.quantize import quantize_model_params
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


def load_real_photos():
    """Four real photographs shipped inside offline-available packages
    (no network), as uint8 HWC arrays — landscapes, a portrait, and a
    low-res camera frame, so the processor's resize/pad paths all fire."""
    from PIL import Image
    from sklearn.datasets import load_sample_image

    photos = [load_sample_image("china.jpg"),
              load_sample_image("flower.jpg")]
    try:
        import matplotlib.cbook
        p = matplotlib.cbook.get_sample_data("grace_hopper.jpg",
                                             asfileobj=False)
        photos.append(np.asarray(Image.open(p)))
    except Exception:
        photos.append(photos[0][::-1, :, :].copy())  # fallback: flipped china
    try:
        import pygame
        cam = os.path.join(os.path.dirname(pygame.__file__),
                           "docs/generated/_images/camera_rgb.jpg")
        photos.append(np.asarray(Image.open(cam)))
    except Exception:
        photos.append(photos[1][:, ::-1, :].copy())
    return photos


def real_photo_batch():
    """Real photos through the PRODUCTION preprocessing path (fixed bench
    canvas -> partial pixel masks, exactly what serving sees)."""
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import build_tokenizer

    proc = VaultProcessor(build_tokenizer("bert-base-uncased"),
                          canvas=CANVAS)
    out = proc.encode_images(load_real_photos())
    return np.asarray(out[0], np.float32), np.asarray(out[1], np.int32)


def main():
    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    base_batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                           (BATCH, SEQ)), jnp.int32),
        attention_mask=jnp.ones((BATCH, SEQ), jnp.int32),
        token_type_ids=jnp.zeros((BATCH, SEQ), jnp.int32),
    )
    full_mask = np.ones((BATCH, *CANVAS), np.int32)
    real_px, real_pm = real_photo_batch()
    inputs = {
        "real_photos": (real_px, real_pm),
        "smooth": (smooth_images(rng, BATCH), full_mask),
        "white_noise": (rng.normal(size=(BATCH, 3, *CANVAS))
                        .astype(np.float32), full_mask),
    }

    qparams = {mode: quantize_model_params(params, mode=mode)
               for mode in ("w8", "w8a8")}

    def run(p, batch, **kw):
        return np.asarray(vault_apply(p, cfg, **batch, **kw).pooler_output)

    def report(tag, out, ref, **extra):
        cos = float(np.mean([
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
            for a, b in zip(out, ref)]))
        print(json.dumps({
            **extra, "mode": tag,
            "pooler_max_abs_diff": round(float(np.abs(out - ref).max()), 4),
            "pooler_cos_sim": round(cos, 5),
        }), flush=True)

    for name, (pixels, pmask) in inputs.items():
        batch = dict(base_batch, pixel_values=jnp.asarray(pixels),
                     pixel_mask=jnp.asarray(pmask))
        ref = run(params, batch)
        for target, layer in ((171, 0), (128, 0), (87, 0),
                              (128, 4), (87, 4), (87, 6)):
            out = run(params, batch, merge_patches_to=target,
                      merge_at_layer=layer)
            report("merge", out, ref, images=name, merge_to=target,
                   merge_at_layer=layer, joint_seq=SEQ + 1 + target)
        for mode in ("w8", "w8a8"):
            report(mode, run(qparams[mode], batch), ref, images=name)
        # composition: the two serving levers together (docs/BENCHMARKS.md
        # w8a8 x merge composition)
        out = run(qparams["w8a8"], batch, merge_patches_to=87,
                  merge_at_layer=0)
        report("w8a8+merge", out, ref, images=name, merge_to=87,
               merge_at_layer=0)


if __name__ == "__main__":
    main()
