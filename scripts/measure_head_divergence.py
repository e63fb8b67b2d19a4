#!/usr/bin/env python
"""Per-TASK-HEAD divergence budgets for the two serving levers (ToMe patch
merging and int8 quantization), beyond the pooler-only budget of
measure_merge_divergence.py.

Each reference task head (vault/models/vault/model.py:375-509) consumes the
backbone differently — MLM reads per-token text logits, retrieval ranks on
a 1-dim score where a small absolute shift can reorder candidates, NLVR2
runs the backbone twice — so each gets its own max-abs AND decision-level
budget (argmax flip rate / pairwise rank-inversion rate):

  * cls3      — VaultForTMSC 3-way pooler head: argmax flip rate
  * mlm       — VaultForMaskedLM text-span token logits: top-1 flip rate
  * vqa       — VaultForQuestionAnswering 3129-way: argmax flip rate
  * rank      — VaultForImageAndTextRetrieval 1-dim score: fraction of
                pairwise orderings inverted across the candidate batch
  * nlvr2     — VaultForImagesAndTextClassification 2-way: argmax flip rate

Inputs are REAL photographs (the offline set of
measure_merge_divergence.py, expanded 6x by production-path augmentations
— hflip + relative_random_crop — to 24 distinct images x 2 text draws =
48 decisions per pooled head, 48 NLVR2 pairs (both orders), 1128 rank
orderings, 1920 MLM token decisions; a 0/8 flip estimate alone would be
consistent with a multi-percent true rate) through the production
VaultProcessor path.
Model is random-init base geometry (no pretrained checkpoints exist in
this image): random-init logits sit closer to decision boundaries than a
trained model's, so the flip rates here are a PESSIMISTIC proxy — a
trained model with real margins flips less.

Runs on CPU (~12 min): python scripts/measure_head_divergence.py
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

from vault_tpu.models.vault import (
    classifier_head_apply, init_classifier_head, init_mlm_head,
    init_pair_head, init_rank_head, init_vault, init_vqa_head,
    mlm_head_apply, pair_head_apply, rank_head_apply,
    resize_modality_type_embeddings, vault_apply, vqa_head_apply)
from vault_tpu.ops.quantize import quantize_model_params
from vault_tpu.presets import vault_base

from measure_merge_divergence import CANVAS, SEQ, load_real_photos

N_IMAGES = 24      # 4 real photos x 6 augmented variants
BATCH = 48         # x 2 text draws each -> 1128 rank orderings
VQA_CLASSES = 3129


def augmented_photo_batch():
    """24 distinct real images: each base photo plus hflip and
    relative_random_crop variants (the production train-time augmentation,
    data/image.py:88), through the production processor path."""
    from vault_tpu.data.image import relative_random_crop
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import build_tokenizer

    arng = np.random.default_rng(7)
    images = []
    for base in load_real_photos():
        crops = [relative_random_crop(arng, base) for _ in range(3)]
        images += [base, base[:, ::-1].copy(), crops[0], crops[1],
                   crops[2], crops[0][:, ::-1].copy()]
    assert len(images) == N_IMAGES
    proc = VaultProcessor(build_tokenizer("bert-base-uncased"),
                          canvas=CANVAS)
    out = proc.encode_images(images)
    return np.asarray(out[0], np.float32), np.asarray(out[1], np.int32)


def flip_rate(a, b):
    return float(np.mean(np.argmax(a, -1) != np.argmax(b, -1)))


def inversion_rate(a, b):
    """Fraction of candidate pairs whose score ORDER differs (the retrieval
    decision metric: R@k only changes when orderings invert)."""
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    ia, ib = a[:, None] - a[None, :], b[:, None] - b[None, :]
    upper = np.triu_indices(len(a), k=1)
    return float(np.mean(np.sign(ia[upper]) != np.sign(ib[upper])))


def main():
    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    # NLVR2 needs a modality slot per image; the resize copies the image
    # row, so single-image outputs are unchanged (safe to apply globally)
    params = {**params, "vilt": resize_modality_type_embeddings(
        params["vilt"], 2)}
    h = cfg.resolved_vilt().hidden_size
    k = jax.random.PRNGKey(1)
    heads = {
        "cls3": init_classifier_head(jax.random.fold_in(k, 0), h, 3),
        "mlm": init_mlm_head(jax.random.fold_in(k, 1), cfg.resolved_vilt()),
        "vqa": init_vqa_head(jax.random.fold_in(k, 2), cfg.resolved_vilt(),
                             VQA_CLASSES),
        "rank": init_rank_head(jax.random.fold_in(k, 3), cfg.resolved_vilt()),
        "pair": init_pair_head(jax.random.fold_in(k, 4), cfg.resolved_vilt()),
    }

    rng = np.random.default_rng(0)
    px, pm = augmented_photo_batch()                  # (24, 3, H, W)
    px = np.concatenate([px, px])                     # 24 images x 2 texts
    pm = np.concatenate([pm, pm])
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                           (BATCH, SEQ)), jnp.int32),
        attention_mask=jnp.ones((BATCH, SEQ), jnp.int32),
        token_type_ids=jnp.zeros((BATCH, SEQ), jnp.int32),
        pixel_values=jnp.asarray(px), pixel_mask=jnp.asarray(pm))
    # NLVR2: photo pairs (i, i+1 cyclic) in BOTH orders (order matters —
    # each slot gets its own modality-type row), 48 pair decisions
    n = N_IMAGES
    idx = [(i, (i + 1) % n) for i in range(n)] + \
          [((i + 1) % n, i) for i in range(n)]
    pair_px = np.stack([np.stack([px[a], px[b]]) for a, b in idx])
    pair_pm = np.stack([np.stack([pm[a], pm[b]]) for a, b in idx])
    pair_text = dict(
        input_ids=jnp.concatenate([batch["input_ids"][:n]] * 2),
        attention_mask=jnp.concatenate([batch["attention_mask"][:n]] * 2),
        token_type_ids=jnp.concatenate([batch["token_type_ids"][:n]] * 2))

    qp = {m: quantize_model_params(params, mode=m) for m in ("w8", "w8a8")}
    # every lever composition scripts/serve.py accepts gets a real-photo
    # row (r4 verdict #8: the recommended w8a8+merge@4 only had synthetic)
    modes = {
        "merge87@0": (params, dict(merge_patches_to=87, merge_at_layer=0)),
        "merge87@4": (params, dict(merge_patches_to=87, merge_at_layer=4)),
        "w8": (qp["w8"], {}),
        "w8a8": (qp["w8a8"], {}),
        "w8+merge87@0": (qp["w8"], dict(merge_patches_to=87,
                                        merge_at_layer=0)),
        "w8+merge87@4": (qp["w8"], dict(merge_patches_to=87,
                                        merge_at_layer=4)),
        "w8a8+merge87@0": (qp["w8a8"], dict(merge_patches_to=87,
                                            merge_at_layer=0)),
        "w8a8+merge87@4": (qp["w8a8"], dict(merge_patches_to=87,
                                            merge_at_layer=4)),
    }

    def head_logits(p, kw):
        out = vault_apply(p, cfg, **batch, **kw)
        pooled = out.pooler_output
        text_hidden = out.last_hidden_state[:, :SEQ]
        nl = []
        for i in range(2):
            o = vault_apply(p, cfg, **pair_text,
                            pixel_values=jnp.asarray(pair_px[:, i]),
                            pixel_mask=jnp.asarray(pair_pm[:, i]),
                            image_token_type_idx=i + 1, **kw)
            nl.append(o.pooler_output)
        return {
            "cls3": np.asarray(classifier_head_apply(heads["cls3"], pooled)),
            "mlm": np.asarray(mlm_head_apply(
                heads["mlm"], p["vilt"], cfg.resolved_vilt(), text_hidden)),
            "vqa": np.asarray(vqa_head_apply(
                heads["vqa"], cfg.resolved_vilt(), pooled)),
            "rank": np.asarray(rank_head_apply(heads["rank"], pooled)),
            "nlvr2": np.asarray(pair_head_apply(
                heads["pair"], cfg.resolved_vilt(),
                jnp.concatenate(nl, axis=-1))),
        }

    ref = head_logits(params, {})
    for mode, (p, kw) in modes.items():
        out = head_logits(p, kw)
        for head in ref:
            if head == "rank":
                n_dec = BATCH * (BATCH - 1) // 2
                decision = {"rank_inversion_rate":
                            round(inversion_rate(out[head], ref[head]), 4)}
            else:
                n_dec = int(np.prod(np.asarray(ref[head]).shape[:-1]))
                decision = {"argmax_flip_rate":
                            round(flip_rate(out[head], ref[head]), 4)}
            print(json.dumps({
                "head": head, "mode": mode,
                "logit_max_abs_diff":
                    round(float(np.abs(out[head] - ref[head]).max()), 4),
                "n_decisions": n_dec,
                **decision,
            }), flush=True)


if __name__ == "__main__":
    main()
