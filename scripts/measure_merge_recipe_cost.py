#!/usr/bin/env python
"""Accuracy cost of TRAINING with ToMe patch merging (`TrainArgs.merge_to`),
measured on the offline recipe proxy (VERDICT r4 #1b: the 1.39-1.66x train
speedup was shipped as "a deliberate recipe change, not a free lunch" with
the size of the change unmeasured).

The full-recipe-parity harness's learnable signal lives in the TEXT (class
encoded in the first token id), which ToMe — a patch-token lever — cannot
touch; a merged run would trivially match control and measure nothing.
This proxy plants the signal in the IMAGE instead: class k brightens one
16x16 patch at a class-specific position on a 3x3 patch grid (plus pixel
noise; text ids are random), so the recipe can only saturate through the
patch tokens that merging coarsens.  Geometry is proportional to
production: 9 patch tokens merged to 4 (44% kept vs 87/228 = 38%), merge
at layer 0 (embeddings) and at layer 1 of the 2-layer tiny co-encoder (the
--merge_at_layer 4-of-12 analogue).

Runs the REAL Trainer protocol (windowed eval, patience-2 early stop, best
restore — training/trainer.py) under the SHIPPED TrainArgs defaults
(rbg dropout stream, bf16 AdamW moments) x 3 seeds x {control, merge@0,
merge@1}.  Prints one JSON line per run plus a summary with mean deltas.

CPU, ~10-20 min: python scripts/measure_merge_recipe_cost.py
(MERGE_RECIPE_SEEDS=1 for a quick single-seed pass.)
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

jax.config.update("jax_platforms", "cpu")

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.loader import InMemoryDataset
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.trainer import TrainArgs, Trainer

N_TRAIN, N_EVAL = 96, 48
SEQ = 8
# class k -> bright block at patch (k, k) on the 3x3 grid: classes are
# spatially disjoint, so the signal survives only if merging keeps the
# bright patch distinguishable from its dark neighbours
CLASS_PATCH = {0: (0, 0), 1: (1, 1), 2: (2, 2)}


def make_config():
    return VaultConfig(
        vilt=tiny_vilt_config(image_size=48, patch_size=16,
                              num_patch_tokens=9),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )


def synth_image_task(rng, n, cfg):
    """Labels carried ONLY by the image: a +2.0 block at the class patch
    over unit pixel noise; random text."""
    labels = rng.integers(0, 3, n)
    px = rng.normal(size=(n, 3, 48, 48)).astype(np.float32)
    for i, lab in enumerate(labels):
        r, c = CLASS_PATCH[int(lab)]
        px[i, :, r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] += 2.0
    feats = {
        "input_ids": rng.integers(
            5, cfg.text_tower.vocab_size, (n, SEQ)).astype(np.int32),
        "attention_mask": np.ones((n, SEQ), np.int32),
        "token_type_ids": np.zeros((n, SEQ), np.int32),
        "pixel_values": px,
        "pixel_mask": np.ones((n, 48, 48), np.int32),
    }
    return feats, labels


def run_recipe(cfg, params, train, dev, out_dir, name,
               merge_to=None, merge_at_layer=0):
    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(
            p, cfg, batch, head_dropout=0.1, deterministic=deterministic,
            rng=rng, merge_patches_to=merge_to, merge_at_layer=merge_at_layer)

    args = TrainArgs(lr=5e-3, train_batch_size=16, eval_batch_size=16,
                     num_train_epochs=12, early_stopping_patience=2,
                     early_stopping_delta=0.01, seed=0, disable_tqdm=True,
                     prefetch_batches=0)
    handler = ExperimentHandler(out_dir, name)
    trainer = Trainer(apply_fn, jax.tree.map(np.copy, params), args,
                      InMemoryDataset(*train, name="toy(train)"),
                      dev_dataset=InMemoryDataset(*dev),
                      test_dataset=InMemoryDataset(*dev),
                      exp_handler=handler)
    trainer.train()
    finals = dict(handler._finals)
    return {"windows": len(handler._series["train_loss"]),
            "best_step": finals.get("best_step"),
            "best_eval_accuracy": round(finals["best_eval_accuracy"], 4),
            "test_eval_accuracy": round(finals["test_eval_accuracy"], 4)}


def main():
    import tempfile

    seeds = range(int(os.environ.get("MERGE_RECIPE_SEEDS", "3")))
    cfg = make_config()
    modes = {"control": {}, "merge4@0": dict(merge_to=4, merge_at_layer=0),
             "merge4@1": dict(merge_to=4, merge_at_layer=1)}
    acc = {m: [] for m in modes}
    with tempfile.TemporaryDirectory() as td:
        for seed in seeds:
            rng = np.random.default_rng(seed)
            train = synth_image_task(rng, N_TRAIN, cfg)
            dev = synth_image_task(rng, N_EVAL, cfg)
            params = init_vault(jax.random.PRNGKey(seed), cfg)
            params["head"] = init_classifier_head(
                jax.random.PRNGKey(seed + 100), cfg.vilt.hidden_size, 3)
            for mode, kw in modes.items():
                rec = run_recipe(cfg, params, train, dev, td,
                                 f"{mode}_s{seed}", **kw)
                acc[mode].append(rec["test_eval_accuracy"])
                print(json.dumps({"seed": seed, "mode": mode, **rec}),
                      flush=True)
    means = {m: round(float(np.mean(v)), 4) for m, v in acc.items()}
    print(json.dumps({
        "summary": "merged-recipe accuracy deltas (image-borne signal)",
        "mean_test_accuracy": means,
        "delta_vs_control": {
            m: round(means[m] - means["control"], 4)
            for m in modes if m != "control"},
        "n_seeds": len(list(seeds)),
    }), flush=True)


if __name__ == "__main__":
    main()
