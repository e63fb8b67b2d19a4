#!/usr/bin/env python
"""Accuracy cost of TRAINING with ToMe patch merging (`TrainArgs.merge_to`),
measured on the offline recipe proxy (VERDICT r4 #1b: the 1.39-1.66x train
speedup was shipped as "a deliberate recipe change, not a free lunch" with
the size of the change unmeasured).

The full-recipe-parity harness's learnable signal lives in the TEXT (class
encoded in the first token id), which ToMe — a patch-token lever — cannot
touch; a merged run would trivially match control and measure nothing.
This proxy plants the signal in the IMAGE instead: the class is the COLOUR
(red vs green) of one 16x16 patch on the 3x3 grid, over pixel noise, with
CONSTANT text — so the recipe can only learn through the patch tokens that
merging coarsens.  Geometry is proportional to production: 9 patch tokens
merged to 4 (44% kept vs 87/228 = 38%), merge at layer 0 (embeddings) and
at layer 1 of the 2-layer tiny co-encoder (the --merge_at_layer 4-of-12
analogue).

Task-design notes (each alternative was probed and rejected — the tiny
2-layer proxy puts real constraints on what converges):
  * class-specific patch POSITION (bright patch at (k,k)): unlearnable at
    this scale — patch tokens are perfectly linearly separable at init,
    but the pooled CLS feature starts at chance, so there is no gradient
    path and the recipe memorizes pixel noise instead (train 100%, dev at
    chance, every lr/n/noise combination probed);
  * brightness LEVEL at a fixed patch: LayerNorm normalizes per-token
    magnitude away — only "dark vs bright" survives (dev ~= 2/3 exactly);
  * random per-sample text: a perfect memorization key that beats any
    image signal (dev at chance even at pixel noise 0.05).
Colour DIRECTION at a fixed patch survives LayerNorm, is mean-visible to
the pooler at init (gradient path exists), and converges to 100% held-out
accuracy through the production path in ~300 steps.

Runs the REAL Trainer protocol (windowed eval, early stop, best restore —
training/trainer.py) under the SHIPPED TrainArgs defaults (rbg dropout
stream, bf16 AdamW moments) x 3 seeds x {control, merge@0, merge@1}.
Prints one JSON line per run plus a summary with mean deltas.

CPU, ~10-20 min (the task saturates in ~2 eval windows):
python scripts/measure_merge_recipe_cost.py
(MERGE_RECIPE_SEEDS=1 for a quick single-seed pass; MERGE_RECIPE_MODES
filters modes.)
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

N_TRAIN, N_EVAL = 480, 192
SEQ = 8
N_CLASSES = 2
# class -> colour channel of the +contrast block at the CENTER patch of
# the 3x3 grid: the signal survives only if merging keeps the coloured
# patch's channel direction distinguishable after averaging with its
# noise neighbours
CLASS_CHANNEL = {0: 0, 1: 1}          # red vs green
SIGNAL_PATCH = (1, 1)


def make_config():
    return VaultConfig(
        vilt=tiny_vilt_config(image_size=48, patch_size=16,
                              num_patch_tokens=9),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )


def synth_image_task(rng, n, cfg, contrast=2.0, noise=0.5):
    """Labels carried ONLY by the image: a +``contrast`` block on the class
    colour channel at the center patch, over ``noise``-scaled pixel noise;
    CONSTANT text (random per-sample text is a memorization key — see
    module docstring).  Lower contrast shrinks the decision margins (used
    by measure_head_divergence_trained.py to probe the boundary region of
    a trained model)."""
    labels = rng.integers(0, N_CLASSES, n)
    px = (rng.normal(size=(n, 3, 48, 48)) * noise).astype(np.float32)
    r, c = SIGNAL_PATCH
    for i, lab in enumerate(labels):
        px[i, CLASS_CHANNEL[int(lab)],
           r * 16:(r + 1) * 16, c * 16:(c + 1) * 16] += contrast
    ids = np.tile(np.arange(5, 5 + SEQ, dtype=np.int32)[None], (n, 1))
    feats = {
        "input_ids": ids,
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

    # the image-borne signal needs ~300 optimizer steps before eval moves
    # (the colour detector must be learned, not just a token-id lookup):
    # the first cut with 12 epochs / patience 2 early-stopped every run at
    # 3-4 windows, still at chance — measuring protocol noise, not the
    # merge cost.  lr 1e-3 (not the parity task's 5e-3): probed stable for
    # the visual path
    args = TrainArgs(lr=1e-3, train_batch_size=16, eval_batch_size=16,
                     num_train_epochs=40, early_stopping_patience=8,
                     early_stopping_delta=0.005, seed=0, disable_tqdm=True,
                     prefetch_batches=0)
    handler = ExperimentHandler(out_dir, name)
    trainer = Trainer(apply_fn, jax.tree.map(np.copy, params), args,
                      InMemoryDataset(*train, name="toy(train)"),
                      dev_dataset=InMemoryDataset(*dev),
                      test_dataset=InMemoryDataset(*dev),
                      exp_handler=handler)
    trainer.train()
    finals = dict(handler._finals)
    rec = {"windows": len(handler._series["train_loss"]),
           "best_step": finals.get("best_step"),
           "best_eval_accuracy": round(finals["best_eval_accuracy"], 4),
           "test_eval_accuracy": round(finals["test_eval_accuracy"], 4)}
    # best-restored weights (measure_head_divergence_trained.py reuses the
    # trained model to test lever rankings on real margins)
    return rec, jax.device_get(trainer.params)


def main():
    import tempfile

    seeds = range(int(os.environ.get("MERGE_RECIPE_SEEDS", "3")))
    cfg = make_config()
    modes = {"control": {}, "merge4@0": dict(merge_to=4, merge_at_layer=0),
             "merge4@1": dict(merge_to=4, merge_at_layer=1)}
    only = os.environ.get("MERGE_RECIPE_MODES")
    if only:
        modes = {m: kw for m, kw in modes.items() if m in only.split(",")}
    acc = {m: [] for m in modes}
    with tempfile.TemporaryDirectory() as td:
        for seed in seeds:
            rng = np.random.default_rng(seed)
            train = synth_image_task(rng, N_TRAIN, cfg)
            dev = synth_image_task(rng, N_EVAL, cfg)
            params = init_vault(jax.random.PRNGKey(seed), cfg)
            params["head"] = init_classifier_head(
                jax.random.PRNGKey(seed + 100), cfg.vilt.hidden_size,
                N_CLASSES)
            for mode, kw in modes.items():
                rec, _ = run_recipe(cfg, params, train, dev, td,
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
            for m in modes if m != "control" and "control" in means},
        "n_seeds": len(list(seeds)),
    }), flush=True)


if __name__ == "__main__":
    main()
