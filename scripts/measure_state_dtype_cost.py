#!/usr/bin/env python
"""Measure the ACCURACY cost of the throughput knobs on the offline
dynamics proxy (VERDICT r2 item 3).

The throughput configs (docs/BENCHMARKS.md: ``--opt_state_dtype bfloat16
--grad_dtype bfloat16`` and batch 32 measured 463.7 vs 432.7 pairs/s at full
geometry) were only descent-tested; this script runs the SAME full training
recipe — schedule, eval windows, the real Trainer — under each config and
reports final-loss / eval-metric deltas vs the fp32 recipe, so "flip it for
throughput-bound runs" carries a measured risk number.  fp32 is the
parity-anchored baseline (tests/test_full_recipe_parity.py pins it to the
torch composition), so deltas vs fp32 ARE deltas vs the reference recipe.

Geometry is the tiny proxy (CPU-runnable; same stack, same code paths — only
the matrix sizes differ).  Labels are a learnable function of the inputs so
eval accuracy moves with training quality, not noise.

Run: JAX_PLATFORMS=cpu python scripts/measure_state_dtype_cost.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
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

N_TRAIN, N_DEV = 128, 64
SEQ = 10
EPOCHS = 3
SEED = 0


def make_data(cfg, rng, n):
    ids = rng.integers(0, min(cfg.text_tower.vocab_size, cfg.vilt.vocab_size),
                       size=(n, SEQ))
    feats = {
        "input_ids": ids.astype(np.int32),
        "attention_mask": np.ones((n, SEQ), np.int32),
        "token_type_ids": np.zeros((n, SEQ), np.int32),
        "pixel_values": rng.normal(size=(n, 3, 64, 96)).astype(np.float32),
        "pixel_mask": np.ones((n, 64, 96), np.int32),
    }
    # learnable signal: class = bucket of the mean token id (text-side) — the
    # model can fit this, so eval accuracy reflects optimization quality
    labels = (ids.mean(axis=1) // (ids.max() / 3 + 1e-9)).astype(np.int64)
    labels = np.clip(labels, 0, 2)
    return feats, labels


def run(config_name, *, batch, opt_state_dtype=None, grad_dtype=None,
        logroot="/tmp/state_dtype_cost"):
    cfg = VaultConfig(
        vilt=tiny_vilt_config(),
        text_tower=tiny_text_config(hidden_dropout_prob=0.0,
                                    attention_probs_dropout_prob=0.0),
    )
    rng = np.random.default_rng(SEED)
    train = make_data(cfg, rng, N_TRAIN)
    dev = make_data(cfg, rng, N_DEV)

    params = init_vault(jax.random.PRNGKey(SEED), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(SEED + 1),
                                          cfg.vilt.hidden_size, 3)
    params = jax.device_get(params)

    def apply_fn(p, b, deterministic, rng):
        return vault_for_classification(p, cfg, b, head_dropout=0.0,
                                        deterministic=True)

    args = TrainArgs(lr=1e-3, train_batch_size=batch, eval_batch_size=32,
                     num_train_epochs=EPOCHS, seed=SEED, disable_tqdm=True,
                     prefetch_batches=0, opt_state_dtype=opt_state_dtype,
                     grad_dtype=grad_dtype)
    handler = ExperimentHandler(logroot, config_name)
    tr = Trainer(apply_fn, params, args, InMemoryDataset(*train),
                 dev_dataset=InMemoryDataset(*dev), exp_handler=handler)
    tr.train()
    s = handler._series
    return {
        "train_loss": list(s["train_loss"]),
        "eval_loss": list(s["eval_loss"]),
        "eval_accuracy": list(s["eval_accuracy"]),
    }


def main():
    configs = [
        # fp32 is the parity ANCHOR (pinned to torch by
        # test_full_recipe_parity), not the shipped default — these
        # measurements are why the default flipped to bfloat16
        ("fp32 (parity anchor), batch 8", dict(batch=8)),
        ("opt_state bf16, batch 8", dict(batch=8, opt_state_dtype="bfloat16")),
        ("grad bf16, batch 8", dict(batch=8, grad_dtype="bfloat16")),
        ("opt+grad bf16, batch 8", dict(batch=8, opt_state_dtype="bfloat16",
                                        grad_dtype="bfloat16")),
        ("opt_state int8, batch 8", dict(batch=8, opt_state_dtype="int8")),
        ("fp32, batch 32", dict(batch=32)),
        ("opt+grad bf16, batch 32", dict(batch=32,
                                         opt_state_dtype="bfloat16",
                                         grad_dtype="bfloat16")),
    ]
    results = {name: run(name, **kw) for name, kw in configs}

    base8 = results["fp32 (parity anchor), batch 8"]
    base32 = results["fp32, batch 32"]
    print("\n| config | final train_loss | final eval_loss | final eval_acc |"
          " max |Δtrain_loss| vs fp32 | Δeval_acc vs fp32 |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        base = base32 if "batch 32" in name else base8
        n = min(len(r["train_loss"]), len(base["train_loss"]))
        dmax = max(abs(a - b) for a, b in
                   zip(r["train_loss"][:n], base["train_loss"][:n]))
        dacc = r["eval_accuracy"][-1] - base["eval_accuracy"][-1]
        print(f"| {name} | {r['train_loss'][-1]:.4f} | {r['eval_loss'][-1]:.4f}"
              f" | {r['eval_accuracy'][-1]:.4f} | {dmax:.4f} | {dacc:+.4f} |")


if __name__ == "__main__":
    main()
