"""Trainable ToMe (VERDICT r3 #5): gradients through the merge are exact
almost everywhere — the size-weighted average is differentiable and merge
DECISIONS (argsort/argmax) are piecewise-constant in the inputs — so
training with ``TrainArgs.merge_to`` must (a) produce finite-difference-
correct grads, (b) descend like the unmerged dynamics proxy, and (c) be
wired through the experiment CLI's TrainArgs plumbing."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.ops.token_merge import bipartite_merge_step, merge_tokens_to
from vault_tpu.training.trainer import TrainArgs, Trainer
from vault_tpu.data.loader import InMemoryDataset


def _toy(n=48, seed=0, patches=16):
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=8,
                              num_patch_tokens=patches),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 3, n)
    ids = rng.integers(5, cfg.text_tower.vocab_size, (n, 8))
    ids[:, 0] = labels + 1
    feats = {
        "input_ids": ids.astype(np.int32),
        "attention_mask": np.ones((n, 8), np.int32),
        "token_type_ids": np.zeros((n, 8), np.int32),
        "pixel_values": rng.normal(size=(n, 3, 32, 32)).astype(np.float32),
        "pixel_mask": np.ones((n, 32, 32), np.int32),
    }
    params = init_vault(jax.random.PRNGKey(seed), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(seed + 1),
                                          cfg.vilt.hidden_size, 3)
    return cfg, params, feats, labels


def test_merge_step_grads_match_finite_differences():
    """d(loss)/d(x) through one bipartite merge step vs central differences.
    Decisions are constant under a small perturbation (generic inputs, no
    near-ties), so AD and FD must agree."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 10, 6)).astype(np.float32)
    sizes = jnp.ones((2, 10), jnp.float32)
    mask = jnp.ones((2, 10), jnp.int32)
    probe = rng.normal(size=(2, 7, 6)).astype(np.float32)  # 10 - r = 7

    def loss(x):
        y, s, _ = bipartite_merge_step(x, sizes, mask, r=3)
        # mix content and sizes so BOTH outputs carry gradient signal
        return jnp.sum(y * probe) + jnp.sum(jnp.log(s))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x0)))
    eps = 1e-3
    dirs = rng.normal(size=(4, *x0.shape)).astype(np.float32)
    for d in dirs:
        fd = (float(loss(jnp.asarray(x0 + eps * d)))
              - float(loss(jnp.asarray(x0 - eps * d)))) / (2 * eps)
        ad = float(np.sum(g * d))
        assert abs(fd - ad) <= 5e-2 * max(1.0, abs(fd), abs(ad)), (fd, ad)


@pytest.mark.slow
def test_merge_model_grads_match_finite_differences():
    """End-to-end: grads w.r.t. the classifier head through a merged
    forward (embed-time and mid-stack) vs central differences."""
    cfg, params, feats, labels = _toy(n=4)
    batch = {k: jnp.asarray(v[:4]) for k, v in feats.items()}
    y = jnp.asarray(labels[:4])

    for layer in (0, 1):
        def loss(head_w):
            p = dict(params, head={"out": {"w": head_w,
                                           "b": params["head"]["out"]["b"]}})
            logits = vault_for_classification(
                p, cfg, batch, deterministic=True,
                merge_patches_to=7, merge_at_layer=layer)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

        w0 = params["head"]["out"]["w"]
        g = np.asarray(jax.grad(loss)(w0))
        rng = np.random.default_rng(layer)
        d = rng.normal(size=w0.shape).astype(np.float32)
        eps = 1e-3
        fd = (float(loss(w0 + eps * d)) - float(loss(w0 - eps * d))) / (2 * eps)
        ad = float(np.sum(g * d))
        assert abs(fd - ad) <= 5e-2 * max(1.0, abs(fd), abs(ad)), (layer, fd, ad)


@pytest.mark.slow
def test_train_descends_with_merge():
    """Dynamics proxy: the same learnable toy task as
    test_train_descends_and_logs, trained THROUGH the merge (16 -> 7 patch
    tokens), must descend and reach the unmerged accuracy bar — the signal
    lives in the text tokens, which merging never touches."""
    cfg, params, feats, labels = _toy()
    ds = InMemoryDataset(feats, labels, name="toy(train)")
    args = TrainArgs(lr=5e-3, train_batch_size=16, eval_batch_size=16,
                     num_train_epochs=6, early_stopping_patience=None,
                     seed=0, merge_to=7)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(
            p, cfg, batch, head_dropout=0.1, deterministic=deterministic,
            rng=rng, merge_patches_to=args.merge_to,
            merge_at_layer=args.merge_at_layer)

    trainer = Trainer(apply_fn, params, args, ds, dev_dataset=ds)
    trainer.train()
    losses = trainer.exp_handler._series["train_loss"]
    assert losses[-1] < losses[0] * 0.7, losses
    assert trainer.exp_handler._series["eval_accuracy"][-1] > 0.6


def test_trainer_args_thread_merge_flags():
    """The CLI plumbing (experiments/utils.py) must thread --merge_to /
    --merge_at_layer into TrainArgs."""
    import argparse
    import sys
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from experiments.utils import (TRAINER_ARGS, GENERAL_ARGS,
                                   add_arguments, trainer_args_from_namespace)

    p = argparse.ArgumentParser()
    add_arguments(p, TRAINER_ARGS)
    add_arguments(p, GENERAL_ARGS)
    args = p.parse_args(["--merge_to", "87", "--merge_at_layer", "4"])
    targs = trainer_args_from_namespace(args)
    assert targs.merge_to == 87 and targs.merge_at_layer == 4
    targs = trainer_args_from_namespace(p.parse_args([]))
    assert targs.merge_to is None and targs.merge_at_layer == 0
