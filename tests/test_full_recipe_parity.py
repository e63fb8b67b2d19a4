"""FULL-RECIPE training parity: the real ``Trainer.train()`` protocol vs a
torch mirror of the reference's fine-tune loop (vault/tmsc_utils/trainer.py:
282-484) — not just bare optimizer steps (that's
test_training_dynamics_parity.py) but the complete recipe:

  * linear warmup/decay schedule over epochs x steps_per_epoch,
  * seeded per-epoch shuffling,
  * per-``eval_steps`` windowed train loss,
  * dev evaluation each window (loss + accuracy + macro F1),
  * early stopping with patience AND delta, best-weights snapshot/restore
    (vault/train_utils.py:13-171),
  * final test evaluation on the restored best weights.

Both sides start from identical weights (fresh classifier head included) and
see identical batches; the train-loss series, the eval-metric series, the
early-stop decision point, and the test metrics must all match.  This is the
strongest offline substitute for the BASELINE real-data configs (no MVSA/
Twitter data ships in this environment)."""

import copy
import pytest
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.loader import InMemoryDataset
from vault_tpu.models.convert import bert_params_from_torch, vilt_params_from_torch
from vault_tpu.models.vault import vault_for_classification
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.trainer import TrainArgs, Trainer

from tests.hf_utils import DeterministicMultinomial, make_hf_bert, make_hf_vilt
from tests.test_training_dynamics_parity import TorchVault

pytestmark = pytest.mark.slow

N_TRAIN, N_DEV, N_TEST = 32, 20, 20
BATCH = 8
SEQ = 10
N_CLASSES = 3
LR = 1e-3
EPOCHS = 4
EVAL_STEPS = 2
PATIENCE = 2
DELTA = 0.05
WARMUP_RATIO = 0.1
SEED = 0


def _synth(rng, n, text_vocab, vilt_vocab):
    ids = rng.integers(0, min(text_vocab, vilt_vocab), size=(n, SEQ))
    return {
        "input_ids": ids.astype(np.int32),
        "attention_mask": np.ones((n, SEQ), np.int32),
        "token_type_ids": np.zeros((n, SEQ), np.int32),
        "pixel_values": rng.normal(size=(n, 3, 64, 96)).astype(np.float32),
        "pixel_mask": np.ones((n, 64, 96), np.int32),
    }, rng.integers(0, N_CLASSES, n)


def _torch_batch(feats, labels, sel):
    return (torch.tensor(feats["input_ids"][sel].astype(np.int64)),
            torch.tensor(feats["attention_mask"][sel].astype(np.int64)),
            torch.tensor(feats["token_type_ids"][sel].astype(np.int64)),
            torch.tensor(feats["pixel_values"][sel]),
            torch.tensor(feats["pixel_mask"][sel].astype(np.int64)),
            torch.tensor(labels[sel]))


def _torch_evaluate(model, feats, labels):
    """Mirror of Trainer.evaluate / reference trainer.py:429-484."""
    model.eval()
    ce = torch.nn.CrossEntropyLoss()
    n = len(labels)
    total, preds = 0.0, []
    with torch.no_grad():
        for start in range(0, n, BATCH):
            sel = np.arange(start, min(start + BATCH, n))
            ids, mask, types, px, pm, lb = _torch_batch(feats, labels, sel)
            with DeterministicMultinomial():
                logits = model(ids, mask, types, px, pm)
            total += float(ce(logits, lb)) * len(sel)
            preds.extend(logits.argmax(-1).tolist())
    model.train()
    from vault_tpu.training.metrics import classification_results

    out = {"eval_loss": total / n}
    out.update(classification_results(labels.tolist(), preds))
    return out


def _torch_full_recipe(model, train, dev, test):
    """The reference protocol, mirrored step for step: windowed train loss,
    eval windows, EarlyStopping(patience, delta, higher_better) with
    state_dict snapshot/restore, final test eval."""
    from transformers import get_linear_schedule_with_warmup

    feats, labels = train
    n = len(labels)
    steps_per_epoch = math.ceil(n / BATCH)
    num_steps = steps_per_epoch * EPOCHS
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    sched = get_linear_schedule_with_warmup(opt, int(WARMUP_RATIO * num_steps),
                                            num_steps)
    ce = torch.nn.CrossEntropyLoss()
    data_rng = np.random.default_rng(SEED)

    series: dict = {}
    best, cnt, best_state, best_metrics = None, 0, None, {}
    step, stop = 0, False
    window_sum = window_n = 0
    model.train()
    for epoch in range(EPOCHS):
        if stop:
            break
        idx = np.arange(n)
        data_rng.shuffle(idx)
        for start in range(0, n, BATCH):
            if step % EVAL_STEPS == 0:
                window_sum, window_n = 0.0, 0
            sel = idx[start:start + BATCH]
            ids, mask, types, px, pm, lb = _torch_batch(feats, labels, sel)
            with DeterministicMultinomial():
                logits = model(ids, mask, types, px, pm)
            loss = ce(logits, lb)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
            window_sum += float(loss.detach()) * len(sel)
            window_n += len(sel)
            if (step + 1) % EVAL_STEPS == 0:
                results = {"train_loss": window_sum / window_n}
                results.update(_torch_evaluate(model, *dev))
                for k, v in results.items():
                    series.setdefault(k, []).append(v)
                metric = results["eval_accuracy"]
                if best is None or metric > best + DELTA:
                    best, cnt = metric, 0
                    best_state = copy.deepcopy(model.state_dict())
                    best_metrics = {f"best_{k}": v for k, v in
                                    {**results, "epoch": epoch + 1,
                                     "step": (step + 1) // EVAL_STEPS}.items()}
                else:
                    cnt += 1
                if cnt >= PATIENCE:
                    stop = True
                    break
            step += 1
    if best_state is not None:
        model.load_state_dict(best_state)
    return series, best_metrics, _torch_evaluate(model, *test)


def test_full_recipe_matches_torch(tmp_path):
    text = tiny_text_config(hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
    cfg = VaultConfig(vilt=tiny_vilt_config(), text_tower=text)

    hf_bert = make_hf_bert(cfg.text_tower, seed=0)
    hf_vilt = make_hf_vilt(cfg.vilt, seed=1)
    hf_vilt.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"
    model = TorchVault(hf_bert, hf_vilt, cfg.vilt.hidden_size, N_CLASSES)

    # identical start: converted towers + the SAME fresh classifier head.
    # Deep-copy: converted jax leaves can alias live torch tensor memory on
    # CPU, and both torch's in-place AdamW and our donated train step would
    # otherwise corrupt the other side (gotcha from the 12-step test).
    params = jax.tree.map(lambda x: np.array(x, copy=True), {
        "bert": bert_params_from_torch(hf_bert.state_dict(), cfg.text_tower),
        "vilt": vilt_params_from_torch(hf_vilt.state_dict(),
                                       cfg.resolved_vilt()),
        "head": {"out": {
            "w": jnp.asarray(model.classifier.weight.detach().numpy().T),
            "b": jnp.asarray(model.classifier.bias.detach().numpy()),
        }},
    })

    rng = np.random.default_rng(3)
    train = _synth(rng, N_TRAIN, text.vocab_size, cfg.vilt.vocab_size)
    dev = _synth(rng, N_DEV, text.vocab_size, cfg.vilt.vocab_size)
    test = _synth(rng, N_TEST, text.vocab_size, cfg.vilt.vocab_size)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(p, cfg, batch, head_dropout=0.0,
                                        deterministic=True)

    args = TrainArgs(lr=LR, train_batch_size=BATCH, eval_batch_size=BATCH,
                     num_train_epochs=EPOCHS, eval_steps=EVAL_STEPS,
                     warmup_ratio=WARMUP_RATIO, correct_bias=True,
                     early_stopping_patience=PATIENCE,
                     early_stopping_delta=DELTA, seed=SEED,
                     disable_tqdm=True, prefetch_batches=0)
    handler = ExperimentHandler(str(tmp_path), "recipe")
    trainer = Trainer(apply_fn, params, args, InMemoryDataset(*train),
                      dev_dataset=InMemoryDataset(*dev),
                      test_dataset=InMemoryDataset(*test),
                      exp_handler=handler)
    trainer.train()
    ours_series = {k: list(v) for k, v in handler._series.items()}
    ours_finals = dict(handler._finals)

    theirs_series, theirs_best, theirs_test = _torch_full_recipe(
        model, train, dev, test)

    # same windows observed => same early-stop decision point
    assert set(theirs_series) <= set(ours_series)
    for k in theirs_series:
        assert len(ours_series[k]) == len(theirs_series[k]), (
            k, ours_series[k], theirs_series[k])

    # the early-stopping path itself was exercised (not just ran to the end)
    assert len(ours_series["train_loss"]) < EPOCHS * 2, ours_series

    # loss curves: fp32 drift compounds across joint fwd+bwd+update steps
    np.testing.assert_allclose(ours_series["train_loss"],
                               theirs_series["train_loss"], atol=5e-3)
    np.testing.assert_allclose(ours_series["eval_loss"],
                               theirs_series["eval_loss"], atol=5e-3)
    # metric curves: tolerate at most one argmax flip on the 20-example dev
    np.testing.assert_allclose(ours_series["eval_accuracy"],
                               theirs_series["eval_accuracy"], atol=0.051)
    np.testing.assert_allclose(ours_series["macro_f1_score"],
                               theirs_series["macro_f1_score"], atol=0.1)

    # early-stopping bookkeeping: same best window, same best metrics
    assert ours_finals["best_step"] == theirs_best["best_step"]
    np.testing.assert_allclose(ours_finals["best_eval_accuracy"],
                               theirs_best["best_eval_accuracy"], atol=0.051)
    np.testing.assert_allclose(ours_finals["best_eval_loss"],
                               theirs_best["best_eval_loss"], atol=5e-3)

    # test eval ran on the RESTORED best weights on both sides
    np.testing.assert_allclose(ours_finals["test_eval_loss"],
                               theirs_test["eval_loss"], atol=5e-3)
    np.testing.assert_allclose(ours_finals["test_eval_accuracy"],
                               theirs_test["eval_accuracy"], atol=0.051)
