"""Retrieval + VQA trainer paths end-to-end on tiny synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.loader import InMemoryDataset
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.data.retrieval import RetrievalDataset
from vault_tpu.models.vault import (
    init_rank_head,
    init_vault,
    init_vqa_head,
    renew_vqa_classifier,
    vault_for_retrieval,
    vault_for_vqa,
)
from vault_tpu.text.wordpiece import WordPieceTokenizer
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.task_trainers import RetrievalTrainer, VqaTrainer
from vault_tpu.training.trainer import TrainArgs

VOCAB = {t: i for i, t in enumerate(
    "[PAD] [UNK] [CLS] [SEP] [MASK] a cat dog bird red blue green".split())}


def _cfg():
    return VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=8),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )


def _processor():
    return VaultProcessor(WordPieceTokenizer(VOCAB), max_length=8,
                          canvas=(32, 32))


@pytest.mark.slow
def test_retrieval_trainer_end_to_end(tmp_path):
    cfg = _cfg()
    n = 6
    paths = []
    for i in range(n):
        p = tmp_path / f"{i}.jpg"
        Image.new("RGB", (40, 40), (i * 40 % 255, 30, 200)).save(p)
        paths.append(str(p))
    words = ["cat", "dog", "bird", "red", "blue", "green"]
    texts = [f"a {words[i]}" for i in range(n)]
    ds = RetrievalDataset(list(range(n)), texts, paths, _processor(),
                          negatives_per_positive=1)

    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["rank"] = init_rank_head(jax.random.PRNGKey(1), cfg.vilt)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_retrieval(p, cfg, batch, deterministic=deterministic,
                                   rng=rng)

    args = TrainArgs(lr=1e-3, train_batch_size=4, eval_batch_size=6,
                     num_train_epochs=1, max_steps=2)
    tr = RetrievalTrainer(apply_fn, params, args, ds,
                          exp_handler=ExperimentHandler(str(tmp_path), "ret"))
    tr.train()
    results = tr.evaluate(ds)
    for key in ("image-R@1", "image-R@5", "image-R@10",
                "text-R@1", "text-R@5", "text-R@10", "eval_loss"):
        assert key in results, key
        assert 0.0 <= results[key] <= 1.0 or key == "eval_loss"
    # R@10 over 6 candidates must be 1 (the true match is always in top 10)
    assert results["image-R@10"] == 1.0


@pytest.mark.slow
def test_vqa_trainer_and_head(tmp_path):
    cfg = _cfg()
    rng = np.random.default_rng(0)
    n, n_answers = 12, 5
    feats = {
        "input_ids": rng.integers(0, len(VOCAB), (n, 8)).astype(np.int32),
        "attention_mask": np.ones((n, 8), np.int32),
        "token_type_ids": np.zeros((n, 8), np.int32),
        "pixel_values": rng.normal(size=(n, 3, 32, 32)).astype(np.float32),
        "pixel_mask": np.ones((n, 32, 32), np.int32),
    }
    # soft answer scores
    labels = rng.uniform(size=(n, n_answers)).astype(np.float32)
    labels = (labels > 0.7).astype(np.float32)
    ds = InMemoryDataset(feats, labels)

    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["vqa"] = init_vqa_head(jax.random.PRNGKey(1), cfg.vilt, n_answers)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_vqa(p, cfg, batch, deterministic=deterministic, rng=rng)

    args = TrainArgs(lr=1e-3, train_batch_size=4, eval_batch_size=4,
                     num_train_epochs=1)
    tr = VqaTrainer(apply_fn, params, args, ds, dev_dataset=ds,
                    exp_handler=ExperimentHandler(str(tmp_path), "vqa"))
    tr.train()
    res = tr.evaluate(ds)
    assert "eval_accuracy" in res and 0.0 <= res["eval_accuracy"] <= 1.0


def test_renew_vqa_classifier():
    cfg = _cfg()
    head = init_vqa_head(jax.random.PRNGKey(0), cfg.vilt, 5)
    new = renew_vqa_classifier(jax.random.PRNGKey(1), head, 9)
    assert new["out"]["w"].shape[1] == 9
    assert float(jnp.abs(new["out"]["b"]).sum()) == 0.0
    # other layers untouched
    np.testing.assert_allclose(np.asarray(new["in"]["w"]),
                               np.asarray(head["in"]["w"]))


def test_vqa_dataset_loading(tmp_path):
    import json
    from PIL import Image
    from vault_tpu.data.vqa_dataset import VqaDataset

    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    for i in (1, 2):
        Image.new("RGB", (48, 48), (i * 60, 90, 30)).save(img_dir / f"{i}.jpg")
    (tmp_path / "q.json").write_text(json.dumps({"questions": [
        {"question_id": 10, "image_id": 1, "question": "a cat"},
        {"question_id": 11, "image_id": 2, "question": "a dog"},
    ]}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": [
        {"question_id": 10, "image_id": 1,
         "answers": [{"answer": "Two"}] * 4 + [{"answer": "three"}] * 6},
        {"question_id": 11, "image_id": 2,
         "answers": [{"answer": "the dog"}] * 10},
    ]}))
    ds = VqaDataset(str(tmp_path / "q.json"), str(tmp_path / "a.json"),
                    str(img_dir), _processor(), max_length=8)
    assert ds.num_examples == 2
    # normalized vocabulary: "2", "three"->"3", "dog" (article stripped)
    assert set(ds.label2id) == {"2", "3", "dog"}
    (f, l), = list(ds.batches(4))
    assert f["pixel_values"].shape[0] == 2
    row0 = l[0]
    assert abs(row0[ds.label2id["3"]] - 1.0) < 1e-6      # 6/3 capped at 1
    assert abs(row0[ds.label2id["2"]] - 1.0) < 1e-6      # 4/3 capped at 1
    assert l[1][ds.label2id["dog"]] == 1.0


def test_lazy_dataset_protocol():
    from vault_tpu.data.loader import LazyDataset

    calls = []

    def encode(ids, train):
        calls.append(list(ids))
        return ({"x": np.asarray(ids, np.float32)[:, None]},
                np.zeros(len(ids), np.int32))

    ds = LazyDataset(encode, num=5)
    out = list(ds.batches(2))
    assert len(out) == 3 and len(calls) == 3
    assert ds.num_batches(2) == 3
