"""NLVR2 dataset + images-and-text trainer end-to-end."""

import pytest
import json

import numpy as np
import jax
from PIL import Image

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.nlvr2 import Nlvr2Dataset
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.models.vault import (
    init_pair_head,
    init_vault,
    resize_modality_type_embeddings,
    vault_for_images_and_text,
)
from vault_tpu.text.wordpiece import WordPieceTokenizer
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.task_trainers import ImagesAndTextTrainer
from vault_tpu.training.trainer import TrainArgs

VOCAB = {t: i for i, t in enumerate(
    "[PAD] [UNK] [CLS] [SEP] [MASK] the left image has more dogs".split())}


def _make_data(tmp_path, n=6):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    recs = []
    for i in range(n):
        ident = f"dev-{i}-0-0"
        for s in (0, 1):
            Image.new("RGB", (40, 40), (i * 30, 80, 10 + s * 100)).save(
                img_dir / f"dev-{i}-0-img{s}.png")
        recs.append({"identifier": ident,
                     "sentence": "the left image has more dogs",
                     "label": "True" if i % 2 == 0 else "False"})
    jsonl = tmp_path / "dev.jsonl"
    jsonl.write_text("\n".join(json.dumps(r) for r in recs))
    return str(jsonl), str(img_dir)


@pytest.mark.slow
def test_nlvr2_dataset_and_trainer(tmp_path):
    jsonl, img_dir = _make_data(tmp_path)
    proc = VaultProcessor(WordPieceTokenizer(VOCAB), max_length=10,
                          canvas=(32, 32))
    ds = Nlvr2Dataset(jsonl, img_dir, proc, max_length=10)
    assert ds.num_examples == 6
    (f, l), *_ = list(ds.batches(4))
    assert f["pixel_values"].shape[1:] == (2, 3, 32, 32)
    assert f["pixel_mask"].shape[1:] == (2, 32, 32)
    assert set(l.tolist()) <= {0, 1}

    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4,
                              modality_type_vocab_size=3),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["vilt"] = resize_modality_type_embeddings(params["vilt"], 2)
    params["pair"] = init_pair_head(jax.random.PRNGKey(1), cfg.vilt, 2, 2)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_images_and_text(p, cfg, batch,
                                         deterministic=deterministic, rng=rng)

    args = TrainArgs(lr=1e-3, train_batch_size=4, eval_batch_size=4,
                     num_train_epochs=1)
    tr = ImagesAndTextTrainer(apply_fn, params, args, ds, dev_dataset=ds,
                              exp_handler=ExperimentHandler(str(tmp_path), "nl"))
    tr.train()
    res = tr.evaluate(ds)
    assert "eval_accuracy" in res
