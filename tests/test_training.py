"""Training-stack tests: HF-AdamW semantics, schedule parity, metric parity
with sklearn, end-to-end loss descent on the tiny VAuLT model, DP-mesh
equivalence, early stopping + experiment-log layout, checkpoint round-trip.
(SURVEY.md §4 proposed strategy items (d) and (e).)"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.parallel.mesh import make_mesh
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.losses import bce_with_logits, softmax_cross_entropy
from vault_tpu.training.metrics import accuracy, precision_recall_fscore
from vault_tpu.training.optimizer import hf_adamw, linear_warmup_linear_decay
from vault_tpu.training.trainer import TrainArgs, Trainer
from vault_tpu.data.loader import InMemoryDataset


# ---------------------------------------------------------------- optimizer

def test_hf_adamw_matches_torch_adamw_correct_bias():
    # With correct_bias=True and weight_decay=0, HF AdamW == torch.optim.AdamW.
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.0)
    params = {"w": jnp.asarray(w0)}
    tx = hf_adamw(1e-2, 0.9, 0.999, 1e-8, 0.0, correct_bias=True)
    state = tx.init(params)
    for i in range(5):
        g = np.random.default_rng(i + 10).normal(size=(4, 3)).astype(np.float32)
        tp.grad = torch.tensor(g)
        topt.step()
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + upd["w"]}
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               atol=1e-6)


def test_hf_adamw_no_bias_correction():
    # correct_bias=False (the reference's default): first step must be
    # -lr * m / (sqrt(v) + eps) with NO bias-correction rescale.
    params = {"w": jnp.zeros((2,))}
    tx = hf_adamw(0.1, 0.9, 0.999, 1e-8, 0.0, correct_bias=False)
    state = tx.init(params)
    g = jnp.array([1.0, -1.0])
    upd, _ = tx.update({"w": g}, state, params)
    m = 0.1 * np.asarray(g)
    v = 0.001 * np.asarray(g) ** 2
    expected = -0.1 * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(upd["w"]), expected, rtol=1e-5)


def test_schedule_matches_hf():
    from transformers import get_linear_schedule_with_warmup

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = get_linear_schedule_with_warmup(opt, num_warmup_steps=4,
                                            num_training_steps=20)
    ours = linear_warmup_linear_decay(1.0, 4, 20)
    for step in range(20):
        lr_ref = opt.param_groups[0]["lr"]
        assert abs(float(ours(step)) - lr_ref) < 1e-6, step
        opt.step()
        sched.step()


# ------------------------------------------------------------------ metrics

def test_metrics_match_sklearn():
    from sklearn.metrics import precision_recall_fscore_support

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 4, 200)
    y_pred = rng.integers(0, 4, 200)
    for avg in ("macro", "micro", "weighted"):
        ref = precision_recall_fscore_support(y_true, y_pred, average=avg,
                                              zero_division=0)[:3]
        ours = precision_recall_fscore(y_true, y_pred, avg)
        np.testing.assert_allclose(ours, ref, atol=1e-12)
    assert accuracy(y_true, y_pred) == np.mean(y_true == y_pred)


# ------------------------------------------------------------------- losses

def test_ce_matches_torch():
    logits = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 3, 8)
    ref = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels))
    ours = softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    assert abs(float(ours) - float(ref)) < 1e-6


def test_bce_matches_torch():
    logits = np.random.default_rng(0).normal(size=(8, 1)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 2, (8, 1)).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(labels))
    ours = bce_with_logits(jnp.asarray(logits), jnp.asarray(labels))
    assert abs(float(ours) - float(ref)) < 1e-6


def test_weighted_loss_ignores_padding():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    labels = jnp.array([0, 1, 2, 0])
    full = softmax_cross_entropy(logits[:2], labels[:2])
    weighted = softmax_cross_entropy(logits, labels,
                                     weight=jnp.array([1.0, 1.0, 0.0, 0.0]))
    assert abs(float(full) - float(weighted)) < 1e-6


# ------------------------------------------------- end-to-end training slice

def _toy_setup(n=48, seed=0):
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=8),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    rng = np.random.default_rng(seed)
    n_classes = 3
    labels = rng.integers(0, n_classes, n)
    # make the task learnable: class determines the first token id
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
                                          cfg.vilt.hidden_size, n_classes)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(p, cfg, batch, head_dropout=0.1,
                                        deterministic=deterministic, rng=rng)

    return cfg, params, apply_fn, feats, labels


def test_train_descends_and_logs(tmp_path):
    cfg, params, apply_fn, feats, labels = _toy_setup()
    ds = InMemoryDataset(feats, labels, name="toy(train)")
    args = TrainArgs(lr=5e-3, train_batch_size=16, eval_batch_size=16,
                     num_train_epochs=6, early_stopping_patience=None, seed=0)
    handler = ExperimentHandler(str(tmp_path), "ToyExp")
    handler.set_params({"lr": args.lr, "dataset": "toy(train,dev)"})
    handler.set_name_params(["dataset"])
    trainer = Trainer(apply_fn, params, args, ds, dev_dataset=ds,
                      test_dataset=ds, exp_handler=handler)
    trainer.train()

    losses = handler._series["train_loss"]
    assert losses[-1] < losses[0] * 0.7, losses
    assert handler._series["eval_accuracy"][-1] > 0.6

    d = handler.directory()
    assert os.path.basename(d) == "toy(train;dev)_0"  # sanitized "," -> ";"
    for fname in ("metrics.yml", "params.yml", "aggregated_metrics.yml", "obj.pkl"):
        assert os.path.exists(os.path.join(d, fname)), fname
    assert os.path.exists(os.path.join(d, "plots", "train_loss.png"))
    assert "test_eval_accuracy" in handler._finals


@pytest.mark.slow
def test_dp_mesh_matches_single_device():
    cfg, params, apply_fn, feats, labels = _toy_setup()
    ds = InMemoryDataset(feats, labels)
    results = {}
    for shards in (1, 8):
        p = jax.device_get(params)
        args = TrainArgs(lr=1e-3, train_batch_size=16, num_train_epochs=1,
                         num_data_shards=shards, seed=0)
        tr = Trainer(apply_fn, jax.tree.map(jnp.asarray, p), args,
                     InMemoryDataset(feats, labels), exp_handler=ExperimentHandler("/tmp/dp_test", f"s{shards}"))
        tr._build_steps(3)
        batch = {k: v[:16] for k, v in feats.items()}
        b, l, w = tr._pad(batch, labels[:16])
        from vault_tpu.parallel.mesh import shard_batch
        newp, _, loss_acc = tr._train_step(tr.params, tr.opt_state,
                                           jnp.zeros((2,), jnp.float32),
                                           shard_batch(tr.mesh, b),
                                           shard_batch(tr.mesh, l),
                                           shard_batch(tr.mesh, w),
                                           jax.random.PRNGKey(1))
        results[shards] = (float(loss_acc[0]) / 16, jax.device_get(newp))
    assert abs(results[1][0] - results[8][0]) < 1e-5
    flat1 = jax.tree.leaves(results[1][1])
    flat8 = jax.tree.leaves(results[8][1])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_uneven_batch_padding():
    cfg, params, apply_fn, feats, labels = _toy_setup(n=19)  # 19 % 8 != 0
    ds = InMemoryDataset(feats, labels)
    args = TrainArgs(lr=1e-3, train_batch_size=8, num_train_epochs=1,
                     num_data_shards=8, seed=0)
    tr = Trainer(apply_fn, params, args, ds, dev_dataset=ds,
                 exp_handler=ExperimentHandler("/tmp/pad_test", "x"))
    tr.train()  # must not crash on the 3-example final batch


def test_early_stopping_restores_best(tmp_path):
    from vault_tpu.training.trainer import EarlyStopping

    es = EarlyStopping(patience=2, higher_better=True)
    assert not es.step(0.5, params={"w": jnp.ones(2)}, step=1)
    assert not es.step(0.4, params={"w": jnp.zeros(2)}, step=2)
    assert es.step(0.3, params={"w": jnp.zeros(2)}, step=3)  # patience hit
    assert es.best == 0.5
    np.testing.assert_allclose(es.best_params["w"], np.ones(2))
    assert es.get_metrics()["best_step"] == 1


def test_adamw_bf16_state_tracks_fp32():
    """Reduced-precision m/v (state_dtype=bfloat16) must track the fp32
    optimizer closely: same descent direction, small param divergence."""
    from vault_tpu.training.optimizer import hf_adamw

    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8)}

    def loss(p):
        return jnp.sum((p["w"] @ p["w"] - jnp.eye(8)) ** 2)

    trajs = {}
    for dt in (None, jnp.bfloat16):
        tx = hf_adamw(1e-2, state_dtype=dt)
        p, s = params, tx.init(params)
        for _ in range(20):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            p = jax.tree.map(lambda a, b: a + b, p, u)
        trajs[dt is None] = (p, s)
    np.testing.assert_allclose(trajs[True][0]["w"], trajs[False][0]["w"],
                               atol=5e-3)
    assert trajs[False][1].mu["w"].dtype == jnp.bfloat16
    assert loss(trajs[False][0]) < loss(params)


@pytest.mark.slow
def test_remat_modes_same_grads():
    """remat=False / True / "dots" are pure memory/FLOP tradeoffs — the
    gradients must be identical."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    batch = {k: jnp.asarray(v[:8]) for k, v in feats.items()}
    y = jnp.asarray(labels[:8])

    def loss_with(remat):
        from vault_tpu.models.vault import vault_for_classification

        def f(p):
            logits = vault_for_classification(p, cfg, batch, head_dropout=0.0,
                                              deterministic=True, remat=remat)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

        return jax.jit(jax.grad(f))(params)

    g_none = loss_with(False)
    for mode in (True, "dots"):
        g = loss_with(mode)
        for a, b in zip(jax.tree.leaves(g_none), jax.tree.leaves(g)):
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_early_stopping_delta():
    """delta = minimum improvement to count as a new best (reference
    EarlyStopping `delta`, vault/train_utils.py:13-171)."""
    from vault_tpu.training.trainer import EarlyStopping

    es = EarlyStopping(patience=2, delta=0.05, higher_better=True)
    assert not es.step(0.50, step=1)
    assert not es.step(0.54, step=2)   # +0.04 < delta: patience 1, not a best
    assert es.best == 0.50
    assert es.step(0.54, step=3)       # patience 2 -> stop
    # and the knob is exposed on TrainArgs (wired to the trainer's instance)
    args = TrainArgs(early_stopping_patience=2, early_stopping_delta=0.05)
    assert args.early_stopping_delta == 0.05


def test_checkpoint_roundtrip(tmp_path):
    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "c": np.ones(4)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    zero = jax.tree.map(np.zeros_like, tree)
    out = restore_checkpoint(path, zero)
    np.testing.assert_allclose(out["a"]["b"], tree["a"]["b"])


def test_experiment_aggregation(tmp_path):
    for rep in range(3):
        h = ExperimentHandler(str(tmp_path), "Agg")
        h.set_params({"lr": 1.0, "ds": "d"})
        h.set_name_params(["ds"])
        h.set_dict_metrics({"train_loss": 1.0 - 0.1 * rep})
        h.set_dict_metrics({"eval_accuracy": 0.7 + 0.01 * rep}, test=True)
        h.log()
        h.aggregate_results()
    import yaml
    d = h.directory()
    with open(os.path.join(d, "metrics.yml")) as f:
        runs = yaml.safe_load(f)
    assert set(runs) == {"experiment_0", "experiment_1", "experiment_2"}
    with open(os.path.join(d, "aggregated_metrics.yml")) as f:
        agg = yaml.safe_load(f)
    assert "test_eval_accuracy" in agg[""]
    mean = float(agg[""]["test_eval_accuracy"].split("+-")[0])
    assert abs(mean - 0.71) < 1e-6


def test_orbax_checkpoint_roundtrip(tmp_path):
    from vault_tpu.training.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "c": np.ones(4, np.float32)}
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, tree)
    out = restore_checkpoint_orbax(path, jax.tree.map(np.zeros_like, tree))
    np.testing.assert_allclose(out["a"]["b"], tree["a"]["b"])


def test_discard_classifier_warm_start(tmp_path):
    from vault_tpu.training.checkpoint import save_checkpoint

    cfg, params, apply_fn, feats, labels = _toy_setup(n=8)
    ds = InMemoryDataset(feats, labels)
    # checkpoint with a head trained elsewhere
    old = jax.device_get(params)
    ckpt = str(tmp_path / "warm")
    save_checkpoint(ckpt, {k: v for k, v in old.items() if k != "head"})

    args = TrainArgs(model_load_filename=ckpt, discard_classifier=True,
                     num_train_epochs=1, max_steps=0, train_batch_size=8)
    tr = Trainer(apply_fn, params, args, ds,
                 exp_handler=ExperimentHandler(str(tmp_path), "warm"))
    tr.load_weights(ckpt)
    restored = jax.device_get(tr.params)
    np.testing.assert_allclose(
        np.asarray(restored["vilt"]["cls_token"]),
        np.asarray(old["vilt"]["cls_token"]))
    assert "head" in restored  # fresh head kept


@pytest.mark.slow
def test_mixed_precision_training_descends():
    cfg, params, apply_fn, feats, labels = _toy_setup(n=32)
    ds = InMemoryDataset(feats, labels)
    args = TrainArgs(lr=5e-3, train_batch_size=16, num_train_epochs=4,
                     compute_dtype="bfloat16", seed=0)
    h = ExperimentHandler("/tmp/mp_test", "mp")
    tr = Trainer(apply_fn, params, args, ds, exp_handler=h)
    tr.train()
    losses = h._series["train_loss"]
    assert losses[-1] < losses[0], losses
    # master weights stayed fp32
    assert jax.tree.leaves(tr.params)[0].dtype == jnp.float32


def test_experiment_parent_params(tmp_path):
    h = ExperimentHandler(str(tmp_path), "Par")
    h.set_param("use_feature", False)
    h.set_param("feature_strength", 3, parent="use_feature")
    h.set_param("lr", 0.1)
    assert "feature_strength" not in h.effective_params()
    h2 = ExperimentHandler(str(tmp_path), "Par")
    h2.set_param("use_feature", True)
    h2.set_param("feature_strength", 3, parent="use_feature")
    h2.set_param("lr", 0.1)
    assert h2.effective_params()["feature_strength"] == 3


def test_hf_adamw_weight_decay_semantics():
    # decoupled decay with the SCHEDULED lr, applied after the adam step
    # (HF AdamW behavior the reference relies on)
    lr = 0.1
    wd = 0.01
    params = {"w": jnp.ones((2,))}
    tx = hf_adamw(lr, 0.9, 0.999, 1e-8, weight_decay=wd, correct_bias=False)
    state = tx.init(params)
    g = jnp.array([1.0, -1.0])
    upd, _ = tx.update({"w": g}, state, params)
    m = 0.1 * np.asarray(g); v = 0.001 * np.asarray(g) ** 2
    expected = -lr * m / (np.sqrt(v) + 1e-8) - lr * wd * np.ones(2)
    np.testing.assert_allclose(np.asarray(upd["w"]), expected, rtol=1e-5)


@pytest.mark.slow
def test_grad_accumulation_matches_single_step():
    cfg, params, apply_fn, feats, labels = _toy_setup(n=16)
    ds = InMemoryDataset(feats, labels)
    results = {}
    for accum in (1, 4):
        # fp32 moments: this test isolates the accumulation math at 3e-6;
        # the bf16-state default would quantize the two paths' ~1e-7
        # order-of-summation grad differences to different bf16 ulps
        args = TrainArgs(lr=1e-3, train_batch_size=16, num_train_epochs=1,
                         max_steps=1, grad_accum_steps=accum, seed=0,
                         prefetch_batches=0, opt_state_dtype="float32")
        # dropout rngs differ between the two paths; disable via deterministic
        def det_apply(p, batch, deterministic, rng):
            return apply_fn(p, batch, True, None)
        tr = Trainer(det_apply, jax.device_get(params), args, ds,
                     exp_handler=ExperimentHandler("/tmp/ga", f"a{accum}"))
        tr.train()
        results[accum] = jax.device_get(tr.params)
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[4])):
        np.testing.assert_allclose(a, b, atol=3e-6)


def test_load_reference_obj_pkl(tmp_path):
    """load_existent must read a reference-written obj.pkl — the reference
    pickles its ENTIRE handler instance (vault/logging_utils.py:481-483)
    whose class doesn't exist here."""
    import pickle
    import sys
    import types

    # fabricate "the reference's" module + class, pickle an instance
    mod = types.ModuleType("vault.logging_utils")

    class RefHandler:
        pass

    RefHandler.__module__ = "vault.logging_utils"
    RefHandler.__qualname__ = "ExperimentHandler"
    mod.ExperimentHandler = RefHandler
    sys.modules["vault"] = types.ModuleType("vault")
    sys.modules["vault.logging_utils"] = mod
    try:
        ref = RefHandler()
        ref.__dict__.update(
            _directory="./experiment_logs",
            _experiment_name="MVSA",
            _description="",
            _param_dict={"model_name": "vault", "lr": 2e-5},
            _disabled_params={"root_dir"},
            _name_params=["model_name"],
            _metric_dict={"eval_accuracy": [0.5, 0.7, 0.66]},
            _best_metric_dict={"best_eval_accuracy": 0.7},
            _test_metric_dict={"accuracy": 0.68},
            _parent_param_dict={},
        )
        d = tmp_path / "MVSA" / "vault_0"
        d.mkdir(parents=True)
        with open(d / "obj.pkl", "wb") as f:
            pickle.dump(ref, f)
    finally:
        del sys.modules["vault.logging_utils"], sys.modules["vault"]

    from vault_tpu.training.experiment import ExperimentHandler

    h = ExperimentHandler.load_existent(str(d))
    assert h._params["model_name"] == "vault"
    assert h._name_params == ["model_name"]
    assert "root_dir" in h._disabled
    assert h._series["eval_accuracy"] == [0.5, 0.7, 0.66]
    assert h._finals["best_eval_accuracy"] == 0.7
    assert h._finals["test_accuracy"] == 0.68
    # our own snapshot still round-trips through the same entry point
    h.log()
    h2 = ExperimentHandler.load_existent(str(d))
    assert h2._series == h._series and h2._finals == h._finals


@pytest.mark.slow
def test_zero_opt_sharding_matches_replicated():
    """ZeRO-1 (parallel/zero.py): AdamW m/v sharded 1/N over the data axis —
    update results must match the replicated-optimizer step exactly, and the
    moment leaves must actually BE sharded (and stay sharded across donated
    steps)."""
    from jax.sharding import PartitionSpec as P

    cfg, params, apply_fn, feats, labels = _toy_setup()
    results = {}
    for zero in (False, True):
        p = jax.device_get(params)
        args = TrainArgs(lr=1e-3, train_batch_size=16, num_train_epochs=1,
                         num_data_shards=8, seed=0, zero_opt=zero)
        tr = Trainer(apply_fn, jax.tree.map(jnp.asarray, p), args,
                     InMemoryDataset(feats, labels),
                     exp_handler=ExperimentHandler("/tmp/zero_test",
                                                   f"z{zero}"))
        tr._build_steps(3)
        batch = {k: v[:16] for k, v in feats.items()}
        b, l, w = tr._pad(batch, labels[:16])
        from vault_tpu.parallel.mesh import shard_batch
        newp, new_opt, loss_acc = tr._train_step(
            tr.params, tr.opt_state, jnp.zeros((2,), jnp.float32),
            shard_batch(tr.mesh, b), shard_batch(tr.mesh, l),
            shard_batch(tr.mesh, w), jax.random.PRNGKey(1))
        if zero:
            # at least one moment leaf is genuinely split over "data",
            # and the OUTPUT opt state keeps that sharding
            specs = [x.sharding.spec for x in jax.tree.leaves(new_opt)
                     if hasattr(x, "sharding") and np.ndim(x) > 0]
            assert any("data" in (s or ()) for spec in specs
                       for s in [tuple(spec)]), specs
        results[zero] = (float(loss_acc[0]), jax.device_get(newp),
                         jax.device_get(new_opt))
    assert abs(results[False][0] - results[True][0]) < 1e-6
    for a, b in zip(jax.tree.leaves(results[False][1]),
                    jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(a, b, atol=2e-6)
    for a, b in zip(jax.tree.leaves(results[False][2]),
                    jax.tree.leaves(results[True][2])):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_zero_leaf_spec():
    from jax.sharding import PartitionSpec as P

    from vault_tpu.parallel.zero import _leaf_spec

    assert _leaf_spec((), 8) == P()                      # scalar count
    assert _leaf_spec((30522, 64), 8) == P(None, "data")  # 64 % 8 == 0
    assert _leaf_spec((16, 64), 8) == P(None, "data")     # largest divisible
    assert _leaf_spec((7,), 8) == P()                     # nothing divides
    assert _leaf_spec((8, 8), 8) == P("data", None)       # tie -> first


def test_adamw_int8_state_tracks_fp32():
    """Blockwise int8 m/v ("8-bit Adam": absmax-per-256-block codes, second
    moment stored as sqrt(v)) must track the fp32 optimizer: same descent,
    bounded param divergence, and a quartered state footprint."""
    from vault_tpu.training.optimizer import Q8Moment, hf_adamw

    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8),
              "b": jnp.linspace(0.5, -0.5, 300)}  # non-multiple of block

    def loss(p):
        return jnp.sum((p["w"] @ p["w"] - jnp.eye(8)) ** 2) + jnp.sum(p["b"] ** 2)

    trajs = {}
    for dt in (None, "int8"):
        tx = hf_adamw(1e-2, state_dtype=dt)
        p, s = params, tx.init(params)
        for _ in range(20):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            p = jax.tree.map(lambda a, b: a + b, p, u)
        trajs[dt is None] = (p, s)
    np.testing.assert_allclose(trajs[True][0]["w"], trajs[False][0]["w"],
                               atol=2e-2)
    q8 = trajs[False][1].mu["w"]
    assert isinstance(q8, Q8Moment) and q8.q.dtype == jnp.int8
    assert loss(trajs[False][0]) < loss(params)
    # checkpoint roundtrip of the quantized state (namedtuple leaves)
    import tempfile

    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(f"{d}/ck", {"opt_state": trajs[False][1]})
        back = restore_checkpoint(f"{d}/ck", {"opt_state": trajs[False][1]})
        np.testing.assert_array_equal(back["opt_state"].mu["w"].q,
                                      np.asarray(q8.q))


@pytest.mark.slow
def test_trainer_with_int8_opt_state():
    """End-to-end Trainer run with opt_state_dtype='int8': loss descends and
    checkpoint/resume keeps working."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        args = TrainArgs(lr=5e-3, train_batch_size=8, num_train_epochs=2,
                         opt_state_dtype="int8")
        tr = Trainer(apply_fn, params, args,
                     InMemoryDataset(feats, labels),
                     exp_handler=ExperimentHandler(d, "int8opt"))
        tr.train()
        from vault_tpu.training.optimizer import Q8Moment

        mu_leaf = jax.tree.leaves(
            tr.opt_state.mu,
            is_leaf=lambda x: isinstance(x, Q8Moment))[0]
        assert isinstance(mu_leaf, Q8Moment)
        assert int(tr.opt_state.count) > 0


@pytest.mark.slow
def test_trainer_with_rbg_rng():
    """rng_impl='rbg' (TPU hardware-friendly dropout PRNG, measured 467 vs
    441 pairs/s at full geometry) runs the full loop and trains."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        args = TrainArgs(lr=5e-3, train_batch_size=8, num_train_epochs=1,
                         rng_impl="rbg")
        tr = Trainer(apply_fn, params, args,
                     InMemoryDataset(feats, labels),
                     exp_handler=ExperimentHandler(d, "rbg"))
        tr.train()
        assert int(tr.opt_state.count) > 0


def test_adamw_bf16_grads_track_fp32():
    """bf16 grad buffers (TrainArgs grad_dtype) must track fp32 grads
    closely: fp32 update math inside the optimizer either way, so the only
    difference is the one rounding of each grad leaf."""
    from vault_tpu.training.optimizer import hf_adamw

    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8)}

    def loss(p):
        return jnp.sum((p["w"] @ p["w"] - jnp.eye(8)) ** 2)

    trajs = {}
    for bf16_grads in (False, True):
        tx = hf_adamw(1e-2)
        p, s = params, tx.init(params)
        for _ in range(20):
            g = jax.grad(loss)(p)
            if bf16_grads:
                g = jax.tree.map(lambda x: x.astype(jnp.bfloat16), g)
            u, s = tx.update(g, s, p)
            assert u["w"].dtype == jnp.float32  # updates stay master dtype
            p = jax.tree.map(lambda a, b: a + b, p, u)
        trajs[bf16_grads] = (p, s)
    np.testing.assert_allclose(trajs[True][0]["w"], trajs[False][0]["w"],
                               atol=5e-3)
    assert trajs[True][1].mu["w"].dtype == jnp.float32  # moments stay fp32
    assert loss(trajs[True][0]) < loss(params)


@pytest.mark.slow
def test_trainer_grad_dtype_bf16_descends(tmp_path):
    """End-to-end Trainer run with grad_dtype=bfloat16: loss must descend."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    ds = InMemoryDataset(feats, labels)
    targs = TrainArgs(lr=5e-4, train_batch_size=8, eval_batch_size=8,
                      num_train_epochs=4, grad_dtype="bfloat16",
                      disable_tqdm=True)
    handler = ExperimentHandler(str(tmp_path), "GradDtype")
    tr = Trainer(apply_fn, params, targs, ds, dev_dataset=ds,
                 exp_handler=handler)
    tr.train()
    m = handler._series["train_loss"]
    assert m[-1] < m[0]


@pytest.mark.slow
def test_trainer_profile_dir_writes_trace(tmp_path):
    """--profile_dir traces the second eval window (SURVEY.md §5 tracing —
    absent in the reference); the trace directory must contain a plugins/
    profile dump afterwards."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    ds = InMemoryDataset(feats, labels)
    prof = str(tmp_path / "trace")
    targs = TrainArgs(lr=5e-4, train_batch_size=8, eval_batch_size=8,
                      num_train_epochs=3, profile_dir=prof,
                      disable_tqdm=True)
    handler = ExperimentHandler(str(tmp_path / "logs"), "Prof")
    Trainer(apply_fn, params, targs, ds, exp_handler=handler).train()
    import glob

    dumps = glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert dumps, os.listdir(prof)


@pytest.mark.slow
def test_trainer_combined_throughput_flags_descend(tmp_path):
    """Interaction smoke for the throughput-lever combination: gradient
    accumulation x ZeRO-1 moment sharding x bf16 optimizer state x bf16
    grad buffers in ONE jitted step over the DP mesh — flags that are each
    equivalence-tested alone must also compose."""
    cfg, params, apply_fn, feats, labels = _toy_setup()
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    ds = InMemoryDataset(feats, labels)
    targs = TrainArgs(lr=5e-4, train_batch_size=16, eval_batch_size=16,
                      num_train_epochs=4, grad_accum_steps=2,
                      zero_opt=True, opt_state_dtype="bfloat16",
                      grad_dtype="bfloat16", disable_tqdm=True)
    handler = ExperimentHandler(str(tmp_path), "Combo")
    tr = Trainer(apply_fn, params, targs, ds, dev_dataset=ds,
                 exp_handler=handler)
    tr.train()
    m = handler._series["train_loss"]
    assert m[-1] < m[0], m
    # moments really are bf16 and 1/N-sharded over the data axis
    mu_leaf = jax.tree.leaves(tr.opt_state.mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    assert not mu_leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_grad_accum_partial_final_batch(tmp_path):
    """The final partial batch must pad to a multiple of grad_accum_steps
    (x dp) — previously the micro-batch reshape crashed mid-epoch whenever
    num_examples % train_batch_size wasn't divisible by the accum count."""
    cfg, params, apply_fn, feats, labels = _toy_setup(n=41)  # 41 % 16 = 9
    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    ds = InMemoryDataset(feats, labels)
    targs = TrainArgs(lr=5e-4, train_batch_size=16, eval_batch_size=16,
                      num_train_epochs=2, grad_accum_steps=2,
                      disable_tqdm=True)
    handler = ExperimentHandler(str(tmp_path), "AccumPartial")
    Trainer(apply_fn, params, targs, ds, exp_handler=handler).train()
    assert handler._series["train_loss"]


@pytest.mark.slow
def test_no_early_stopping_keeps_final_params(tmp_path):
    """patience=None must NOT snapshot/restore best weights: a run that
    ends off an eval-window boundary returns the LIVE final params (the
    old per-window snapshot silently rolled the model back to the last
    window and cost a full-tree device_get each window)."""
    from vault_tpu.training.trainer import EarlyStopping

    es = EarlyStopping(patience=None)
    assert not es.step(None, params={"w": jnp.ones(2)})
    assert not es.step(0.1, params={"w": jnp.ones(2)})
    assert es.best_params is None

    cfg, params, apply_fn, feats, labels = _toy_setup(n=32)
    finals = {}
    for max_steps in (2, 3):  # 3 ends one step PAST the eval_steps=2 window
        p = jax.device_get(params)
        args = TrainArgs(lr=5e-3, train_batch_size=16, num_train_epochs=2,
                         eval_steps=2, max_steps=max_steps,
                         early_stopping_patience=None, seed=0)
        tr = Trainer(apply_fn, jax.tree.map(jnp.asarray, p), args,
                     InMemoryDataset(feats, labels),
                     dev_dataset=InMemoryDataset(feats, labels),
                     exp_handler=ExperimentHandler(str(tmp_path),
                                                   f"m{max_steps}"))
        finals[max_steps] = jax.device_get(tr.train())
    diffs = [np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
             for a, b in zip(jax.tree.leaves(finals[2]),
                             jax.tree.leaves(finals[3]))
             if np.asarray(a).dtype.kind in "fV"]
    assert max(diffs) > 0, "step 3's update was discarded by a stale restore"


@pytest.mark.slow
def test_resume_with_changed_eval_cadence(tmp_path):
    """Resuming from a checkpoint written under a different eval_steps (so
    start_step is off the new window grid) must open a fresh loss window,
    not crash the jitted step with a None accumulator."""
    cfg, params, apply_fn, feats, labels = _toy_setup(n=32)
    ck = str(tmp_path / "ck")
    args = TrainArgs(lr=1e-3, train_batch_size=16, num_train_epochs=1,
                     eval_steps=1, checkpoint_dir=ck, seed=0)
    tr = Trainer(apply_fn, params, args, InMemoryDataset(feats, labels),
                 exp_handler=ExperimentHandler(str(tmp_path), "a"))
    tr.train()  # 2 steps; checkpoints at each window boundary

    p2 = init_vault(jax.random.PRNGKey(0), cfg)
    p2["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                      cfg.vilt.hidden_size, 3)
    args2 = TrainArgs(lr=1e-3, train_batch_size=16, num_train_epochs=2,
                      eval_steps=3, checkpoint_dir=ck, resume=True, seed=0)
    tr2 = Trainer(apply_fn, p2, args2, InMemoryDataset(feats, labels),
                  exp_handler=ExperimentHandler(str(tmp_path), "b"))
    final = tr2.train()  # start_step=2, 2 % 3 != 0 — must not crash
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree.leaves(jax.device_get(final)))


def test_eval_loss_mass_weighting():
    """eval_loss must weight each batch's loss by its VALID mass (padding +
    label_weights-zeroed rows excluded): appending invalid rows to a
    dataset must not change its eval_loss."""
    cfg, params, apply_fn, feats, labels = _toy_setup(n=16)
    args = TrainArgs(lr=1e-3, train_batch_size=8, eval_batch_size=8, seed=0)

    tr = Trainer(apply_fn, params, args, InMemoryDataset(feats, labels),
                 exp_handler=ExperimentHandler("/tmp/evmass", "a"))
    loss_a = tr.evaluate(InMemoryDataset(feats, labels))["eval_loss"]

    # interleave an invalid (weight-0, wrong-label) row after each valid one
    idx = np.repeat(np.arange(16), 2)
    feats_b = {k: v[idx] for k, v in feats.items()}
    labels_b = labels[idx]
    labels_b[1::2] = (labels_b[1::2] + 1) % 3  # corrupt the invalid rows
    feats_b["label_weights"] = np.tile([1.0, 0.0], 16).astype(np.float32)
    loss_b = tr.evaluate(InMemoryDataset(feats_b, labels_b))["eval_loss"]
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-5)


def test_bloomberg_multilabel_metrics_match_sklearn():
    """Bloomberg metrics use MULTILABEL semantics like the reference
    (exact-match accuracy + per-column positive-class F1), not a raveled
    class sequence (vault/models/vault/trainer.py:84-91)."""
    import sklearn.metrics as skm

    from vault_tpu.training.task_trainers import BloombergTrainer

    y_true = [[1, 0], [1, 1], [0, 0], [0, 1]]
    y_pred = [[1, 1], [1, 1], [0, 0], [1, 1]]
    res = BloombergTrainer.evaluation_metrics(None, y_true, y_pred)
    np.testing.assert_allclose(
        res["eval_accuracy"], skm.accuracy_score(y_true, y_pred))
    np.testing.assert_allclose(
        res["f1_score"],
        skm.f1_score(y_true, y_pred, average="weighted", zero_division=0))
    np.testing.assert_allclose(
        res["macro_f1_score"],
        skm.f1_score(y_true, y_pred, average="macro", zero_division=0))


def test_task_trainers_stop_on_eval_loss_without_mutating_args():
    """Bloomberg AND MVSA early-stop on eval_loss/lower-better (reference
    VaultTrainerForMVSA inherits it), via a COPY of TrainArgs — the
    caller's instance, reused across trainers/reps, must stay untouched."""
    from vault_tpu.training.task_trainers import BloombergTrainer, MvsaTrainer

    cfg, params, apply_fn, feats, labels = _toy_setup(n=16)
    shared = TrainArgs(lr=1e-3, train_batch_size=8, seed=0)
    for cls, kw in ((BloombergTrainer, {}),
                    (MvsaTrainer, {"preprocessed": False})):
        tr = cls(apply_fn, jax.device_get(params), shared,
                 InMemoryDataset(feats, labels),
                 exp_handler=ExperimentHandler("/tmp/esm", cls.__name__), **kw)
        assert tr.args.early_stopping_metric == "eval_loss"
        assert tr.args.higher_better is False
        assert tr.early_stopping.higher_better is False
    assert shared.early_stopping_metric == "eval_accuracy"
    assert shared.higher_better is True


def test_hf_adamw_update_without_params():
    """optax contract: update(grads, state) with params=None works when no
    transformation needs params (weight_decay=0)."""
    from vault_tpu.training.optimizer import hf_adamw

    tx = hf_adamw(1e-3)
    p = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = tx.init(p)
    updates, _ = tx.update(jax.tree.map(jnp.ones_like, p), state)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(updates))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hf_adamw(1e-3, weight_decay=0.01).update(
            jax.tree.map(jnp.ones_like, p), tx.init(p))


def test_experiment_parent_gating_survives_reload(tmp_path):
    """Parent-gated params must survive the obj.pkl round trip: a reloaded
    handler regaining a parent-disabled key would rewrite params.yml and
    split future runs into a fresh folder instead of aggregating."""
    h = ExperimentHandler(str(tmp_path), "Exp")
    h.set_params({"use_ocr": False})
    h.set_param("ocr_lr", 1e-3, parent="use_ocr")
    h.set_dict_metrics({"train_loss": 1.0})
    h.log()
    assert "ocr_lr" not in h.effective_params()

    h2 = ExperimentHandler.load_existent(h.directory())
    assert h2._parents == {"ocr_lr": "use_ocr"}
    assert "ocr_lr" not in h2.effective_params()
