"""Checkpoint/resume: a killed-and-restarted run continues mid-schedule and
matches the uninterrupted run's final weights (same data order)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.data.loader import InMemoryDataset
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.trainer import TrainArgs, Trainer


def _setup(n=16, seed=0):
    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=4),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    rng = np.random.default_rng(seed)
    feats = {
        "input_ids": rng.integers(0, cfg.text_tower.vocab_size, (n, 6)).astype(np.int32),
        "attention_mask": np.ones((n, 6), np.int32),
        "token_type_ids": np.zeros((n, 6), np.int32),
        "pixel_values": rng.normal(size=(n, 3, 32, 32)).astype(np.float32),
        "pixel_mask": np.ones((n, 32, 32), np.int32),
    }
    labels = rng.integers(0, 3, n)
    params = init_vault(jax.random.PRNGKey(seed), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(seed + 1),
                                          cfg.vilt.hidden_size, 3)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(p, cfg, batch, head_dropout=0.0,
                                        deterministic=True)

    return cfg, params, apply_fn, feats, labels


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    cfg, params0, apply_fn, feats, labels = _setup()
    params0 = jax.device_get(params0)
    common = dict(lr=1e-3, train_batch_size=8, num_train_epochs=2,
                  eval_steps=1, seed=0)

    # uninterrupted: 4 steps (2 epochs x 2 batches)
    tr_full = Trainer(apply_fn, jax.tree.map(jnp.asarray, params0),
                      TrainArgs(**common),
                      InMemoryDataset(feats, labels),
                      exp_handler=ExperimentHandler(str(tmp_path), "full"))
    p_full = jax.device_get(tr_full.train())

    # interrupted after 2 steps (max_steps), checkpointing each eval window
    ck = str(tmp_path / "ck")
    tr_a = Trainer(apply_fn, jax.tree.map(jnp.asarray, params0),
                   TrainArgs(**common, max_steps=2, checkpoint_dir=ck),
                   InMemoryDataset(feats, labels),
                   exp_handler=ExperimentHandler(str(tmp_path), "a"))
    tr_a.train()

    # resumed: fresh process state, restores step 2 and finishes
    tr_b = Trainer(apply_fn, jax.tree.map(jnp.asarray, params0),
                   TrainArgs(**common, checkpoint_dir=ck, resume=True),
                   InMemoryDataset(feats, labels),
                   exp_handler=ExperimentHandler(str(tmp_path), "b"))
    p_resumed = jax.device_get(tr_b.train())

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_resumed)):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_sigkill_crash_recovery(tmp_path):
    """Failure recovery under a REAL crash (SURVEY §5: the reference has no
    recovery subsystem at all): a training process is SIGKILLed mid-run —
    no cleanup, no atexit — and a relaunched process with --resume must
    reproduce the uninterrupted run's final params exactly.  Atomic
    checkpoint writes guarantee last.ckpt is never torn; fold_in dropout
    keys and the seeded shuffle guarantee the resumed stream."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = tmp_path / "ck"
    script = tmp_path / "train.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        sys.path.insert(0, {repo!r})
        sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from test_resume import _setup
        from vault_tpu.data.loader import InMemoryDataset
        from vault_tpu.training.experiment import ExperimentHandler
        from vault_tpu.training.trainer import TrainArgs, Trainer

        mode = sys.argv[1]          # "full" | "victim" | "resume"
        cfg, params, apply_fn, feats, labels = _setup()
        args = TrainArgs(lr=1e-3, train_batch_size=8, num_train_epochs=3,
                         eval_steps=1, seed=0, disable_tqdm=True,
                         prefetch_batches=0,
                         checkpoint_dir={str(ck)!r},
                         resume=(mode == "resume"))
        tr = Trainer(apply_fn, params, args, InMemoryDataset(feats, labels),
                     exp_handler=ExperimentHandler(sys.argv[2], mode))
        final = tr.train()
        from vault_tpu.parallel.multihost import _flatten_params
        flat = {{k: np.asarray(v) for k, v in
                _flatten_params(jax.device_get(final)).items()}}
        np.savez(os.path.join(sys.argv[2], mode + "_final.npz"), **flat)
        print("DONE", flush=True)
    """))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(repo, ".jax_cache"))
    out = str(tmp_path)

    # reference: uninterrupted run (also removes its checkpoints after)
    r = subprocess.run([sys.executable, str(script), "full", out], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    for f in os.listdir(ck):  # fresh checkpoint dir for the victim
        os.remove(os.path.join(ck, f))

    # victim: SIGKILL as soon as the first checkpoint lands on disk
    p = subprocess.Popen([sys.executable, str(script), "victim", out],
                         env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    ckpt_file = os.path.join(ck, "last.ckpt.npz")
    while time.time() < deadline:
        if os.path.exists(ckpt_file) or p.poll() is not None:
            break
        time.sleep(0.2)
    assert os.path.exists(ckpt_file), "no checkpoint before victim finished"
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
    p.wait()
    # the crash must actually have happened — if the victim finished before
    # the kill, this test silently degenerates into a plain resume test
    assert p.returncode == -signal.SIGKILL, (
        f"victim exited {p.returncode} before SIGKILL landed; "
        "crash recovery was not exercised")

    # recovery: resume from the crashed run's last checkpoint
    r = subprocess.run([sys.executable, str(script), "resume", out], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    full = np.load(os.path.join(out, "full_final.npz"))
    resumed = np.load(os.path.join(out, "resume_final.npz"))
    assert set(full.files) == set(resumed.files)
    for k in full.files:
        np.testing.assert_allclose(full[k], resumed[k], atol=1e-5, err_msg=k)


def test_checkpoint_roundtrips_bf16_leaves(tmp_path):
    """npz stores ml_dtypes leaves as raw void bytes; restore must recover
    the dtype from the target (load-bearing now that bf16 AdamW state is
    the TrainArgs default)."""
    import jax.numpy as jnp

    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    tree = {"m": np.arange(6, dtype=np.float32).reshape(2, 3)
            .astype(jnp.bfloat16), "c": np.int32(7)}
    path = str(tmp_path / "ck")
    save_checkpoint(path, tree)
    out = restore_checkpoint(path, jax.tree.map(np.asarray, tree))
    assert out["m"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out["m"], np.float32),
                                  np.asarray(tree["m"], np.float32))
    assert int(out["c"]) == 7
