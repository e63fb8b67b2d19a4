"""Multi-host (DCN) Trainer harness: the REAL training loop across OS
processes.

The reference has no distributed backend at all (SURVEY.md §2.8); here the
full ``Trainer.train()`` protocol — seeded shuffle, jitted DP step, eval
windows, early-stopping bookkeeping, orbax checkpointing, process-0 logging —
runs unchanged over a global multi-process mesh:

  * every process executes the same deterministic loop (same seeded shuffle,
    same host-global batches) and contributes its addressable rows via
    ``mesh.shard_batch``'s ``make_array_from_callback`` path;
  * GSPMD's gradient all-reduce crosses the process boundary (DCN);
  * only process 0 writes ExperimentHandler files; checkpoints use the orbax
    multihost path all processes enter together.

``worker_main`` is a subprocess entry (spawned by
``tests/test_multihost_trainer.py`` and the driver's ``dryrun_multichip``
multihost leg); it must pin its platform BEFORE any jax use, so this module
keeps jax imports inside functions.
"""

from __future__ import annotations

import json
import os
import sys


def build_toy(seed: int = 0):
    """Tiny deterministic VAuLT setup shared by the multi-host worker and
    its single-process reference run: (cfg, params_host, apply_fn,
    train_feats, train_labels, dev_feats, dev_labels)."""
    import numpy as np
    import jax

    from vault_tpu.config import (
        VaultConfig,
        tiny_text_config,
        tiny_vilt_config,
    )
    from vault_tpu.models.vault import (
        init_classifier_head,
        init_vault,
        vault_for_classification,
    )

    cfg = VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=8),
        text_tower=tiny_text_config(num_hidden_layers=1),
    )
    params = init_vault(jax.random.PRNGKey(seed), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(seed + 1),
                                          cfg.vilt.hidden_size, 3)
    params = jax.device_get(params)

    rng = np.random.default_rng(seed)

    def synth(n):
        return {
            "input_ids": rng.integers(0, cfg.text_tower.vocab_size,
                                      (n, 8)).astype(np.int32),
            "attention_mask": np.ones((n, 8), np.int32),
            "token_type_ids": np.zeros((n, 8), np.int32),
            "pixel_values": rng.normal(size=(n, 3, 32, 32)).astype(np.float32),
            "pixel_mask": np.ones((n, 32, 32), np.int32),
        }, rng.integers(0, 3, n)

    train_feats, train_labels = synth(32)
    dev_feats, dev_labels = synth(8)

    def apply_fn(p, batch, deterministic, rng):
        return vault_for_classification(p, cfg, batch, head_dropout=0.1,
                                        deterministic=deterministic, rng=rng)

    return cfg, params, apply_fn, train_feats, train_labels, dev_feats, dev_labels


def run_training(logdir: str, *, num_data: int = 4, seed: int = 0,
                 max_steps: int = -1, checkpoint_dir=None, resume: bool = False,
                 zero_opt: bool = False, name: str = "multihost"):
    """One full ``Trainer.train()`` on the toy setup over ALL visible devices
    (global in multi-process).  Returns (metric series dict, final host
    params).  Deterministic in ``seed``: a 2-process run and a single-process
    run with the same global mesh shape produce the same numbers."""
    import jax

    from vault_tpu.data.loader import InMemoryDataset
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.trainer import TrainArgs, Trainer

    (cfg, params, apply_fn, train_feats, train_labels,
     dev_feats, dev_labels) = build_toy(seed)
    # Parity-harness pins (the perf defaults are rbg + bf16 moments):
    #   * threefry streams are a pure function of (key, element index), so
    #     dropout masks are IDENTICAL regardless of process/device topology
    #     (rbg bits are sharding-dependent);
    #   * fp32 moments, because bf16 moment rounding amplifies the 1-ulp
    #     cross-process psum reduction-order differences into ~lr-scale
    #     param divergence over a few steps, which is real quantization
    #     noise but defeats the bit-parity assertion this harness exists for.
    args = TrainArgs(lr=1e-3, train_batch_size=8, eval_batch_size=8,
                     num_train_epochs=2, num_data_shards=num_data, seed=seed,
                     max_steps=max_steps, checkpoint_dir=checkpoint_dir,
                     resume=resume, zero_opt=zero_opt, disable_tqdm=True,
                     prefetch_batches=0, rng_impl="threefry2x32",
                     opt_state_dtype="float32")
    handler = ExperimentHandler(logdir, name)
    trainer = Trainer(apply_fn, params, args,
                      InMemoryDataset(train_feats, train_labels),
                      dev_dataset=InMemoryDataset(dev_feats, dev_labels),
                      exp_handler=handler)
    # (Trainer.train() itself AOT-precompiles + coord-barriers when
    # process_count > 1, so compile skew never overlaps a Gloo rendezvous.)
    final = trainer.train()
    return dict(handler._series), jax.device_get(final)


# one pytree flattener for the whole package (slash-joined paths; also
# handles list/tuple nodes) — a second copy here would silently diverge
from vault_tpu.training.checkpoint import _flatten as _flatten_params


def worker_main(argv=None):
    """Subprocess entry: ``python .../multihost.py <pid> <nproc> <port>
    <outdir> [--scenario train|ckpt] [--local-devices N]``.

    Pins a local virtual CPU mesh, joins the DCN coordination service, runs
    the scenario, and (process 0) writes ``results.json`` + ``params.npz``
    to ``outdir``.  Scenario "ckpt" additionally proves orbax multihost
    save/resume: an interrupted run checkpoints mid-schedule, a resumed run
    finishes it, and the resumed finals must match the uninterrupted run's.
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    pid, nproc, port, outdir = (int(argv[0]), int(argv[1]), argv[2], argv[3])
    scenario = argv[argv.index("--scenario") + 1] if "--scenario" in argv else "train"
    local = (int(argv[argv.index("--local-devices") + 1])
             if "--local-devices" in argv else 2)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    # append to (not replace) caller-provided XLA flags — e.g. someone
    # chasing the bit-parity assertions with deterministic-reduction flags
    # must not have them silently dropped in the workers
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={local}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vault_tpu.parallel.mesh import init_distributed

    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    num_data = nproc * local

    import numpy as np

    from vault_tpu.parallel.mesh import coord_barrier

    series, final = run_training(os.path.join(outdir, "logs"),
                                 num_data=num_data)

    if scenario == "ckpt":
        # re-align between phases: each phase compiles fresh programs
        # (minutes on a contended host) and accumulated skew must not eat
        # into any Gloo rendezvous window
        coord_barrier("after_train")
        ckpt = os.path.join(outdir, "ckpt")
        # interrupted: 2 eval windows fit in 8 steps; stop after 5 steps so
        # the step-4 checkpoint is mid-schedule, then resume to the end.
        # zero_opt makes the AdamW moments 1/4-sharded over the data axis —
        # each process can address only HALF the opt state, so the orbax
        # save/restore genuinely exercises the non-addressable-shard
        # coordination the npz path cannot do (VERDICT r2 missing #5);
        # a ZeRO step is numerically identical to plain DP (equivalence-
        # tested in test_training.py), so the uninterrupted non-ZeRO
        # `final` remains the comparison target.
        run_training(os.path.join(outdir, "logs_int"), num_data=num_data,
                     max_steps=5, checkpoint_dir=ckpt, zero_opt=True,
                     name="interrupted")
        coord_barrier("after_interrupted")
        _, resumed = run_training(os.path.join(outdir, "logs_res"),
                                  num_data=num_data, checkpoint_dir=ckpt,
                                  zero_opt=True, resume=True, name="resumed")
        resumed_flat = _flatten_params(resumed)
        for k, a in _flatten_params(final).items():
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(resumed_flat[k], np.float32),
                                       atol=2e-6, err_msg=k)

    if pid == 0:
        flat = {k: np.asarray(v) for k, v in _flatten_params(final).items()}
        np.savez(os.path.join(outdir, "params.npz"), **flat)
        with open(os.path.join(outdir, "results.json"), "w") as f:
            json.dump({"series": series}, f)
    print(f"RESULT {pid} ok", flush=True)


def spawn_workers(outdir: str, *, num_processes: int = 2,
                  local_devices: int = 2, scenario: str = "train",
                  timeout: int = 1200):
    """Launch ``num_processes`` worker subprocesses against a free local port
    and wait; raises with the worker log on any failure.  Used by the
    multi-host test and by ``dryrun_multichip``'s multihost leg."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # workers compile several GSPMD programs on a 1-CPU box; the persistent
    # cache (valid for the CPU backend) makes the 2nd worker and any repeat
    # trainings hit compiled artifacts instead
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(repo, ".jax_cache"))
    # stdout goes to files, not pipes: a worker emitting more than the
    # ~64 KiB pipe buffer (XLA/orbax warning floods) would block mid-
    # collective and deadlock the whole job until timeout
    logs = [open(os.path.join(outdir, f"worker{i}.log"), "w+")
            for i in range(num_processes)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(i),
         str(num_processes), str(port), outdir, "--scenario", scenario,
         "--local-devices", str(local_devices)],
        env=env, stdout=logs[i], stderr=subprocess.STDOUT, text=True)
        for i in range(num_processes)]
    timed_out = False
    try:
        for p in procs:
            try:
                p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                # keep going to the log collection below — a bare
                # TimeoutExpired would violate the "raises with the worker
                # log" contract exactly when it matters most (a deadlocked
                # collective)
                timed_out = True
                break
    finally:
        for p in procs:  # never leak live workers holding the port
            if p.poll() is None:
                p.kill()
                p.wait()
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    if timed_out:
        raise RuntimeError(
            f"multihost workers timed out after {timeout}s (deadlocked "
            "collective?); worker logs:\n" +
            "\n---\n".join(o[-2000:] for o in outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"RESULT {i} ok" not in out:
            raise RuntimeError(f"multihost worker {i} failed:\n{out[-4000:]}")
    return outs


if __name__ == "__main__":
    worker_main()
