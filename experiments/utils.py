"""CLI plumbing: argparse composition from per-component arg specs.

Mirrors the reference convention (experiments/utils.py:5-36): every model /
dataset / trainer contributes an ``argparse_args``-style dict (name ->
argparse kwargs) and subcommands compose them.
"""

from __future__ import annotations

import argparse
from typing import Dict


def add_arguments(parser: argparse.ArgumentParser, spec: Dict[str, dict]):
    for name, kwargs in spec.items():
        parser.add_argument(f"--{name}", **kwargs)


GENERAL_ARGS = dict(
    reps=dict(default=1, type=int, help="times to repeat experiment"),
    description=dict(type=str, help="description of experiment"),
    logging_level=dict(default="warning", type=str, help="logging severity"),
    logging_file=dict(type=str, help="log to this file instead of stderr"),
    experiment_root=dict(default="./experiment_logs", type=str,
                         help="where experiment logs are written"),
)

TRAINER_ARGS = dict(
    early_stopping_patience=dict(type=int, help="early stopping patience"),
    disable_tqdm=dict(action="store_true", help="disable tqdm progress bars"),
    device=dict(default=None, type=str, choices=["cpu", "tpu"],
                help="pin the jax platform (reference --device, "
                     "vault/tmsc_utils/trainer.py:58; default: whatever "
                     "jax selects — TPU when available)"),
    max_num_workers=dict(default=0, type=int,
                         help="worker threads for image decode in lazy "
                              "datasets (reference DataLoader num_workers)"),
    early_stopping_delta=dict(default=0.0, type=float,
                              help="min improvement to reset patience"),
    model_save=dict(action="store_true", help="whether to save model"),
    model_load_filename=dict(type=str, help="local checkpoint to load"),
    lr=dict(default=2e-5, type=float, help="learning rate"),
    adam_beta1=dict(default=0.9, type=float, help="Adam beta_1"),
    adam_beta2=dict(default=0.999, type=float, help="Adam beta_2"),
    adam_epsilon=dict(default=1e-8, type=float, help="Adam epsilon"),
    weight_decay=dict(default=0.0, type=float, help="AdamW weight decay"),
    correct_bias=dict(action="store_true", help="correct bias in AdamW"),
    train_batch_size=dict(default=32, type=int, help="train batch size"),
    eval_batch_size=dict(default=32, type=int, help="eval batch size"),
    eval_steps=dict(type=int, help="steps between dev evals (default: epoch)"),
    max_steps=dict(default=-1, type=int, help="max number of steps"),
    num_train_epochs=dict(default=10, type=int, help="training epochs"),
    warmup_ratio=dict(default=0.1, type=float, help="warmup fraction of steps"),
    num_data_shards=dict(type=int, help="DP mesh size (default: all devices)"),
    use_pallas=dict(default="auto", type=str, nargs="?", const="batched",
                    help="kernel impl selector: auto (default; fused "
                         "QKV+MLP kernels on TPU, XLA elsewhere), false, "
                         "or a '+'-combo like fuseqkv+fusemlp+dotbatch"),
    no_remat=dict(action="store_true", help="disable encoder-layer rematerialization (remat is default: faster and fits bigger batches)"),
    merge_to=dict(default=None, type=int,
                  help="trainable ToMe: merge ViLT patch tokens to this "
                       "static count in every train/eval forward (ops/"
                       "token_merge.py; e.g. 87 halves the joint sequence "
                       "at bench geometry). VAuLT family only "
                       "(clsf_vault.py); tmsc_tombert.py rejects it. "
                       "Default off"),
    merge_at_layer=dict(default=0, type=int,
                        help="merge point: 0 = embeddings (max FLOP "
                             "savings), k>0 = after k encoder layers "
                             "(contextualized tokens, lower divergence)"),
    grad_accum_steps=dict(default=1, type=int,
                          help="micro-batches averaged per optimizer step"),
    compute_dtype=dict(default="bfloat16", choices=["float32", "bfloat16"],
                       type=str, help="activation/matmul dtype (fp32 master "
                       "weights either way)"),
    opt_state_dtype=dict(default="bfloat16",
                         choices=["float32", "bfloat16", "int8"],
                         type=str, help="AdamW m/v storage dtype (bfloat16, "
                         "the default, cuts optimizer HBM traffic ~1.7 "
                         "ms/step at full geometry and measured as pure "
                         "noise on the recipe dynamics — BENCHMARKS.md; "
                         "float32 = bit-level HF-AdamW state fidelity; int8 "
                         "= blockwise-quantized moments, quarter state size)"),
    grad_dtype=dict(default=None, choices=["float32", "bfloat16"], type=str,
                    help="grad buffer dtype between backward and optimizer "
                         "(bfloat16 halves that HBM traffic at a small "
                         "precision cost; measured noise-level on recipe "
                         "dynamics)"),
    rng_impl=dict(default="rbg", choices=["threefry2x32", "rbg"], type=str,
                  help="dropout PRNG: rbg (default) = TPU hardware "
                       "generator, measured 467 vs 441 pairs/s at full "
                       "geometry; threefry2x32 keeps jax's cross-version-"
                       "reproducible streams"),
    profile_dir=dict(default=None, type=str,
                     help="write a jax.profiler trace of the second eval "
                          "window here (first window holds the compile); "
                          "view with TensorBoard/xprof"),
    zero_opt=dict(action="store_true",
                  help="ZeRO-1: shard AdamW moments 1/N over the DP mesh "
                       "(each chip stores and updates 1/N of the state)"),
    seed=dict(default=0, type=int, help="base random seed"),
    checkpoint_dir=dict(default=None, type=str,
                        help="write {params, opt_state, step} checkpoints "
                             "here at every eval window (multi-process runs "
                             "use a coordinated orbax save)"),
    resume=dict(action="store_true",
                help="resume mid-schedule from checkpoint_dir's last "
                     "checkpoint (restores params/opt_state/step)"),
    # multi-host (DCN): launch the SAME command on every host with its own
    # --process_id; jax.distributed joins them into one global device mesh
    # (TPU pods auto-detect and need none of these)
    coordinator_address=dict(default=None, type=str,
                             help="host:port of process 0's coordination "
                                  "service; presence triggers "
                                  "jax.distributed initialization"),
    num_processes=dict(default=None, type=int,
                       help="total number of processes in the multi-host job"),
    process_id=dict(default=None, type=int,
                    help="this process's index in [0, num_processes)"),
)


def apply_device_arg(args):
    """Honor ``--device`` by pinning the jax platform BEFORE the first op
    (must run before any jax array is created; see docs/NOTES.md on the
    axon sitecustomize override).

    ``cpu`` pins the host platform; ``tpu`` deliberately does NOT pin a
    literal "tpu" platform — jax's default selection already prefers the
    accelerator backend, whose registered name varies (plain TPU runtimes
    register "tpu", this environment's tunnel registers "axon"), so pinning
    the string would break the latter."""
    device = getattr(args, "device", None)
    if device == "cpu":
        import os

        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    # multi-host: join the DCN coordination service before any backend use
    # so jax.devices() spans all hosts and the Trainer's mesh scales out
    # (SURVEY.md §2.8; the harness behind tests/test_multihost_trainer.py)
    if getattr(args, "coordinator_address", None) is not None:
        import os

        import jax

        # the Trainer's multi-host AOT-precompile + barrier scheme relies on
        # the persistent compilation cache (the AOT result is not installed
        # into the jit dispatch cache; the post-barrier dispatch must RELOAD
        # it instead of recompiling, or hosts skew into Gloo's ~30 s
        # rendezvous window again) — default a cache dir if none is set
        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "vault_tpu_xla"))
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        jax.config.update("jax_compilation_cache_dir", cache)
        from vault_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)


def trainer_args_from_namespace(args, **overrides):
    from vault_tpu.training.trainer import TrainArgs

    kw = dict(
        lr=args.lr, adam_beta1=args.adam_beta1, adam_beta2=args.adam_beta2,
        adam_epsilon=args.adam_epsilon, weight_decay=args.weight_decay,
        correct_bias=args.correct_bias,
        train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size,
        num_train_epochs=args.num_train_epochs,
        warmup_ratio=args.warmup_ratio, eval_steps=args.eval_steps,
        max_steps=args.max_steps,
        early_stopping_patience=args.early_stopping_patience,
        early_stopping_delta=args.early_stopping_delta,
        model_save=args.model_save,
        model_load_filename=args.model_load_filename,
        num_data_shards=args.num_data_shards, use_pallas=args.use_pallas,
        remat=not args.no_remat, compute_dtype=args.compute_dtype,
        merge_to=args.merge_to, merge_at_layer=args.merge_at_layer,
        opt_state_dtype=args.opt_state_dtype, grad_dtype=args.grad_dtype,
        zero_opt=args.zero_opt,
        grad_accum_steps=args.grad_accum_steps, seed=args.seed,
        rng_impl=args.rng_impl, disable_tqdm=args.disable_tqdm,
        profile_dir=args.profile_dir,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    kw.update(overrides)
    return TrainArgs(**kw)
