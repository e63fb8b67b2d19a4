"""The training loop: functional, jitted, mesh-data-parallel.

Behavior mirrors the reference's ``Twitter201XTrainer.train`` /
``evaluate`` (vault/tmsc_utils/trainer.py:282-484): AdamW + linear
warmup/decay, per-``eval_steps`` windowed train loss, dev evaluation, early
stopping with best-weights restore, ``max_steps`` abort, final test eval,
then ExperimentHandler log/aggregate/plot.

TPU-native differences:
  * one jitted, donated train step (forward+backward+update) compiled once,
    sharded over the mesh "data" axis; XLA inserts the gradient psum;
  * early stopping keeps best params as a host-side pytree snapshot instead
    of a tempfile (vault/train_utils.py:127-140), and checkpoints persist via
    orbax-compatible npz (``save_checkpoint``) including {params, opt_state,
    step} — a strict superset of the reference's weights-only save;
  * uneven final batches are padded to the DP multiple and masked.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vault_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from vault_tpu.training import losses as losses_mod
from vault_tpu.training.experiment import ExperimentHandler
from vault_tpu.training.metrics import classification_results
from vault_tpu.training.optimizer import make_optimizer

logger = logging.getLogger(__name__)


def _progress(iterator, disable: bool, **tqdm_kwargs):
    """tqdm-wrapped iterator (reference bars, vault/tmsc_utils/trainer.py:
    325-333); plain passthrough when disabled or tqdm is unavailable."""
    if disable:
        return iterator
    try:
        from tqdm import tqdm
    except ImportError:  # progress is cosmetic — never a hard dependency
        return iterator
    return tqdm(iterator, **tqdm_kwargs)


@dataclass
class TrainArgs:
    """Reference knobs (vault/tmsc_utils/trainer.py:51-91 argparse_args +
    vault/train_utils.py:178-285 MyTrainingArguments), TPU additions at the
    end."""

    lr: float = 2e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    weight_decay: float = 0.0
    correct_bias: bool = False
    train_batch_size: int = 32
    eval_batch_size: int = 32
    num_train_epochs: int = 10
    warmup_ratio: float = 0.1
    eval_steps: Optional[int] = None          # default: once per epoch
    max_steps: int = -1
    early_stopping_patience: Optional[int] = None
    # minimum improvement to reset patience (reference EarlyStopping `delta`,
    # vault/train_utils.py:13-171)
    early_stopping_delta: float = 0.0
    early_stopping_metric: str = "eval_accuracy"
    higher_better: bool = True
    model_save: bool = False
    model_load_filename: Optional[str] = None
    # drop the classifier head on warm start (task transfer) — the
    # reference's MyTrainingArguments.discard_classifier
    # (vault/train_utils.py:178-285)
    discard_classifier: bool = False
    seed: int = 0
    # TPU-native:
    num_data_shards: Optional[int] = None     # default: all devices
    # dropout PRNG implementation: "rbg" (default) uses the TPU's
    # hardware-friendly generator — measured 467 vs 441 pairs/s at full
    # geometry (threefry bernoulli draws cost ~2 ms/step).  Reference
    # fidelity is unaffected (torch's dropout streams differ from ANY jax
    # impl).  Caveat: rbg bits are sharding/topology-dependent, so runs on
    # different mesh shapes draw different (equally valid) dropout masks;
    # pass "threefry2x32" for streams that are bit-identical across any
    # topology and jax version
    rng_impl: Optional[str] = "rbg"
    # impl selector (ops/attention.py parse_impl): "auto" = fused QKV +
    # fused LN->MLP kernel on TPU (measured 12% faster forward), XLA
    # elsewhere; False forces XLA everywhere
    use_pallas: Any = "auto"
    # remat measured FASTER than storing scan activations even at batch 16
    # (41.4 vs 43.4 ms/step full geometry) and required to fit batch 64
    remat: bool = True
    # trainable ToMe (arXiv 2210.09461 trains WITH merging): merge patch
    # tokens down to this static count inside every train/eval forward.
    # The size-weighted average is differentiable; merge DECISIONS
    # (argsort/argmax) are piecewise-constant in the inputs, so gradients
    # are exact a.e. (tests/test_token_merge_train.py checks them against
    # finite differences).  Experiments thread these into their apply_fn
    # closures the same way as use_pallas/remat.
    merge_to: Optional[int] = None
    merge_at_layer: int = 0
    compute_dtype: str = "float32"
    # Failure recovery (SURVEY.md §5: absent in the reference; here full
    # {params, opt_state, step} checkpoints are written at every eval window
    # and training resumes mid-schedule):
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    # host/device overlap: batches assembled on a background thread
    prefetch_batches: int = 2
    # tqdm progress bars per epoch/eval (the reference's bars,
    # vault/tmsc_utils/trainer.py:325-333, with its MyTrainingArguments
    # ``disable_tqdm`` switch); the postfix shows the last *fetched* window
    # loss only — no extra host syncs are introduced
    disable_tqdm: bool = False
    # when set, a jax.profiler trace of the SECOND eval window (the first
    # contains the compile) is written here — view with TensorBoard/xprof
    profile_dir: Optional[str] = None
    # gradient accumulation: each optimizer step averages grads over this many
    # micro-batches (train_batch_size must be divisible by it) — large
    # effective batches within the HBM budget
    grad_accum_steps: int = 1
    # AdamW m/v storage dtype: "bfloat16" (default) saves ~1.7 ms/step of
    # optimizer HBM traffic at full geometry and measured as pure noise on
    # the full-recipe dynamics proxy (max loss delta <= 1e-4, metrics
    # identical — docs/BENCHMARKS.md "accuracy cost of the throughput
    # knobs"); pass "float32" for bit-level HF-AdamW state fidelity,
    # "int8" for quartered state memory
    opt_state_dtype: Optional[str] = "bfloat16"
    # grad buffer dtype between backward and optimizer ("bfloat16" halves
    # that read/write traffic; NEAR-lossless, not free — bias/embedding
    # grads and fp32-accumulated matmul outputs do lose mantissa bits in
    # the cast.  Compare against fp32 grads when validating parity.
    grad_dtype: Optional[str] = None
    # ZeRO-1: shard AdamW m/v over the DP mesh axis (parallel/zero.py) —
    # each chip stores 1/N of the moments and does 1/N of the update,
    # with GSPMD inserting the update all-gather
    zero_opt: bool = False


class EarlyStopping:
    """Patience/delta/higher-better tracking with best-weights snapshot
    (behavioral port of vault/train_utils.py:13-171; snapshot lives on host
    memory, not a tempfile)."""

    def __init__(self, patience: Optional[int], delta: float = 0.0,
                 higher_better: bool = False, keep_weights: bool = True):
        self.patience = patience
        self.delta = delta
        self.higher_better = higher_better
        self.keep_weights = keep_weights
        self.cnt = 0
        self.best: Optional[float] = None
        self.best_metrics: Dict[str, Any] = {}
        self.best_params = None

    def new_best(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.higher_better:
            return metric > self.best + self.delta
        return metric < self.best - self.delta

    def step(self, metric: Optional[float], params=None, **metrics) -> bool:
        if metric is None and self.patience is not None:
            # patience is configured but the eval results carry no such
            # metric: without this warning a misspelled early_stopping_metric
            # silently disables BOTH early stopping and the best-weights
            # snapshot/restore protocol (ADVICE r3)
            logging.getLogger(__name__).warning(
                "early stopping is configured (patience=%d) but the eval "
                "results have no value for the early-stopping metric; "
                "early stop and best-weights restore are INACTIVE this "
                "window (available keys: %s)",
                self.patience, sorted(metrics.keys()))
        if metric is None or self.patience is None:
            # early stopping disabled (or no metric to stop on): never
            # snapshot — training must end on the LIVE final params.  A
            # snapshot here would be silently restored at train end,
            # rolling the model back to the last eval window whenever the
            # run ends off a window boundary (max_steps / epoch length not
            # a multiple of eval_steps), and it costs a full-tree
            # device_get per window through the TPU tunnel for nothing.
            return False
        if self.new_best(metric):
            self.best = metric
            self.best_metrics = {f"best_{k}": v for k, v in metrics.items()}
            self.cnt = 0
            if params is not None and self.keep_weights:
                self.best_params = jax.device_get(params)
        else:
            self.cnt += 1
        return self.cnt >= self.patience

    def get_metrics(self) -> Optional[Dict[str, Any]]:
        return self.best_metrics if self.best is not None else None


class Trainer:
    """Generic task trainer.  Task adapters override the hooks at the bottom
    (the reference's input_batch_kwargs / calculate_loss /
    get_eval_preds_from_batch / evaluation_metrics pattern, SURVEY.md §1)."""

    def __init__(self, apply_fn: Callable, params, args: TrainArgs,
                 train_dataset, dev_dataset=None, test_dataset=None,
                 exp_handler: Optional[ExperimentHandler] = None,
                 mesh=None, tensor_parallel: bool = False):
        self.apply_fn = apply_fn
        self.args = args
        self.train_dataset = train_dataset
        self.dev_dataset = dev_dataset
        self.test_dataset = test_dataset
        self.exp_handler = exp_handler or ExperimentHandler()
        self.mesh = mesh if mesh is not None else make_mesh(args.num_data_shards)
        self.dp = int(self.mesh.shape["data"])
        # multi-host: every process runs the same deterministic loop (same
        # seeded shuffle, same metrics); only process 0 touches the
        # filesystem for logs/plots/weight saves, and checkpoints go through
        # the orbax multihost path (all processes participate)
        self.p0 = jax.process_index() == 0
        self.tensor_parallel = tensor_parallel
        self.params = self._place(params)
        self.early_stopping = EarlyStopping(
            args.early_stopping_patience, delta=args.early_stopping_delta,
            higher_better=args.higher_better)
        self._train_step = None
        self._eval_step = None
        self._built_for = None
        self._precompiled = False
        self._ckpt_pool = None
        self._ckpt_future = None
        # (wall_seconds, pairs) per completed eval window — real time because
        # each window ends in the one host fetch that drains the step chain
        self.window_times: List[tuple] = []

    def _place(self, tree):
        """Param/optimizer placement: replicated, or TP-sharded over the
        mesh "model" axis per vault_tpu/parallel/sharding.py rules."""
        if not self.tensor_parallel:
            return replicate(self.mesh, tree)
        from vault_tpu.parallel.sharding import shard_params
        return shard_params(self.mesh, tree)

    # ------------------------------------------------------------------ jit
    def _build_steps(self, steps_per_epoch: int):
        self._built_for = steps_per_epoch
        a = self.args
        num_steps = max(1, steps_per_epoch * int(a.num_train_epochs))
        tx, self._schedule = make_optimizer(
            a.lr, num_steps, a.warmup_ratio, a.adam_beta1, a.adam_beta2,
            a.adam_epsilon, a.weight_decay, a.correct_bias,
            state_dtype=(jnp.dtype(a.opt_state_dtype)
                         if a.opt_state_dtype else None))
        self.tx = tx
        if a.zero_opt:
            from vault_tpu.parallel.zero import place_zero
            self.opt_state = place_zero(tx.init(jax.device_get(self.params)),
                                        self.mesh)
        else:
            self.opt_state = self._place(tx.init(jax.device_get(self.params)))

        def cast_compute(p):
            """Mixed precision: bf16 compute copy; fp32 master weights stay in
            the optimizer.  The cast is differentiable, so grads accumulate
            back into fp32."""
            if a.compute_dtype != "bfloat16":
                return p
            import jax.numpy as jnp
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, p)

        def grad_fn(params, batch, labels, weight, rng):
            def loss_fn(p):
                logits = self.apply_fn(cast_compute(p), batch,
                                       deterministic=False, rng=rng)
                return self.calculate_loss(logits, labels, weight, train=True)

            return jax.value_and_grad(loss_fn)(params)

        def train_step(params, opt_state, loss_acc, batch, labels, weight, rng):
            k = a.grad_accum_steps
            if k <= 1:
                loss, grads = grad_fn(params, batch, labels, weight, rng)
            else:
                # micro-batch scan: split the leading axis into k chunks and
                # average grads (each chunk weighted by its valid-row mass so
                # padded rows keep contributing nothing)
                def split(x):
                    return x.reshape(k, x.shape[0] // k, *x.shape[1:])

                micro = (jax.tree.map(split, batch), split(labels),
                         split(weight))

                def body(carry, xs):
                    acc_loss, acc_grads, acc_w = carry
                    b, l, w, i = xs
                    loss, grads = grad_fn(params, b, l, w,
                                          jax.random.fold_in(rng, i))
                    wsum = w.sum()
                    acc_grads = jax.tree.map(
                        lambda ag, g: ag + g * wsum, acc_grads, grads)
                    return (acc_loss + loss * wsum, acc_grads, acc_w + wsum), None

                zeros = jax.tree.map(jnp.zeros_like, params)
                (loss_sum, grad_sum, wsum), _ = jax.lax.scan(
                    body, (jnp.float32(0.0), zeros, jnp.float32(0.0)),
                    (*micro, jnp.arange(k)))
                denom = jnp.maximum(wsum, 1.0)
                loss = loss_sum / denom
                grads = jax.tree.map(lambda g: g / denom, grad_sum)
            if a.grad_dtype == "bfloat16":
                # Storing grads bf16 between backward and optimizer halves
                # that HBM traffic, but it is a (small) precision trade, not
                # free: gradient leaves are fp32-ACCUMULATED matmul outputs,
                # and bias/embedding grads sum many contributions, so the
                # cast discards real mantissa bits.  The optimizer upcasts
                # per-element (fp32 update math either way).
                grads = jax.tree.map(
                    lambda g: g.astype(jnp.bfloat16)
                    if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # loss-window accumulation stays ON DEVICE: the host loop never
            # fetches per-step (a per-step float(loss) forces a device→host
            # sync that serializes dispatch — through this environment's
            # tunnel it dominated the 41 ms step). `loss` is the weighted
            # mean over valid rows; the accumulator carries BOTH the
            # weighted loss sum and the valid-row mass, so the window mean
            # divides by the rows that actually contributed (padded and
            # label_weights-zeroed rows excluded) — the reference's windowed
            # train loss, vault/tmsc_utils/trainer.py:319-404.
            wsum = weight.sum()
            return params, opt_state, loss_acc + jnp.stack([loss * wsum, wsum])

        def eval_step(params, batch, labels, weight):
            logits = self.apply_fn(cast_compute(params), batch,
                                   deterministic=True, rng=None)
            loss = self.calculate_loss(logits, labels, weight, train=False)
            return logits, loss

        # shardings follow argument placement: params/opt_state were placed by
        # _place (replicated or TP-sharded), batch/labels/weight arrive via
        # shard_batch over the "data" axis; GSPMD inserts the collectives.
        # Under zero_opt the opt_state output sharding is pinned so the
        # moments STAY 1/N-sharded across donated steps.
        if a.zero_opt:
            from vault_tpu.parallel.zero import zero_opt_shardings
            out_sh = (jax.tree.map(lambda x: x.sharding, self.params),
                      zero_opt_shardings(self.opt_state, self.mesh), None)
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2),
                                       out_shardings=out_sh)
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        # eval outputs pinned REPLICATED: XLA all-gathers the logits across
        # the data axis on device, so the host fetch is one transfer of an
        # addressable array — required for multi-host (a data-sharded output
        # is not fully addressable from any single process) and strictly
        # fewer round trips through the TPU tunnel either way
        from vault_tpu.parallel.mesh import replicated
        rep = replicated(self.mesh)
        self._eval_step = jax.jit(eval_step, out_shardings=(rep, rep))

    def _aot_geometry(self, batch, labels, train: bool):
        """AOT-lower+compile one program geometry without executing it."""
        a = self.args
        b, l, w = self._pad(batch, labels)
        sb = shard_batch(self.mesh, b)
        sl = shard_batch(self.mesh, l)
        sw = shard_batch(self.mesh, w)
        if train:
            rng = (jax.random.key(a.seed, impl=a.rng_impl) if a.rng_impl
                   else jax.random.PRNGKey(a.seed))
            self._train_step.lower(
                self.params, self.opt_state, jnp.zeros((2,), jnp.float32),
                sb, sl, sw, jax.random.fold_in(rng, 0)).compile()
        else:
            self._eval_step.lower(self.params, sb, sl, sw).compile()

    def precompile(self, batch, labels):
        """AOT-compile the train/eval programs for this batch geometry
        WITHOUT executing them (no collectives run during tracing/compile).

        Multi-host: ``train()`` calls :meth:`_precompile_multihost` (every
        geometry the run will dispatch) followed by a coordination-service
        barrier automatically — XLA's Gloo collective-context rendezvous has
        a hard ~30 s window, and compile times on loaded hosts can skew
        processes past it; AOT-ing first means the programs are compiled
        before any process enters a collective.  NOTE: the AOT result is not
        installed into the jit dispatch cache, so this scheme needs the
        persistent compilation cache (``JAX_COMPILATION_CACHE_DIR``; the CLI
        multi-host path defaults it) for the post-barrier dispatch to reload
        instead of recompile."""
        a = self.args
        self._build_steps(
            max(1, self.train_dataset.num_batches(a.train_batch_size)))
        self._aot_geometry(batch, labels, train=True)
        self._aot_geometry(batch, labels, train=False)
        self._precompiled = True

    def _precompile_multihost(self, steps_per_epoch: int):
        """AOT every geometry this run will dispatch after the barrier:
        the full train batch AND the trailing partial batch, plus the
        full/partial eval batches of each eval dataset — any one of them
        compiling at dispatch time would reopen the post-barrier skew
        window (see precompile)."""
        a = self.args
        self._build_steps(steps_per_epoch)

        def geometries(ds, bs):
            feats, labels = next(iter(ds.batches(bs, shuffle=False)))
            rows = {labels.shape[0]}
            if ds.num_examples % bs:
                rows.add(ds.num_examples % bs)
            return feats, labels, sorted(rows)

        feats, labels, rows = geometries(self.train_dataset,
                                         a.train_batch_size)
        for r in rows:
            self._aot_geometry({k: v[:r] for k, v in feats.items()},
                               labels[:r], train=True)
        for ds in (self.dev_dataset, self.test_dataset):
            if ds is None:
                continue
            feats, labels, rows = geometries(ds, a.eval_batch_size)
            for r in rows:
                self._aot_geometry({k: v[:r] for k, v in feats.items()},
                                   labels[:r], train=False)
        self._precompiled = True

    # ----------------------------------------------------------------- loop
    def train(self):
        a = self.args
        if a.model_load_filename:
            self.load_weights(a.model_load_filename)
        steps_per_epoch = max(1, self.train_dataset.num_batches(a.train_batch_size))
        eval_steps = a.eval_steps or steps_per_epoch
        if jax.process_count() > 1:
            # multi-host: AOT-compile every program geometry, then barrier,
            # then execute — Gloo's collective-context rendezvous has a
            # ~30 s window, and letting any compile overlap a collective
            # fails whenever hosts compile at different speeds (see
            # precompile / parallel.mesh.coord_barrier).  Runs even after a
            # public precompile() call: that covers ONE geometry, and a
            # trailing partial batch compiling at dispatch time mid-run
            # would reopen the skew window (re-AOT of already-compiled
            # geometries is cheap via the persistent compile cache).
            from vault_tpu.parallel.mesh import coord_barrier

            self._precompile_multihost(steps_per_epoch)
            coord_barrier("trainer_precompiled")
        reuse = self._precompiled and self._built_for == steps_per_epoch
        self._precompiled = False  # a precompile is good for one train()
        if not reuse:
            self._build_steps(steps_per_epoch)

        rng = (jax.random.key(a.seed, impl=a.rng_impl) if a.rng_impl
               else jax.random.PRNGKey(a.seed))
        data_rng = np.random.default_rng(a.seed)
        early_stop = False
        step = 0
        # profile the first full post-compile window (also correct under
        # --resume, where fast-forward skips past the early windows)
        profiling, profiled, profile_stop = False, False, 0
        # window_acc is a DEVICE [loss_sum, valid_mass] pair threaded through
        # the jitted step; the host fetches it once per eval window, never
        # per step
        window_acc, window_n, window_t0 = None, 0, time.perf_counter()
        # NOTE: resume restores params/opt_state/step; early-stopping counters
        # restart (checkpoints are written at eval-window boundaries, so the
        # loss window is always freshly initialized after fast-forward).
        start_step = self._maybe_resume() if a.resume else 0
        for epoch in range(int(a.num_train_epochs)):
            if early_stop:
                break
            batch_iter = self.train_dataset.batches(
                a.train_batch_size, shuffle=True, rng=data_rng)
            if a.prefetch_batches > 0:
                from vault_tpu.data.loader import prefetch

                batch_iter = prefetch(batch_iter, a.prefetch_batches)
            pbar = _progress(batch_iter, a.disable_tqdm or not self.p0,
                             total=steps_per_epoch,
                             desc=f"epoch {epoch + 1}/{int(a.num_train_epochs)}")
            for batch, labels in pbar:
                if step < start_step:  # resume: fast-forward the schedule
                    step += 1
                    continue
                if a.max_steps > 0 and step >= a.max_steps:
                    logger.info("Forcibly stopping training")
                    early_stop = True
                    break
                # `window_acc is None`: first executed step after a resume
                # whose start_step is off the current eval-window grid (the
                # eval cadence or batch geometry changed between runs) —
                # open a fresh (shorter) window instead of crashing the
                # jitted step with a None accumulator
                if window_acc is None or step % eval_steps == 0:
                    window_acc, window_n = jnp.zeros((2,), jnp.float32), 0
                    window_t0 = time.perf_counter()
                    if a.profile_dir and not profiling and not profiled \
                            and step >= start_step + eval_steps:
                        jax.profiler.start_trace(a.profile_dir)
                        profiling, profile_stop = True, step + eval_steps

                n = labels.shape[0]
                batch, labels, weight = self._pad(batch, labels)
                # per-step dropout key is a pure function of (seed, step) so
                # a resumed run reproduces the exact stream the uninterrupted
                # run would have used from start_step on (sequential split
                # would skip no draws during fast-forward and de-sync)
                step_rng = jax.random.fold_in(rng, step)
                self.params, self.opt_state, window_acc = self._train_step(
                    self.params, self.opt_state, window_acc,
                    shard_batch(self.mesh, batch),
                    shard_batch(self.mesh, labels),
                    shard_batch(self.mesh, weight), step_rng)
                window_n += n

                if (step + 1) % eval_steps == 0:
                    # the single host sync of the window; forces the whole
                    # step chain, so elapsed-time here is real wall time
                    window_sum, window_mass = np.asarray(window_acc)
                    if profiling and (step + 1) >= profile_stop:
                        jax.profiler.stop_trace()
                        profiling, profiled = False, True
                        logger.info("profiler trace written to %s",
                                    a.profile_dir)
                    self.window_times.append(
                        (time.perf_counter() - window_t0, window_n))
                    results = dict(
                        train_loss=window_sum / max(float(window_mass), 1e-9))
                    if hasattr(pbar, "set_postfix"):
                        pbar.set_postfix(
                            train_loss=f"{results['train_loss']:.4f}")
                    if self.dev_dataset is not None:
                        results.update(self.evaluate(self.dev_dataset))
                    self.exp_handler.set_dict_metrics(results)
                    logger.info("step %d (epoch %d): %s", step + 1, epoch + 1, results)
                    early_stop = self.early_stopping.step(
                        results.get(a.early_stopping_metric), params=self.params,
                        **{**results, "epoch": epoch + 1,
                           "step": (step + 1) // eval_steps})
                    if early_stop:
                        logger.info("Early stopping at step %d", step + 1)
                        break
                    self._maybe_checkpoint(step + 1)
                step += 1
            if hasattr(pbar, "close"):
                pbar.close()

        if profiling:  # training ended mid-window (early stop / max_steps)
            jax.profiler.stop_trace()
        self._flush_checkpoint()  # the last write is durable before we return
        if self._ckpt_pool is not None:  # don't leak a thread per Trainer
            self._ckpt_pool.shutdown()
            self._ckpt_pool = None

        # throughput observability (SURVEY.md §5: the pairs/sec counter the
        # reference lacks); first window excluded (contains the compile)
        if len(self.window_times) > 1:
            steady = self.window_times[1:]
            pairs = sum(n for _, n in steady)
            self.exp_handler.set_final(
                "train_pairs_per_sec",
                pairs / max(sum(t for t, _ in steady), 1e-9))

        best = self.early_stopping.get_metrics()
        if best is not None:
            self.exp_handler.set_best(best)
        if self.early_stopping.best_params is not None:
            self.params = self._place(self.early_stopping.best_params)

        if self.test_dataset is not None:
            results = self.evaluate(self.test_dataset)
            self.exp_handler.set_dict_metrics(results, test=True)
            logger.info("test: %s", results)

        self.train_end()
        return self.params

    def train_end(self):
        if not self.p0:
            return  # non-zero processes hold identical state; only 0 writes
        self.exp_handler.log()
        if self.args.model_save:
            self.save_weights(self.exp_handler.model_save_filename)
        self.exp_handler.aggregate_results()
        self.exp_handler.plot()

    def evaluate(self, dataset) -> Dict[str, float]:
        a = self.args
        if self._eval_step is None:
            self._build_steps(max(1, self.train_dataset.num_batches(a.train_batch_size)))
        total_loss, total_mass, preds, trues = 0.0, 0.0, [], []
        for batch, labels in _progress(
                dataset.batches(a.eval_batch_size, shuffle=False),
                a.disable_tqdm or not self.p0,
                total=dataset.num_batches(a.eval_batch_size),
                desc="eval", leave=False):
            n = labels.shape[0]
            batch_p, labels_p, weight = self._pad(batch, labels)
            logits, loss = self._eval_step(
                self.params, shard_batch(self.mesh, batch_p),
                shard_batch(self.mesh, labels_p), shard_batch(self.mesh, weight))
            # ONE host transfer per eval batch: logits must come to host for
            # sklearn metrics anyway, so the loss rides the same fetch instead
            # of paying a second device→host round trip (the train loop's
            # per-step-sync discipline, applied to eval)
            logits, loss = jax.device_get((logits, loss))
            # the step's loss is a weighted mean over the batch's VALID mass
            # (padding + label_weights-zeroed rows excluded, losses._wmean);
            # re-weight by that same mass — multiplying by the raw row count
            # would bias eval_loss whenever invalid rows are present (the
            # train window's valid-mass accounting, applied to eval).
            # `weight` is host numpy from _pad, so the mass costs no fetch.
            mass = float(weight.sum())
            total_loss += float(loss) * mass
            total_mass += mass
            logits = np.asarray(logits)[:n]
            preds.extend(self.get_eval_preds(logits))
            trues.extend(self.get_eval_true(labels))
        results = dict(eval_loss=total_loss / max(total_mass, 1e-9))
        results.update(self.evaluation_metrics(trues, preds))
        return results

    # -------------------------------------------------------------- helpers
    def _pad(self, batch, labels):
        # rows must split evenly into grad_accum_steps micro-batches AND
        # each micro-batch must shard over the dp axis — pad the final
        # partial batch to a multiple of both (padded rows carry weight 0)
        multiple = self.dp * max(1, self.args.grad_accum_steps)
        merged = {**batch, "__labels__": labels}
        padded, n = pad_to_multiple(merged, multiple)
        labels_p = padded.pop("__labels__")
        total = next(iter(jax.tree.leaves(padded))).shape[0]
        weight = (np.arange(total) < n).astype(np.float32)
        # per-row validity from the dataset (e.g. VQA rows whose answers all
        # fall outside the label vocab — the reference filters None labels,
        # vault/models/vault/trainer.py:215-249) folds into the loss weight
        # and never reaches apply_fn
        lw = padded.pop("label_weights", None)
        if lw is not None:
            weight = weight * np.asarray(lw, np.float32)
        return padded, labels_p, weight

    # ------------------------------------------------- failure recovery ---
    @property
    def _ckpt_path(self) -> Optional[str]:
        import os

        if self.args.checkpoint_dir is None:
            return None
        return os.path.join(self.args.checkpoint_dir, "last.ckpt")

    def _maybe_checkpoint(self, step: int):
        path = self._ckpt_path
        if path is None:
            return
        if jax.process_count() > 1:
            # multi-host: shards of a ZeRO/TP-sharded opt_state are not
            # addressable from any single process, so the npz device_get
            # path would throw — orbax writes each process's shards in a
            # coordinated save that ALL processes must enter
            from vault_tpu.training.checkpoint import save_checkpoint_multihost
            save_checkpoint_multihost(
                path, {"params": self.params, "opt_state": self.opt_state,
                       "step": np.asarray(step)})
            return
        from vault_tpu.training.checkpoint import save_checkpoint

        # the device_get is the required host sync; npz serialization + disk
        # write happen on a background thread (one slot — wait for the
        # previous write first) so the next window's step dispatch isn't
        # serialized behind disk I/O.  save_checkpoint writes atomically, so
        # a crash mid-write never corrupts the last good checkpoint.
        state = {"params": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "step": np.asarray(step)}
        self._flush_checkpoint()
        if self._ckpt_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._ckpt_pool = ThreadPoolExecutor(
                1, thread_name_prefix="vault-ckpt")
        self._ckpt_future = self._ckpt_pool.submit(save_checkpoint, path, state)

    def _flush_checkpoint(self):
        """Wait for any in-flight background checkpoint write (re-raising
        its error, if it failed)."""
        if self._ckpt_future is not None:
            self._ckpt_future.result()
            self._ckpt_future = None

    def _maybe_resume(self) -> int:
        import os

        path = self._ckpt_path
        if path is None:
            return 0
        if jax.process_count() > 1:
            if not os.path.isdir(path):
                return 0
            from vault_tpu.training.checkpoint import (
                restore_checkpoint_multihost,
            )

            state = restore_checkpoint_multihost(
                path, {"params": self.params, "opt_state": self.opt_state,
                       "step": np.asarray(0)})
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            step = int(state["step"])
            logger.info("resumed (multihost) from %s at step %d", path, step)
            return step
        from vault_tpu.training.checkpoint import restore_checkpoint

        if not os.path.exists(path + ".npz"):
            return 0
        target = {"params": jax.device_get(self.params),
                  "opt_state": jax.device_get(self.opt_state),
                  "step": np.asarray(0)}
        state = restore_checkpoint(path, target)
        self.params = self._place(state["params"])
        if self.args.zero_opt:
            from vault_tpu.parallel.zero import place_zero
            self.opt_state = place_zero(state["opt_state"], self.mesh)
        else:
            self.opt_state = self._place(state["opt_state"])
        step = int(state["step"])
        logger.info("resumed from %s at step %d", path, step)
        return step

    def save_weights(self, path: str):
        from vault_tpu.training.checkpoint import save_checkpoint
        save_checkpoint(path, jax.device_get(self.params))

    def load_weights(self, path: str):
        from vault_tpu.training.checkpoint import restore_checkpoint

        current = jax.device_get(self.params)
        head_keys = {"head", "vqa", "rank", "pair", "mlm", "classifier"}
        if self.args.discard_classifier:
            target = {k: v for k, v in current.items() if k not in head_keys}
        else:
            target = current
        tree = restore_checkpoint(path, target)
        if self.args.discard_classifier:
            tree = {**current, **tree}  # restored backbone + fresh heads
        self.params = self._place(tree)

    # ------------------------------------------------------- task hooks ---
    def calculate_loss(self, logits, labels, weight, train: bool):
        return losses_mod.softmax_cross_entropy(logits, labels, weight)

    def get_eval_preds(self, logits) -> List[int]:
        return np.argmax(logits, axis=-1).tolist()

    def get_eval_true(self, labels) -> List[int]:
        return np.asarray(labels).tolist()

    def evaluation_metrics(self, y_true, y_pred) -> Dict[str, float]:
        return classification_results(y_true, y_pred)
