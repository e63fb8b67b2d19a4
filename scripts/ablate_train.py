#!/usr/bin/env python
"""Training-step perf decomposition on the TPU (VERDICT r1 item 3 evidence).

Times, at the train_bench geometry (batch 16, bf16 compute, fp32 master):

  fwd        the training forward (loss value only)
  fwdbwd     jax.value_and_grad of it, remat as configured
  opt        the HF-AdamW update alone on precomputed grads
             (pure elementwise over 197M params: the HBM-traffic wall)
  full       fwd + bwd + update (train_bench.py's number)

fwdbwd - fwd ~= backward(+remat recompute); full - fwdbwd ~= optimizer;
opt measured directly cross-checks that attribution.  Env knobs mirror
scripts/train_bench.py (TRAIN_BENCH_REMAT, TRAIN_BENCH_OPT_DTYPE).
"""

import json
import os
import sys
import time

os.environ.setdefault("VAULT_MLP_BWD_TILE", "32")  # gnorm barrier pins
# kernel outputs in VMEM; 64 would bust the scoped budget (pallas_mlp.py)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.presets import vault_base
from vault_tpu.training.optimizer import make_optimizer
from vault_tpu.utils.benchloop import feedback_batch

BATCH = int(os.environ.get("TRAIN_BENCH_BATCH", 16))
_r = os.environ.get("TRAIN_BENCH_REMAT", "1")
REMAT = {"0": False, "1": True}.get(_r, _r)
OPT_DTYPE = os.environ.get("TRAIN_BENCH_OPT_DTYPE")
SEQ = 40
CANVAS = tuple(int(v) for v in
               os.environ.get("TRAIN_BENCH_CANVAS", "384,608").split(","))
K_LO, K_HI = 2, 8


def slope(run, fetch, args, k_lo=K_LO, k_hi=K_HI):
    # NB: param trees are passed as jit ARGUMENTS, never closed over --
    # closure constants get baked into the HLO and the remote compile
    # relay rejects the oversized program (HTTP 413).
    np.asarray(fetch(run(*args, jnp.int32(1))))

    def timed(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fetch(run(*args, jnp.int32(k))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def main():
    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                              (BATCH, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((BATCH, SEQ), jnp.int32),
        "token_type_ids": jnp.zeros((BATCH, SEQ), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(BATCH, 3, *CANVAS)),
                                    jnp.float32),
        "pixel_mask": jnp.ones((BATCH, *CANVAS), jnp.int32),
    }
    labels = jnp.asarray(rng.integers(0, 3, BATCH), jnp.int32)
    tx, _ = make_optimizer(
        2e-5, 1000,
        state_dtype=jnp.dtype(OPT_DTYPE) if OPT_DTYPE else None)
    opt_state = tx.init(params)

    def cast_bf16(p):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    # PRECAST=1: params arrive bf16 (no per-step master->compute cast) —
    # isolates the cast's HBM cost from the rest of the forward
    precast = os.environ.get("TRAIN_BENCH_PRECAST", "0") == "1"
    if precast:
        params = cast_bf16(params)

    # batch/labels are jit ARGUMENTS everywhere below (never closed over:
    # the 57 MB pixel tensor would bake into the HLO and bloat/413 the
    # remote compile relay upload -- the same rule slope() documents)
    def loss_fn(p, b_in, lbl, fb):
        # fb must reach EVERY input (incl. the text side) or the fwd/
        # fwdbwd variants let XLA hoist the loop-invariant text-tower
        # forward out of the timing loop (vault_tpu/utils/benchloop.py)
        b = feedback_batch(b_in, fb)
        logits = vault_for_classification(p if precast else cast_bf16(p),
                                          cfg, b,
                                          head_dropout=0.1,
                                          deterministic=False,
                                          rng=jax.random.PRNGKey(0),
                                          remat=REMAT)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, lbl[:, None], axis=-1).mean()

    variants = os.environ.get("ABLATE_VARIANTS", "fwd,fwdbwd,opt,full").split(",")
    results = {}

    if "fwd" in variants:
        @jax.jit
        def run_fwd(params, b, lbl, k):
            def body(_, l):
                return loss_fn(params, b, lbl, l * 1e-9)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        results["fwd"] = slope(run_fwd, lambda x: x, (params, batch, labels))
        print(json.dumps({"variant": "fwd",
                          "ms": round(results["fwd"] * 1e3, 2)}), flush=True)

    if "fwdbwd" in variants:
        # Every grad leaf must be DATA-ALIVE each iteration or XLA DCEs the
        # backward (fetching one element slices through elementwise chains).
        # gnorm (one full read of grads, ~1 ms/iter at this size) reduces the
        # whole tree and chains into the next iteration's input; the reported
        # number is therefore ~1 ms/iter ABOVE the pure fwd+bwd cost.
        def gnorm(grads):
            return jax.tree.reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32)), grads, 0.0)

        @jax.jit
        def run_fwdbwd(params, b, lbl, k):
            def body(_, l):
                val, grads = jax.value_and_grad(loss_fn)(
                    params, b, lbl, l * 1e-9)
                return val * 0 + gnorm(grads) * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        results["fwdbwd"] = slope(run_fwdbwd, lambda x: x,
                                  (params, batch, labels))
        print(json.dumps({"variant": "fwdbwd", "remat": REMAT,
                          "note": "includes ~1ms/iter gnorm barrier",
                          "ms": round(results["fwdbwd"] * 1e3, 2)}), flush=True)

    if "opt" in variants:
        grads = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype)
                             if jnp.issubdtype(x.dtype, jnp.floating) else x,
                             params)

        @jax.jit
        def run_opt(params, opt_state, grads, k):
            def body(_, carry):
                p, s = carry
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s
            p, _ = jax.lax.fori_loop(0, k, body, (params, opt_state))
            # full-tree reduction AFTER the loop: every element of every
            # iteration stays alive through the elementwise update chain,
            # and the reduction cost is per-call constant -> cancelled by
            # the slope.  (Fetching one element instead lets XLA slice the
            # whole 197M-param update down to one lane.)
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), p, 0.0)

        results["opt"] = slope(run_opt, lambda x: x,
                               (params, opt_state, grads))
        print(json.dumps({"variant": "opt", "opt_dtype": OPT_DTYPE or "float32",
                          "ms": round(results["opt"] * 1e3, 2)}), flush=True)

    if "full" in variants:
        @jax.jit
        def run_full(params, opt_state, b, lbl, k):
            def body(_, carry):
                p, s, l = carry
                val, grads = jax.value_and_grad(loss_fn)(
                    p, b, lbl, l * 1e-9)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s, val
            _, _, val = jax.lax.fori_loop(
                0, k, body, (params, opt_state, jnp.float32(0.0)))
            return val

        results["full"] = slope(run_full, lambda x: x,
                                (params, opt_state, batch, labels))
        print(json.dumps({"variant": "full", "remat": REMAT,
                          "opt_dtype": OPT_DTYPE or "float32",
                          "ms": round(results["full"] * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
