#!/usr/bin/env python
"""Training-step throughput at full geometry on the TPU: fwd+bwd+HF-AdamW
update for VAuLT (bert-base tower + vilt-b32), bf16 activations / fp32
optimizer.  Slope-timed like bench.py.  Also serves as the full-size compile
check for the training path on real hardware."""

import json
import os
import sys
import time

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

BATCH = int(os.environ.get("TRAIN_BENCH_BATCH", 16))
NODROP = os.environ.get("TRAIN_BENCH_NODROP", "0") == "1"
if os.environ.get("TRAIN_BENCH_RBG", "0") == "1":
    import jax as _j
    _j.config.update("jax_default_prng_impl", "rbg")
_r = os.environ.get("TRAIN_BENCH_REMAT", "0")
REMAT = {"0": False, "1": True}.get(_r, _r)   # "dots" = dots_saveable policy
OPT_DTYPE = os.environ.get("TRAIN_BENCH_OPT_DTYPE")  # e.g. "bfloat16" m/v
GRAD_BF16 = os.environ.get("TRAIN_BENCH_GRAD_BF16", "0") == "1"
# trainable ToMe A/B: TRAIN_BENCH_MERGE_TO=87 [TRAIN_BENCH_MERGE_LAYER=0]
MERGE_TO = (int(os.environ["TRAIN_BENCH_MERGE_TO"])
            if os.environ.get("TRAIN_BENCH_MERGE_TO") else None)
MERGE_LAYER = int(os.environ.get("TRAIN_BENCH_MERGE_LAYER", "0"))
SEQ = 40
# TRAIN_BENCH_CANVAS=64,64 shrinks the pixel canvas so every env-flag
# combination can be CPU-smoked before spending a ~6-min tunnel compile
# on it (tests/test_bench_scripts_smoke.py)
CANVAS = tuple(int(v) for v in
               os.environ.get("TRAIN_BENCH_CANVAS", "384,608").split(","))
K_LO, K_HI = 2, 8


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

    def one_step(params, opt_state, batch, labels, rng):
        def loss_fn(p):
            # mixed precision: bf16 compute, fp32 master weights
            logits = vault_for_classification(cast_bf16(p), cfg, batch,
                                              head_dropout=0.1,
                                              deterministic=NODROP, rng=rng,
                                              remat=REMAT,
                                              merge_patches_to=MERGE_TO,
                                              merge_at_layer=MERGE_LAYER)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if GRAD_BF16:  # TrainArgs grad_dtype="bfloat16" traffic optimization
            grads = cast_bf16(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def chained(params, opt_state, batch, labels, k):
        def body(_, carry):
            p, s, _l = carry
            return one_step(p, s, batch, labels, jax.random.PRNGKey(0))

        return jax.lax.fori_loop(0, k, body,
                                 (params, opt_state, jnp.float32(0.0)))

    run = jax.jit(chained)
    # fetch only the final loss scalar: it depends on the whole update chain
    # (tunnel note: block_until_ready alone under-synchronizes; a host fetch
    # of a chain-dependent value is the reliable barrier)
    np.asarray(run(params, opt_state, batch, labels, jnp.int32(1))[2])
    print("compiled", file=sys.stderr)

    def timed(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(params, opt_state, batch, labels, jnp.int32(k))[2])
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)
    print(json.dumps({
        "metric": "vault_train_step_pairs_per_sec_per_chip",
        "value": round(BATCH / per_step, 2),
        "unit": "pairs/sec/chip",
        "batch": BATCH, "remat": REMAT, "nodrop": NODROP,
        "opt_dtype": OPT_DTYPE or "float32",
        "merge_to": MERGE_TO, "merge_at_layer": MERGE_LAYER,
        "ms_per_train_step": round(per_step * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
