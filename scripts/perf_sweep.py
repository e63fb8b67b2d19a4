#!/usr/bin/env python
"""TPU perf sweep: forward throughput across batch sizes and attention
implementations (XLA vs Pallas fused).  Writes results to stdout as JSON
lines; used to pick bench.py defaults."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.models.vault import init_vault, vault_apply
from vault_tpu.presets import vault_base
from vault_tpu.utils.benchloop import make_chained_forward

SEQ = 40
CANVAS = tuple(int(v) for v in
               os.environ.get("PERF_SWEEP_CANVAS", "384,608").split(","))
K_LO, K_HI = 2, 12


MERGE_TO = os.environ.get("PERF_SWEEP_MERGE_TO")
MERGE_TO = int(MERGE_TO) if MERGE_TO else None
MERGE_LAYER = int(os.environ.get("PERF_SWEEP_MERGE_LAYER", "0"))


def measure(cfg, params, batch_size, use_pallas):
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                              (batch_size, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((batch_size, SEQ), jnp.int32),
        "token_type_ids": jnp.zeros((batch_size, SEQ), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(batch_size, 3, *CANVAS)),
                                    jnp.bfloat16),
        "pixel_mask": jnp.ones((batch_size, *CANVAS), jnp.int32),
    }

    # all inputs loop-carried, incl. the text side — see
    # vault_tpu/utils/benchloop.py for the hoisting hazard this closes
    chained = make_chained_forward(
        lambda p, b: vault_apply(p, cfg, use_pallas=use_pallas,
                                 merge_patches_to=MERGE_TO,
                                 merge_at_layer=MERGE_LAYER,
                                 **b).pooler_output,
        (batch_size, cfg.vilt.hidden_size))

    run = jax.jit(chained)
    np.asarray(run(params, batch, jnp.int32(1)))

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)
    return batch_size / per_step, per_step


def main():
    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    quant = os.environ.get("PERF_SWEEP_QUANT", "0").strip().lower()
    if quant not in ("0", "1", "w8", "w8a8"):
        # a typo must not silently measure the wrong mode and end up in
        # BENCHMARKS.md mislabeled
        raise SystemExit(f"PERF_SWEEP_QUANT={quant!r}: use 0, 1/w8, or w8a8")
    if quant != "0":
        from vault_tpu.ops.quantize import quantize_model_params
        params = quantize_model_params(
            params, mode="w8a8" if quant == "w8a8" else "w8")

    impls = os.environ.get("PERF_SWEEP_IMPLS", "0,1").split(",")
    batches = [int(b) for b in
               os.environ.get("PERF_SWEEP_BATCHES", "16,32,64").split(",")]
    table = {"0": False, "1": True}
    for use_pallas in (table.get(i, i) for i in impls):
        for bs in batches:
            try:
                pps, step = measure(cfg, params, bs, use_pallas)
                print(json.dumps({"batch": bs, "pallas": use_pallas,
                                  "quant": quant, "merge_to": MERGE_TO,
                                  "merge_at_layer": MERGE_LAYER,
                                  "pairs_per_sec": round(pps, 1),
                                  "ms_per_step": round(step * 1e3, 2)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"batch": bs, "pallas": use_pallas,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
