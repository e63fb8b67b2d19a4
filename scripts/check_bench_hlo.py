#!/usr/bin/env python
"""Structural guard for the chained forward bench (bench.py): compile the
SAME chained program structure at the bench geometry and assert every
matmul-bearing op sits INSIDE the timing ``while`` body.

Rounds 1-3 fed the loop carry back into ``pixel_values`` only; XLA's
loop-invariant code motion hoisted the whole text tower out of the while
loop and the recorded throughput silently excluded ~13% of the model —
a scale the 95%-MFU sanity guard in bench.py cannot catch (see
vault_tpu/utils/benchloop.py).  This check is the detector that WOULD have
caught it: it parses the optimized HLO's computation graph and counts
dot/convolution ops reachable from the while body vs not.

Runs on CPU (bench.py invokes it with JAX_PLATFORMS=cpu before timing):
LICM is a platform-independent HLO pass, so a structure that hoists on CPU
hoists on TPU.  The program is built with use_pallas=False — Mosaic
kernels don't lower on CPU, and they are LICM-opaque custom-calls anyway
(the hazard lives in the pure-XLA ops around them; the loop/feedback
structure under test is identical).

Prints ONE JSON line: {"ok": bool, "inside": N, "outside": N}.

Env knobs (for tests): BENCH_HLO_TINY=1 uses tiny geometry; BENCH_HLO_BUGGY=1
reproduces the rounds-1-3 pattern (feedback into pixel_values only) — the
check must report ok=false there or it guards nothing
(tests/test_bench_loop.py::test_check_bench_hlo_script).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from vault_tpu.models.vault import init_vault, vault_apply
from vault_tpu.utils.benchloop import (
    chained_hlo_is_sound, make_chained_forward)

BUGGY = os.environ.get("BENCH_HLO_BUGGY", "0") == "1"


def main():
    if os.environ.get("BENCH_HLO_TINY", "0") == "1":
        from vault_tpu.config import debug_tiny_vault_config

        cfg, batch_size, seq, canvas = debug_tiny_vault_config(), 2, 8, (64, 64)
    else:
        from vault_tpu.presets import vault_base

        # bench.py geometry (BATCH/SEQ/CANVAS there)
        cfg, batch_size, seq, canvas = (vault_base("bert-base-uncased"),
                                        16, 40, (384, 608))

    params = jax.eval_shape(lambda: init_vault(jax.random.PRNGKey(0), cfg))
    params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape,
            jnp.bfloat16 if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype),
        params)
    batch = {
        "input_ids": jax.ShapeDtypeStruct((batch_size, seq), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((batch_size, seq), jnp.int32),
        "token_type_ids": jax.ShapeDtypeStruct((batch_size, seq), jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct((batch_size, 3, *canvas),
                                             jnp.bfloat16),
        "pixel_mask": jax.ShapeDtypeStruct((batch_size, *canvas), jnp.int32),
    }

    apply_fn = lambda p, b: vault_apply(p, cfg, use_pallas=False,
                                        **b).pooler_output
    pooled_shape = (batch_size, cfg.resolved_vilt().hidden_size)
    if BUGGY:
        # the rounds-1-3 pattern: only pixel_values loop-carried
        def chained(params, batch, k):
            def body(_, carry):
                fb, _ = carry
                b = dict(batch)
                b["pixel_values"] = (batch["pixel_values"]
                                     + fb.astype(jnp.bfloat16))
                out = apply_fn(params, b)
                return ((out[0, 0] * 1e-9).astype(jnp.bfloat16), out)

            init = (jnp.zeros((), jnp.bfloat16),
                    jnp.zeros(pooled_shape, jnp.bfloat16))
            _, out = jax.lax.fori_loop(0, k, body, init)
            return out
    else:
        chained = make_chained_forward(apply_fn, pooled_shape)

    ok, inside, outside = chained_hlo_is_sound(
        jax.jit(chained), params, batch,
        jax.ShapeDtypeStruct((), jnp.int32))
    print(json.dumps({"ok": ok, "inside": inside, "outside": outside}))


if __name__ == "__main__":
    main()
