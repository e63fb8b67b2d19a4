"""Regression tests for the chained-loop benchmark helpers.

Rounds 1-3 timed forwards in a ``lax.fori_loop`` whose carry fed back
into ``pixel_values`` ONLY; the text tower consumed loop-invariant
``input_ids`` and XLA's loop-invariant code motion hoisted it out of the
loop — every recorded forward throughput excluded the BERT tower, and
the round-4 Llama-8B probe reported a physically impossible 6.91 ms/step
for an 8B tower.  ``vault_tpu/utils/benchloop.py`` closes the hole; these
tests pin (a) value preservation — integer ids/masks must be
bit-identical or the model computes different tokens, (b) that the fixed
loop actually pays the text-side cost per iteration, and (c) that the
old pattern really does get hoisted (the hazard is real, not folklore —
if a future XLA stops hoisting, that assertion failing is news worth
reading, not a framework bug).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vault_tpu.utils.benchloop import feedback_batch, make_chained_forward

BATCH, N, STEPS = 64, 1024, 32


def test_feedback_batch_preserves_values():
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 100, (4, 7)), jnp.int32),
        "attention_mask": jnp.ones((4, 7), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(4, 3, 8, 8)),
                                    jnp.float32),
    }
    fb = jnp.bfloat16(0.25)
    out = jax.jit(feedback_batch)(batch, fb)
    # integers must be BIT-identical (perturbed ids = different tokens)
    np.testing.assert_array_equal(np.asarray(out["input_ids"]),
                                  np.asarray(batch["input_ids"]))
    np.testing.assert_array_equal(np.asarray(out["attention_mask"]),
                                  np.asarray(batch["attention_mask"]))
    assert out["input_ids"].dtype == jnp.int32
    # floats shift by exactly fb
    np.testing.assert_allclose(np.asarray(out["pixel_values"]),
                               np.asarray(batch["pixel_values"]) + 0.25,
                               rtol=0, atol=1e-6)


def _toy_model():
    """Expensive text branch (embedding gather + a scan of matmuls,
    standing in for the tower) + trivially cheap image branch."""
    w = jnp.asarray(np.random.default_rng(1).normal(size=(N, N)) * 0.02,
                    jnp.float32)

    def apply_fn(params, batch):
        x = params["w"][batch["input_ids"] % N]           # (B, N)

        def step(h, _):
            return jnp.tanh(h @ params["w"]), None

        h, _ = jax.lax.scan(step, x, None, length=STEPS)
        pooled = h + batch["pixel_values"].mean()
        return pooled.astype(jnp.bfloat16)

    rng = np.random.default_rng(2)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, N, (BATCH,)), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(BATCH, 4)), jnp.float32),
    }
    return {"w": w}, batch, apply_fn


def _slope(run, params, batch, k_lo=1, k_hi=5):
    np.asarray(run(params, batch, jnp.int32(1)))  # compile

    def timed(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def test_full_feedback_defeats_loop_invariant_hoisting():
    params, batch, apply_fn = _toy_model()

    # the FIXED loop: every input loop-carried via feedback_batch
    fixed = jax.jit(make_chained_forward(apply_fn, (BATCH, N)))

    # the rounds-1-3 BUGGY pattern: only pixel_values carried
    def buggy(params, batch, k):
        def body(_, carry):
            fb, _ = carry
            b = dict(batch)
            b["pixel_values"] = batch["pixel_values"] + fb.astype(jnp.float32)
            out = apply_fn(params, b)
            return ((out[0, 0] * 1e-9).astype(jnp.bfloat16), out)

        init = (jnp.zeros((), jnp.bfloat16),
                jnp.zeros((BATCH, N), jnp.bfloat16))
        _, out = jax.lax.fori_loop(0, k, body, init)
        return out

    buggy = jax.jit(buggy)

    # direct per-call cost of ONE full forward (dispatch noise ~ms << cost)
    one = jax.jit(apply_fn)
    np.asarray(one(params, batch))
    t0 = time.perf_counter()
    for _ in range(2):
        np.asarray(one(params, batch))
    direct = (time.perf_counter() - t0) / 2

    fixed_slope = _slope(fixed, params, batch)
    buggy_slope = _slope(buggy, params, batch)

    # (b) the fixed loop pays the text-side matmul chain EVERY iteration:
    # its slope must be a real fraction of a directly-timed forward
    assert fixed_slope > 0.4 * direct, (
        f"fixed slope {fixed_slope * 1e3:.1f} ms vs direct "
        f"{direct * 1e3:.1f} ms: text side still being hoisted?")
    # (c) the old pattern is genuinely hoisted: its slope misses the text
    # branch almost entirely.  If this starts failing with slopes ~equal,
    # XLA stopped hoisting loop-invariant code — update benchloop.py's
    # docs, the fix stays correct either way.
    assert buggy_slope < 0.5 * fixed_slope, (
        f"buggy slope {buggy_slope * 1e3:.1f} ms vs fixed "
        f"{fixed_slope * 1e3:.1f} ms: hoisting no longer observed")


def test_matmul_loop_placement_on_toy_program():
    """The structural HLO guard: every dot must sit inside the TIMING
    while.  The buggy rounds-1-3 pattern hoists the text branch's scan to
    an entry-level sibling while — the walker must count those dots as
    OUTSIDE (a naive 'reachable from any while body' walk counts them as
    inside and guards nothing)."""
    from vault_tpu.utils.benchloop import matmul_loop_placement

    params, batch, apply_fn = _toy_model()
    fixed = jax.jit(make_chained_forward(apply_fn, (BATCH, N)))
    txt = fixed.lower(params, batch, jnp.int32(2)).compile().as_text()
    inside, outside = matmul_loop_placement(txt)
    assert outside == 0 and inside > 0, (inside, outside)

    def buggy(params, batch, k):
        def body(_, carry):
            fb, _ = carry
            b = dict(batch)
            b["pixel_values"] = batch["pixel_values"] + fb.astype(jnp.float32)
            out = apply_fn(params, b)
            return ((out[0, 0] * 1e-9).astype(jnp.bfloat16), out)

        init = (jnp.zeros((), jnp.bfloat16),
                jnp.zeros((BATCH, N), jnp.bfloat16))
        _, out = jax.lax.fori_loop(0, k, body, init)
        return out

    txt = (jax.jit(buggy).lower(params, batch, jnp.int32(2))
           .compile().as_text())
    inside_b, outside_b = matmul_loop_placement(txt)
    assert outside_b > 0, (
        "the buggy pattern was not flagged — either XLA stopped hoisting "
        f"(check the timing test above) or the walker regressed: "
        f"inside={inside_b} outside={outside_b}")


@pytest.mark.slow  # CLI subprocess rehearsal (two jit-compiling procs)
def test_check_bench_hlo_script():
    """The bench.py pre-timing guard end-to-end: the REAL chained VAuLT
    program structure (scripts/check_bench_hlo.py) must pass with
    feedback_batch engaged and FAIL when the feedback is bypassed —
    committed form of the round-4 audit's ad-hoc HLO walk
    (docs/BENCHMARKS.md: 18 matmul-bearing ops in-loop, buggy keeps 10)."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_bench_hlo.py")

    def run(**extra):
        env = {**os.environ, "BENCH_HLO_TINY": "1", **extra}
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run([sys.executable, script], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    good = run()
    assert good["ok"] and good["outside"] == 0 and good["inside"] > 0, good
    bad = run(BENCH_HLO_BUGGY="1")
    assert not bad["ok"] and bad["outside"] > 0, bad


def test_make_chained_forward_output_matches_single_forward():
    params, batch, apply_fn = _toy_model()
    chained = jax.jit(make_chained_forward(apply_fn, (BATCH, N)))
    out = np.asarray(chained(params, batch, jnp.int32(3)))
    ref = np.asarray(jax.jit(apply_fn)(params, batch))
    # int feedback is exactly 0 and float feedback is O(1e-9): the chained
    # output equals a single forward to bf16 tolerance
    np.testing.assert_allclose(out.astype(np.float32),
                               ref.astype(np.float32), rtol=0, atol=0.05)


def test_recorded_train_fields_keep_recipes_separate():
    """bench.py's driver-visible train fields (VERDICT r4 #5): the newest
    UNMERGED train measurement is the primary `train_pairs_per_sec` —
    merged training (`merge_to` set) is a deliberate recipe change and
    must not silently replace it — and the merged number rides in its own
    `train_merged_*` fields.  Reads the real docs/r*_tpu_results.jsonl
    series committed in this repo."""
    import importlib

    bench = importlib.import_module("bench")
    plain, merged, best_plain, best_merged = bench._last_train_records()
    assert plain is not None and plain.get("merge_to") is None
    fields = bench._recorded_train_fields()
    assert fields["train_pairs_per_sec"] == plain["value"]
    assert fields["train_best_pairs_per_sec"] >= plain["value"]
    assert best_plain.get("merge_to") is None
    if merged is not None:
        assert merged["merge_to"] is not None
        assert fields["train_merged_pairs_per_sec"] == merged["value"]
        assert fields["train_merged_to"] == merged["merge_to"]
        assert (fields["train_merged_best_pairs_per_sec"]
                >= merged["value"] - 1e-9)
