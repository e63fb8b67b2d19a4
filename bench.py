"""Benchmark: VAuLT forward image-text pairs/sec/chip on TPU vs the HF
PyTorch CPU baseline (BASELINE.json: target >= 5x HF baseline pairs/sec).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

Measurement method: the TPU here is reached through a high-latency tunnel
(~40ms RTT; 20+MB batch uploads cost ~0.5s), so per-call wall timing measures
the tunnel, not the chip.  We instead jit a ``lax.fori_loop`` that chains K
forwards (each iteration's input is perturbed by the previous pooled output,
creating a true data dependency so nothing can be elided/cached) and report
the K_hi-vs-K_lo slope: (t_hi - t_lo) / (K_hi - K_lo) per step — pure
device-side throughput, transfers and RTT cancelled.

Both sides run the same geometry: bert-base-uncased tower (12L) + vilt-b32
co-encoder (12L), a batch of landscape image-text pairs at the canvas the
DEFAULT processor path produces for it — VaultProcessor's canvas="auto"
buckets a landscape batch to (384, 608) (vault_tpu/data/image.py
DEFAULT_CANVAS/bucket_canvas; the 608x608 worst case measured +13%,
docs/BENCHMARKS.md "bench geometry" note).  The TPU side runs with the
production default kernels (use_pallas="auto" -> fused QKV + fused
LN->MLP->residual).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

BATCH = 16
SEQ = 40
# what VaultProcessor(canvas="auto") emits for a landscape batch: the image
# fills the bucketed (384, 608) canvas, mask all-valid
CANVAS = (384, 608)
K_LO, K_HI = 2, 22
TORCH_ITERS = 3
TORCH_BATCH = 4
# matmul FLOPs of one full forward at this geometry (2·M·N·K counting,
# B=16, L=256, 228-patch conv — derivation in docs/BENCHMARKS.md "MFU
# accounting") and the v5e bf16 peak; vs_baseline is environment-bound
# (torch on this 1-CPU host), so the JSON also carries the
# hardware-absolute number: fraction of the chip's bf16 peak sustained.
FWD_FLOPS = 861e9
PEAK_TFLOPS = float(os.environ.get("VAULT_BF16_PEAK_TFLOPS", "197"))

# the default backend probe: one trivial device op.  Overridable so the
# outage JSON path is testable by forcing a failing/hanging probe
# (tests/test_bench_outage.py).
PROBE_CODE = ("import jax; import numpy as np; "
              "print(float(np.asarray(jax.numpy.ones((4, 4)).sum())))")


def probe_backend(timeout_s: float) -> bool:
    """True iff the default (tunnel TPU) backend runs a tiny op within
    ``timeout_s``.  Runs in a SUBPROCESS because the axon outage has two
    observed modes (docs/NOTES.md): an instant ``Unable to initialize
    backend 'axon': UNAVAILABLE`` (raises, rc!=0) and a silent >4-min hang
    on a trivial op (only killable from outside the process)."""
    import subprocess

    code = os.environ.get("VAULT_BENCH_PROBE_CODE", PROBE_CODE)
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def hlo_structure_check():
    """Pre-timing structural guard (scripts/check_bench_hlo.py): compile
    the bench's chained-program structure on CPU and verify no matmul was
    hoisted out of the timing while.  The 95%-MFU guard below cannot catch
    a ~13%-scale exclusion — exactly the rounds-1-3 text-tower hoist — so
    this is the detector that actually covers that failure mode.  Returns
    the parsed {"ok", "inside", "outside"} record, or None if the check
    itself could not run (never blocks the bench).  Gate:
    VAULT_BENCH_HLO_CHECK=0 skips."""
    import subprocess

    if os.environ.get("VAULT_BENCH_HLO_CHECK", "1") == "0":
        return None
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "check_bench_hlo.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force the CPU backend
    env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run([sys.executable, script], env=env,
                           capture_output=True, text=True, timeout=600)
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"hlo structure check did not run: {e}", file=sys.stderr)
        return None


def backend_available() -> bool:
    """Bounded-retry probe.  Keeps the bench from ever dying with a raw
    traceback on a tunnel outage (BENCH_r03 was exactly that): a dead
    backend must yield ONE diagnosable in-band JSON line instead."""
    timeout_s = float(os.environ.get("VAULT_BENCH_PROBE_TIMEOUT_S", "270"))
    retries = int(os.environ.get("VAULT_BENCH_PROBE_RETRIES", "2"))
    backoff_s = float(os.environ.get("VAULT_BENCH_PROBE_BACKOFF_S", "30"))
    for attempt in range(retries + 1):
        if probe_backend(timeout_s):
            return True
        print(f"backend probe failed (attempt {attempt + 1}/{retries + 1})",
              file=sys.stderr)
        if attempt < retries:
            time.sleep(backoff_s)
    return False


def _pixel_mask(np_mod, batch, dtype=None):
    return np_mod.ones((batch, *CANVAS), dtype or np_mod.int32)


def bench_tpu():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vault_tpu.models.vault import init_vault, vault_apply
    from vault_tpu.presets import vault_base

    cfg = vault_base("bert-base-uncased")
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size,
                                              (BATCH, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((BATCH, SEQ), jnp.int32),
        "token_type_ids": jnp.zeros((BATCH, SEQ), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(BATCH, 3, *CANVAS)),
                                    jnp.bfloat16),
        "pixel_mask": jnp.asarray(_pixel_mask(np, BATCH)),
    }

    # every input must be loop-carried or XLA hoists its consumers out of
    # the timing loop — rounds 1-3 fed back pixel_values only and the
    # whole text tower was hoisted (vault_tpu/utils/benchloop.py)
    from vault_tpu.utils.benchloop import make_chained_forward

    chained = make_chained_forward(
        lambda p, b: vault_apply(p, cfg, **b).pooler_output,
        (BATCH, cfg.vilt.hidden_size))

    import jax
    run = jax.jit(chained)

    np.asarray(run(params, batch, jnp.int32(1)))  # compile once

    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(params, batch, jnp.int32(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(K_LO), timed(K_HI)
    per_step = (t_hi - t_lo) / (K_HI - K_LO)
    return BATCH / per_step


def bench_torch_baseline():
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    from transformers import BertConfig, BertModel, ViltConfig, ViltModel

    bert = BertModel(BertConfig(), add_pooling_layer=False).eval()
    vilt = ViltModel(ViltConfig()).eval()
    vilt.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"

    rng = np.random.default_rng(0)
    ids = torch.tensor(rng.integers(0, 30522, (TORCH_BATCH, SEQ)))
    mask = torch.ones(TORCH_BATCH, SEQ, dtype=torch.long)
    types = torch.zeros(TORCH_BATCH, SEQ, dtype=torch.long)
    pixels = torch.tensor(rng.normal(size=(TORCH_BATCH, 3, *CANVAS)).astype(np.float32))
    pmask = torch.tensor(_pixel_mask(np, TORCH_BATCH, np.int64))

    def fwd():
        with torch.no_grad():
            emb = bert(input_ids=ids, attention_mask=mask,
                       token_type_ids=types).last_hidden_state
            return vilt(inputs_embeds=emb, attention_mask=mask,
                        token_type_ids=types, pixel_values=pixels,
                        pixel_mask=pmask).pooler_output

    fwd()  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_ITERS):
        fwd()
    dt = time.perf_counter() - t0
    return TORCH_BATCH * TORCH_ITERS / dt


def bench_host_preprocess():
    """p50 host-side process+encode latency per pair (tokenize + image
    resize/normalize/pad) — the preprocessing half of BASELINE.md's p50
    process+encode metric; the device half is the step time above."""
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import build_tokenizer

    proc = VaultProcessor(build_tokenizer("bert-base-uncased"))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    times = []
    proc([img], ["a bunch of cats laying on a couch"])  # warm (jit resize)
    for _ in range(20):
        t0 = time.perf_counter()
        proc([img], ["a bunch of cats laying on a couch"])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1e3


def _last_recorded_bench():
    """Newest BENCH_r*.json value at the repo root, or None — the flake
    reference point (docs/NOTES.md: identical HEAD measured 1450 then 2130
    pairs/s through the tunnel; a silent flake reads as a regression)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            # the round driver wraps our JSON line under "parsed"
            val = rec.get("value", rec.get("parsed", {}).get("value"))
        except Exception:
            continue
        if val is not None and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), float(val))
    return best[1] if best else None


def _last_train_records():
    """Newest train-bench measurements from the docs/r*_tpu_results.jsonl
    series (scripts/train_bench.py via the round queue scripts), so the
    driver-visible BENCH record carries BOTH axes of the BASELINE north
    star — the r04 verdict noted a reader of BENCH_r*.json alone could
    not see training progress.  Returns a 4-tuple (newest unmerged,
    newest merged, best unmerged, best merged) — merged training
    (`merge_to` set) is a deliberate recipe change, so it must not
    silently replace the faithful-recipe number as "the" training
    throughput, and the newest leg of a batch sweep must not read as a
    regression of the high-water mark.  Any slot may be None."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    newest = {False: None, True: None}
    best = {False: None, True: None}
    for path in glob.glob(os.path.join(here, "docs",
                                       "r*_tpu_results.jsonl")):
        try:
            with open(path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if (rec.get("metric")
                            == "vault_train_step_pairs_per_sec_per_chip"
                            and rec.get("value") is not None):
                        merged = rec.get("merge_to") is not None
                        cur = newest[merged]
                        if cur is None or rec.get("ts", "") > cur.get(
                                "ts", ""):
                            newest[merged] = rec
                        if (best[merged] is None
                                or rec["value"] > best[merged]["value"]):
                            best[merged] = rec
        except OSError:
            continue
    return newest[False], newest[True], best[False], best[True]


def _recorded_serve_fields():
    """Best LEVERED serving throughput from the recorded series
    (scripts/perf_sweep.py rows: quant/merge sweeps via the round queue
    scripts), so BENCH_r*.json carries the serving axis too — the main
    `value` is the production-default forward; the levers (int8, ToMe,
    batch) are deliberate accuracy trade-offs and must stay a separate,
    config-disclosed field (round-5 high-water: w8a8+merge87@0 at batch
    64).  Rows are recognized by shape (pairs_per_sec + pallas, no
    `metric` key) and only count as levered when quant or merge is on."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "docs",
                                       "r*_tpu_results.jsonl")):
        try:
            with open(path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if ("metric" in rec or "pallas" not in rec
                            or rec.get("pairs_per_sec") is None):
                        continue
                    levered = (rec.get("merge_to") is not None
                               or str(rec.get("quant", "0")) not in
                               ("0", "None"))
                    if not levered:
                        continue
                    if best is None or rec["pairs_per_sec"] > best[
                            "pairs_per_sec"]:
                        best = rec
        except OSError:
            continue
    if best is None:
        return {}
    return {
        "serve_levered_best_pairs_per_sec": best["pairs_per_sec"],
        "serve_levered_best_config": {
            k: best.get(k) for k in ("batch", "quant", "merge_to",
                                     "merge_at_layer", "pallas")},
        "serve_levered_best_source": f"recorded:{best.get('tag', '?')}@"
                                     f"{best.get('ts', '?')}",
    }


def _recorded_llama_fields():
    """Best Llama-3-8B-geometry tower throughput from the recorded series
    (scripts/probe_llama8b.py via the round queue scripts) — the fourth
    axis of the BASELINE story (config 5: batched big-tower inference),
    so BENCH_r*.json discloses it alongside forward/train/serve.  The
    tower string carries the quant mode (w8 vs w8a8 — different accuracy
    budgets), so the config is disclosed with the number.

    Only POST-AUDIT rows are eligible: the round-4 measurement audit
    retracted the pre-audit probe reading (6.91 ms/step — the text-tower
    hoisting bug), and the retracted row is still in the r04 series with
    no in-band marker.  The post-audit probe always emits
    `implied_tflops_per_sec` and self-flags impossible readings, so
    requiring that field (and that it not exceed the int8 device peak)
    excludes retracted/ hoisted rows by construction."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "docs",
                                       "r*_tpu_results.jsonl")):
        try:
            with open(path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if (rec.get("metric")
                            != "llama8b_vault_forward_pairs_per_sec_per_chip"
                            or rec.get("value") is None):
                        continue
                    tf = rec.get("implied_tflops_per_sec")
                    if tf is None or tf > 400:  # v5e int8 peak ~394
                        continue
                    if best is None or rec["value"] > best["value"]:
                        best = rec
        except OSError:
            continue
    if best is None:
        return {}
    return {
        "llama8b_best_pairs_per_sec": best["value"],
        "llama8b_best_config": {
            k: best.get(k) for k in ("batch", "tower", "ms_per_step")
        } | {k: best[k] for k in ("attn_impl", "mlp_impl", "scan_unroll")
             if k in best},  # non-default impls disclose themselves
        "llama8b_best_source": f"recorded:{best.get('tag', '?')}@"
                               f"{best.get('ts', '?')}",
    }


def bench_train_live():
    """Opt-in live training leg (VAULT_BENCH_TRAIN=1): run the train bench
    at the SHIPPED TrainArgs defaults (remat + bf16 optimizer moments +
    rbg PRNG — training/trainer.py) in a subprocess and return its JSON
    record.  One more ~6-min tunnel compile; the default bench stays
    forward-only so the driver's end-of-round run keeps its budget."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ,
               TRAIN_BENCH_BATCH=os.environ.get("VAULT_BENCH_TRAIN_BATCH",
                                                "32"),
               TRAIN_BENCH_REMAT="1", TRAIN_BENCH_OPT_DTYPE="bfloat16",
               TRAIN_BENCH_RBG="1")
    # pin EVERY recipe knob, not just the three defaults above: a shell
    # that still exports e.g. TRAIN_BENCH_MERGE_TO=87 from a queue run
    # must not get the merged recipe recorded as the faithful live number
    for knob in ("TRAIN_BENCH_MERGE_TO", "TRAIN_BENCH_MERGE_LAYER",
                 "TRAIN_BENCH_NODROP", "TRAIN_BENCH_GRAD_BF16",
                 "TRAIN_BENCH_CANVAS", "TRAIN_BENCH_PRECAST"):
        env.pop(knob, None)
    r = subprocess.run([sys.executable,
                        os.path.join(here, "scripts", "train_bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=float(os.environ.get(
                           "VAULT_BENCH_TRAIN_TIMEOUT_S", "1500")))
    if r.returncode != 0:
        raise RuntimeError(f"train bench failed: {r.stderr[-500:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def _recorded_train_fields():
    plain, merged, best_plain, best_merged = _last_train_records()
    out = {}
    if plain is not None:
        out.update(train_pairs_per_sec=plain.get("value"),
                   train_batch=plain.get("batch"),
                   train_source=f"recorded:{plain.get('tag', '?')}@"
                                f"{plain.get('ts', '?')}")
    if merged is not None:
        out.update(train_merged_pairs_per_sec=merged.get("value"),
                   train_merged_to=merged.get("merge_to"),
                   train_merged_source=f"recorded:{merged.get('tag', '?')}@"
                                       f"{merged.get('ts', '?')}")
    # the newest record is whatever leg ran last (could be a sweep point,
    # e.g. the b64 control that loses to b32); the high-water mark per
    # recipe is the headline a reader wants, tag disclosing its config
    if best_plain is not None:
        out.update(train_best_pairs_per_sec=best_plain["value"],
                   train_best_source=f"recorded:{best_plain.get('tag', '?')}"
                                     f"@{best_plain.get('ts', '?')}")
    if best_merged is not None:
        out.update(
            train_merged_best_pairs_per_sec=best_merged["value"],
            train_merged_best_source=f"recorded:"
                                     f"{best_merged.get('tag', '?')}@"
                                     f"{best_merged.get('ts', '?')}")
    return out


def _train_fields():
    """The training-throughput fields for the output record: the recorded
    series always (merged-recipe + high-water-mark axes included), with
    the primary number replaced by a fresh measurement when
    VAULT_BENCH_TRAIN=1 — a live reading must not DROP the other fields."""
    fields = _recorded_train_fields()
    if os.environ.get("VAULT_BENCH_TRAIN", "0") == "1":
        try:
            rec = bench_train_live()
            fields.update(train_pairs_per_sec=rec["value"],
                          train_batch=rec.get("batch"),
                          train_source="live")
        except Exception as e:
            print(f"live train bench failed: {e}", file=sys.stderr)
    return fields


def main():
    if not backend_available():
        # tunnel outage: emit the in-band outage record (still one JSON
        # line, parseable) instead of an uncaught backend traceback, with
        # the newest recorded round value for context — plus the host
        # preprocess leg, which is CPU-measurable even during an outage,
        # so the record still carries one fresh number
        try:
            host_ms = round(bench_host_preprocess(), 2)
        except Exception:
            host_ms = None
        print(json.dumps({
            "metric": "vault_forward_pairs_per_sec_per_chip",
            "value": None,
            "unit": "pairs/sec/chip",
            "vs_baseline": None,
            "error": "tpu_unavailable",
            "last_good": _last_recorded_bench(),
            "p50_host_process_encode_ms": host_ms,
            # never attempt the live train leg on a dead backend — it
            # would hang to its timeout; the recorded value still ships
            **_recorded_train_fields(),
            **_recorded_serve_fields(),
            **_recorded_llama_fields(),
        }))
        return
    hlo = hlo_structure_check()
    if hlo is not None and not hlo.get("ok"):
        print(f"WARNING: {hlo.get('outside')} matmul-bearing ops sit "
              "OUTSIDE the timing loop (loop-invariant hoisting) — the "
              "reading below excludes part of the model", file=sys.stderr)
    tpu_pps = bench_tpu()
    # tunnel-flake guard: if this reading is >10% below the last recorded
    # round's value, measure once more and report BOTH readings in-band so a
    # flaked run is visibly flagged instead of masquerading as a regression
    retried, first_attempt = False, None
    last = _last_recorded_bench()
    if last is not None and tpu_pps < 0.9 * last:
        retried, first_attempt = True, tpu_pps
        tpu_pps = max(tpu_pps, bench_tpu())
    try:
        base_pps = bench_torch_baseline()
    except Exception as e:
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        base_pps = None
    try:
        p50_ms = bench_host_preprocess()
    except Exception as e:
        print(f"preprocess measurement failed: {e}", file=sys.stderr)
        p50_ms = None
    ratio = (tpu_pps / base_pps) if base_pps else None
    out = {
        "metric": "vault_forward_pairs_per_sec_per_chip",
        "value": round(tpu_pps, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(ratio, 2) if ratio else None,
        "p50_host_process_encode_ms": round(p50_ms, 2) if p50_ms else None,
        "device_ms_per_step_batch16": round(16 / tpu_pps * 1e3, 2),
        "fwd_mfu_pct": round(
            100 * FWD_FLOPS * (tpu_pps / BATCH) / (PEAK_TFLOPS * 1e12), 1),
        # the other axis of the BASELINE north star (data-parallel
        # fine-tuning): live when VAULT_BENCH_TRAIN=1, else the newest
        # queue-recorded train-bench value (r04 verdict #5)
        **_train_fields(),
        # the serving axis: best recorded levered config, config disclosed
        **_recorded_serve_fields(),
        # the big-tower axis (BASELINE config 5): best recorded Llama probe
        **_recorded_llama_fields(),
    }
    if retried:
        out["retried"] = True
        out["first_attempt"] = round(first_attempt, 2)
    # a skipped structural check must be distinguishable from a passing
    # one (the guard exists to catch SILENT exclusions — it must not be
    # silently absent itself): hlo_checked is always present
    out["hlo_checked"] = bool(hlo is not None and "ok" in hlo)
    if hlo is not None and hlo.get("ok"):
        out["hlo_matmuls_in_loop"] = hlo.get("inside")
    if hlo is not None and not hlo.get("ok"):
        out["suspect"] = (f"{hlo.get('outside')} matmuls hoisted outside "
                          "the timing loop")
        out["hlo_matmuls_outside_loop"] = hlo.get("outside")
    # physical-sanity guard: a reading above the chip's peak means the
    # measurement excluded work (e.g. loop-invariant hoisting, the round-4
    # bug benchloop.py documents) — flag it in-band, never record silently
    if out["fwd_mfu_pct"] > 95:
        out["suspect"] = "; ".join(filter(None, [
            out.get("suspect"), "implied MFU exceeds plausible peak"]))
        print(f"WARNING: fwd_mfu_pct={out['fwd_mfu_pct']} is implausible; "
              "part of the model was likely optimized out of the timing "
              "loop", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
