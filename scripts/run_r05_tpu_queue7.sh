#!/bin/bash
# Round-5 TPU queue, part 7: the two batch curves still rising at their
# last measured point.
#   (a) Serving b128: w8a8+merge87 was still climbing at b64 (3069 ->
#       3396 -> 4011 pairs/s, +18% for the last doubling) and bf16+merge87
#       peaked-or-not at b64 (3631); training's b128 leg regressed because
#       remat recompute took over, but serving has no remat, so b128 may
#       raise the high-water mark again.  b64 control first, same session.
#   (b) Llama-8B tower batch sweep: the w8a8 leg measured only 1.153x at
#       batch 16 because B*L=640 rows batch-starve the 4096/14336-wide
#       matmuls (BENCHMARKS: "chasing the remaining gap means bigger
#       batch").  8.27 GB of int8 weights leave ~7 GB for activations, so
#       b32/b64 fit easily; per-chip pairs/s should rise toward the int8
#       double-rate bound as rows amortize the weight loads.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/r05_tpu_results.jsonl}"
note() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >&2; }
run() {
  local tag="$1"; shift
  note "$tag"
  local ts; ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  "$@" 2>>"$OUT.err" | while IFS= read -r line; do
    case "$line" in
      "{"*) printf '{"tag": "%s", "ts": "%s", %s\n' \
              "$tag" "$ts" "${line#\{}" >> "$OUT" ;;
    esac
  done
}
run serve_w8a8_merge87_b64_ctl env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp \
    PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_BATCHES=64 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_w8a8_merge87_b128 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp \
    PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_BATCHES=128 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_merge87_b128 env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=128 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run llama8b_w8a8_b32 env LLAMA_BENCH_QUANT=w8a8 LLAMA_BENCH_BATCH=32 \
    python scripts/probe_llama8b.py
run llama8b_w8a8_b64 env LLAMA_BENCH_QUANT=w8a8 LLAMA_BENCH_BATCH=64 \
    python scripts/probe_llama8b.py
note "queue part 7 complete -> $OUT"
