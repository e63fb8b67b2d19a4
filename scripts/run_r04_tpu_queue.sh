#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 #1/#5/#7): run EVERYTHING the
# round needs from the tunnel in ONE serialized session, paired controls
# first, so tunnel flakes can't split an A/B across sessions
# (docs/NOTES.md: identical HEAD measured 1450 vs 2130 pairs/s in
# different sessions — only same-session pairs are trustworthy).
#
# Usage (the tunnel must be UP — probe first):
#   bash scripts/run_r04_tpu_queue.sh [outfile]
# Appends JSON lines (one per measurement, tagged) to
# docs/r04_tpu_results.jsonl by default.  ~6 min compile per DISTINCT
# program; expect the full queue to take a few hours.  Re-runnable: each
# line is timestamped, later lines supersede earlier ones.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/r04_tpu_results.jsonl}"

note() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >&2; }
run() { # run <tag> <cmd...>: append each stdout JSON line tagged
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

# 0. control: the production forward bench (captures fwd_mfu_pct; also the
#    BENCH_r04 shape) — run FIRST so the round has its headline number even
#    if the tunnel dies mid-queue
run bench_control python bench.py

# 1. ToMe serving A/B, same session as the control above:
#    {bf16, w8a8} x {no merge, merge@0, merge@4} at batch 16
run bf16_nomerge   env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 python scripts/perf_sweep.py
run bf16_merge87L0 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run bf16_merge87L4 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py
run w8a8_nomerge   env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 python scripts/perf_sweep.py
run w8a8_merge87L0 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run w8a8_merge87L4 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py

# 2. trainable-ToMe train-step A/B (batch 16, paired control first)
run train_control  env TRAIN_BENCH_BATCH=16 python scripts/train_bench.py
run train_merge87  env TRAIN_BENCH_BATCH=16 TRAIN_BENCH_MERGE_TO=87 python scripts/train_bench.py

# 3. batch-32 extension (serving throughput peaks at b32; train b32 is the
#    single-chip high-water mark) — after the core A/Bs so a short tunnel
#    window still completes the verdict items first
run bf16_nomerge_b32   env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=32 python scripts/perf_sweep.py
run bf16_merge87L4_b32 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=32 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py
run train_control_b32  env TRAIN_BENCH_BATCH=32 python scripts/train_bench.py
run train_merge87_b32  env TRAIN_BENCH_BATCH=32 TRAIN_BENCH_MERGE_TO=87 python scripts/train_bench.py

# 4. BASELINE config 5 at honest scale: Llama-3-8B-geometry tower (w8) +
#    ViLT co-encoder, one chip (LAST: biggest upload, longest compile)
run llama8b python scripts/probe_llama8b.py

note "queue complete -> $OUT"
