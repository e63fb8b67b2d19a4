#!/bin/bash
# Round-4 TPU queue, part 2: RE-MEASURE every forward leg after the
# loop-invariant-hoisting fix (vault_tpu/utils/benchloop.py).  The first
# queue's forward numbers excluded the text tower — XLA hoisted it out of
# the timing loop because only pixel_values was loop-carried; the Llama-8B
# leg's physically impossible 6.91 ms/step exposed it.  Train legs
# (train_control*, train_merge87*) carried the updated params through the
# loop and were measured correctly: NOT re-run.
#
# Usage: bash scripts/run_r04_tpu_queue2.sh [outfile]
# Appends tagged JSON lines to docs/r04_tpu_results.jsonl; *_v2 tags
# supersede the same-named tainted legs.

set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/r04_tpu_results.jsonl}"

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

# control first: headline BENCH_r04 shape with the corrected loop
run bench_control_v2 python bench.py

run bf16_nomerge_v2   env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 python scripts/perf_sweep.py
run bf16_merge87L0_v2 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run bf16_merge87L4_v2 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py
run w8a8_nomerge_v2   env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 python scripts/perf_sweep.py
run w8a8_merge87L0_v2 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run w8a8_merge87L4_v2 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp PERF_SWEEP_BATCHES=16 PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py

run bf16_nomerge_b32_v2   env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=32 python scripts/perf_sweep.py
run bf16_merge87L4_b32_v2 env PERF_SWEEP_IMPLS=1 PERF_SWEEP_BATCHES=32 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py

# LAST (biggest upload): Llama-8B probe, now with the full text tower in
# the slope and the int8-peak sanity guard
run llama8b_v2 python scripts/probe_llama8b.py

note "queue2 complete -> $OUT"
