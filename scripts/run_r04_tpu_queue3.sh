#!/bin/bash
# Round-4 TPU queue, part 3 (after queue2's hoisting-fix re-measures):
#  - the bf16 ToMe A/B at the PRODUCTION impl: queue1/2 ran it at
#    PERF_SWEEP_IMPLS=1 (Pallas batched attention, the known-slow core,
#    ~11 ms) instead of "auto" (fuseqkv+fusemlp, ~7.6 ms) — the serving
#    recommendation must come from the default path
#  - one honest pure-XLA row: IMPLS=0 is the ONE config with no Pallas
#    custom-call in the text tower, i.e. the config where pre-fix numbers
#    really were hoisting-tainted; quantifies the historical bias
#
# Usage: bash scripts/run_r04_tpu_queue3.sh [outfile]

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

# production-bf16 merge A/B (paired, same session)
run auto_nomerge      env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 python scripts/perf_sweep.py
run auto_merge87L0    env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run auto_merge87L4    env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py
run auto_nomerge_b32  env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=32 python scripts/perf_sweep.py
run auto_merge87L4_b32 env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=32 PERF_SWEEP_MERGE_TO=87 PERF_SWEEP_MERGE_LAYER=4 python scripts/perf_sweep.py

# honest pure-XLA row (the historically hoisting-tainted config)
run xla_nomerge       env PERF_SWEEP_IMPLS=0 PERF_SWEEP_BATCHES=16 python scripts/perf_sweep.py

note "queue3 complete -> $OUT"
