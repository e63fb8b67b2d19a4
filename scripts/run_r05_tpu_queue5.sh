#!/bin/bash
# Round-5 TPU queue, part 5: does merge87 move the SERVING batch sweet
# spot too?  Training moved 32 -> 64 under merging (queue parts 3-4);
# serving's unmerged sweet spot is b16 (b32 measured 2012 vs 2126 —
# bigger score/dropout working sets, no optimizer to amortize).  Merged
# serving shrinks exactly that per-step working set, so b32/b64 may beat
# the 3429 pairs/s b16 headline.  b16 control first, same session.
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
run serve_merge87_b16_ctl env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_merge87_b32 env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=32 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_merge87_b64 env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=64 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
note "queue part 5 complete -> $OUT"
