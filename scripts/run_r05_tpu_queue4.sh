#!/bin/bash
# Round-5 TPU queue, part 4: merged-training batch scaling past the new
# b64 sweet spot (936 pairs/s, queue part 3).  Merged b64 is re-run as
# the same-session control; if b128 keeps scaling, the optimizer's
# batch-independent ~9 ms amortizes further — if not, b64 is the spot
# and the curve is settled.
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
run train_defaults_merge87_b64_ctl env TRAIN_BENCH_BATCH=64 \
    TRAIN_BENCH_REMAT=1 TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 \
    TRAIN_BENCH_MERGE_TO=87 python scripts/train_bench.py
run train_defaults_merge87_b128 env TRAIN_BENCH_BATCH=128 \
    TRAIN_BENCH_REMAT=1 TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 \
    TRAIN_BENCH_MERGE_TO=87 python scripts/train_bench.py
note "queue part 4 complete -> $OUT"
