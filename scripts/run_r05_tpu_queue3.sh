#!/bin/bash
# Round-5 TPU queue, part 3: does trainable ToMe move the training batch
# sweet spot past 32?  Unmerged, batch 64 LOSES to 32 (454.7 vs 463.7 —
# remat recompute + HBM pressure, docs/BENCHMARKS.md grad-buffer table);
# merge87 removes ~44% of the joint sequence, which shrinks exactly the
# activation traffic that made b64 lose, while the ~9 ms batch-
# independent optimizer amortizes further.  Paired control first, same
# session, shipped TrainArgs defaults throughout.
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
run train_defaults_b64 env TRAIN_BENCH_BATCH=64 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 \
    python scripts/train_bench.py
run train_defaults_merge87_b64 env TRAIN_BENCH_BATCH=64 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 TRAIN_BENCH_MERGE_TO=87 \
    python scripts/train_bench.py
note "queue part 3 complete -> $OUT"
