#!/bin/bash
# Round-5 TPU queue, part 10: the scan-boundary pipelining hypothesis.
#
# Queue part 8 put the bare int8 SwiGLU chain at 328-348 TFLOP/s while
# the full tower step implies 213-219.  One structural difference: the
# probe chain is a flat sequence of dots, while the tower runs its 32
# layers under lax.scan — each iteration dynamic-slices its weights from
# the stacked (32, ...) arrays behind a hard loop boundary, which can
# block XLA from overlapping the next layer's weight fetches with the
# current layer's matmuls.  lax.scan(unroll=4) is the cheapest probe of
# that hypothesis: semantics-preserving (parity-tested), 4 body copies
# per while iteration.  Tower-only w8a8, same geometry as queue 9's
# control leg — compare directly against llama8b_tower_only_b16.
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
run llama8b_tower_only_b16_unroll4 env LLAMA_BENCH_QUANT=w8a8 \
    LLAMA_BENCH_TOWER_ONLY=1 LLAMA_BENCH_UNROLL=4 \
    python scripts/probe_llama8b.py
note "queue part 10 complete -> $OUT"
