#!/bin/bash
# Round-5 TPU queue, part 6: does w8a8 compose with merge87 at the new
# batch-64 serving sweet spot (queue part 5: bf16+merge87 b64 = 3630.8
# pairs/s)?  Unmerged, the int8 row-tiled kernels LOSE with batch (2432
# b16 -> 2111 b64: per-row dynamic quantization scales linearly while
# matmul stops being the bottleneck) — but merging removes 44% of the
# rows, so the penalty shrinks too.  b16 control first, same session,
# same impl string as the round-4 w8a8 legs (fuselnqkv+fusemlp).
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
run serve_w8a8_merge87_b16_ctl env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp \
    PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_BATCHES=16 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_w8a8_merge87_b32 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp \
    PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_BATCHES=32 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
run serve_w8a8_merge87_b64 env PERF_SWEEP_IMPLS=fuselnqkv+fusemlp \
    PERF_SWEEP_QUANT=w8a8 PERF_SWEEP_BATCHES=64 \
    PERF_SWEEP_MERGE_TO=87 python scripts/perf_sweep.py
note "queue part 6 complete -> $OUT"
