#!/bin/bash
# Round-5 TPU queue, part 8: the int8 ceiling question at Llama geometry.
#
# The w8a8 tower batch sweep (queue part 7) measured 213-219 implied
# TFLOP/s at b16/b32/b64 — flat, so compute-bound — against the 394 TOPS
# int8 nameplate.  Before any kernel work on the tower, settle WHERE the
# ceiling is: a bare SwiGLU matmul chain (gate/up/silu-mul/down + the
# dynamic requant the deployed path pays) at the tower's exact MLP
# geometry.  If the chain also clocks ~220, XLA's int8 lowering at these
# shapes IS the ceiling and the tower step is already at it (document,
# close).  If the chain clocks substantially higher, the gap lives in the
# model composition around the matmuls and is worth chasing.
#
# rows=640 is batch 16 x seq 40 (the probe geometry); rows=1280 checks
# whether the ceiling moves with rows the way the full step didn't.
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
run int8_ceiling_llama_mlp_r640 env PROBE_ROWS=640 PROBE_H=4096 \
    PROBE_I=14336 PROBE_SWIGLU=1 python scripts/probe_int8_matmul.py
run int8_ceiling_llama_mlp_r1280 env PROBE_ROWS=1280 PROBE_H=4096 \
    PROBE_I=14336 PROBE_SWIGLU=1 python scripts/probe_int8_matmul.py
note "queue part 8 complete -> $OUT"
