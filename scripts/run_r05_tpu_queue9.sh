#!/bin/bash
# Round-5 TPU queue, part 9: decompose the Llama-8B step.
#
# Queue part 8 showed the bare int8 SwiGLU chain at the tower's MLP
# geometry runs at 328 implied TFLOP/s — far above the full step's
# 213-219 — so the gap lives in the composition, not the int8 lowering.
# This leg times the TOWER ALONE (llama_apply + LM projection, no image
# patches / ViLT co-encoder), both quant modes from the same int8 arrays:
#   full(48.84ms w8a8 b16) - tower_only  =  ViLT-side + glue cost
#   tower_only - matmul floor            =  in-tower non-matmul overhead
# which decides whether kernel work should target the tower layer
# (rope/rms/GQA-repeat/requant) or the co-encoder side.
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
run llama8b_tower_only_b16 env LLAMA_BENCH_QUANT=both \
    LLAMA_BENCH_TOWER_ONLY=1 python scripts/probe_llama8b.py
# Full step at HEAD: the tree now runs grouped GQA (no materialized K/V
# repeat), so this leg is both the decomposition's full-step side AND the
# GQA-rewrite A/B against queue 7's repeat-form numbers (w8 56.30 ms,
# w8a8 48.84 ms at b16).
run llama8b_full_b16_gqa env LLAMA_BENCH_QUANT=both \
    python scripts/probe_llama8b.py
note "queue part 9 complete -> $OUT"
