#!/bin/bash
# Round-5 TPU queue, part 13: the fused w8a8 SwiGLU kernel A/B.
#
# The flat-layer ladder (parts 10-12) localized the 8B tower's overhead
# INSIDE the layer: MLP block 0.954 ms vs a 0.687 ms bare-chain floor,
# and neither scan unrolling nor a Pallas attention kernel moved it.
# ops/pallas_swiglu.py fuses RMSNorm -> quant -> gate/up int8 matmuls ->
# silu*mul -> per-(row,i-tile) requant -> down int8 matmul -> residual,
# streaming the 3x56 MB weights through VMEM i-tile by i-tile so the
# (rows, 14336) intermediate never touches HBM.  Ladder: MLP-only flat
# layer (cheapest compile) -> full flat layer -> the full 8B step with
# a same-session XLA-MLP control.  Every flag combination below is
# CPU-smoked by tests/test_bench_scripts_smoke.py (pallas_mlp ids).
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
run llama_layer_flat_mlp_pallas \
    env LLAMA_LAYER_MODE=mlp LLAMA_LAYER_MLP=pallas \
    python scripts/probe_llama_layer.py
run llama_layer_flat_full_pallas_mlp \
    env LLAMA_LAYER_MLP=pallas \
    python scripts/probe_llama_layer.py
# full 8B step: fused-SwiGLU leg, then a same-session XLA-MLP control
run llama8b_full_b16_pallas_mlp \
    env LLAMA_BENCH_QUANT=w8a8 LLAMA_BENCH_MLP=pallas \
    python scripts/probe_llama8b.py
run llama8b_full_b16_mlp_ctl \
    env LLAMA_BENCH_QUANT=w8a8 \
    python scripts/probe_llama8b.py
note "queue part 13 complete -> $OUT"
