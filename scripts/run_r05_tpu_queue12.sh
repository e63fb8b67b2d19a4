#!/bin/bash
# Round-5 TPU queue, part 12: the GQA Pallas kernel A/B.
#
# The flat-layer ladder (queue 11) put the attention block at 0.368
# ms/layer (full 1.3225 - mlp 0.9541) = 11.8 ms across the 32-layer
# tower.  fused_attention_gqa moves the fp32 score tile into VMEM with
# the q heads folded onto their K/V groups (dotbatch shape — the fine
# (B,H) grid measured slower back in round 2).  A/B on the flat layer
# first (cheap: single-layer weights, one compile each); the tower leg
# only if the layer leg wins.
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
run llama_layer_flat_pallas_attn env LLAMA_LAYER_ATTN=pallas \
    python scripts/probe_llama_layer.py
# same-session control re-run (the 1.3225 xla number came from an
# earlier session; rule out drift)
run llama_layer_flat_xla_ctl python scripts/probe_llama_layer.py
note "queue part 12 complete -> $OUT"
