#!/bin/bash
# Round-5 TPU queue, part 11: flat-layer vs in-scan layer cost.
# See scripts/probe_llama_layer.py — separates "stacked-weight slicing /
# scan scheduling" from "layer-internal elementwise" for the remaining
# ~0.45 ms/layer gap (in-model 1.32 ms/layer vs ~0.9 ms composition
# floor).  unroll=4 already measured WORSE, so if the flat layer is
# fast, the fix direction is how weights are laid out for the scan, not
# the layer math.
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
run llama_layer_flat_b16 python scripts/probe_llama_layer.py
note "queue part 11 complete -> $OUT"
# appended: MLP-only flat layer (attention block = full - mlp)
run llama_layer_flat_mlp_b16 env LLAMA_LAYER_MODE=mlp \
    python scripts/probe_llama_layer.py
note "queue part 11b complete -> $OUT"
