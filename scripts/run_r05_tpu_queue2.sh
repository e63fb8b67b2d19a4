#!/bin/bash
# Round-5 TPU queue, part 2 (VERDICT r4 #6): Llama-3-8B-geometry tower,
# w8 vs w8a8 from the SAME int8 arrays in one session (paired A/B +
# pooled divergence; scripts/probe_llama8b.py LLAMA_BENCH_QUANT=both).
# Biggest upload (8.3 GB) + two ~6-min compiles — runs alone.
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
run llama8b_w8_vs_w8a8 env LLAMA_BENCH_QUANT=both python scripts/probe_llama8b.py
note "queue part 2 complete -> $OUT"
