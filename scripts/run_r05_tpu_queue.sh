#!/bin/bash
# Round-5 TPU measurement queue, part 1 (VERDICT r4 #1a/#5/#7): one
# serialized tunnel session, paired controls first (docs/NOTES.md: only
# same-session A/Bs are trustworthy through the tunnel).
#
#   bash scripts/run_r05_tpu_queue.sh [outfile]
#
# Appends tagged JSON lines to docs/r05_tpu_results.jsonl.  ~6 min compile
# per distinct program.  Part 2 (scripts/run_r05_tpu_queue2.sh) carries the
# legs that needed new code (Llama w8a8, orientation-bucket serving).

set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/r05_tpu_results.jsonl}"

note() { echo "=== $1 ($(date -u +%H:%M:%S)) ===" >&2; }
run() { # run <tag> <cmd...>: append each stdout JSON line tagged
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

# 0. control: the production forward bench — FIRST, so the round has its
#    headline number even if the tunnel dies mid-queue.  Now includes the
#    structural HLO guard (scripts/check_bench_hlo.py) before timing.
run bench_control python bench.py

# 1. VERDICT #1a: trainable ToMe composed with the SHIPPED TrainArgs
#    defaults (remat=True, opt_state_dtype=bfloat16, rng_impl=rbg —
#    training/trainer.py:98-141).  The r04 545/674 pairs/s A/B was
#    measured on a non-default config (remat off, fp32 moments); this is
#    the config users actually get.  Paired control first at each batch.
run train_defaults_b16 env TRAIN_BENCH_BATCH=16 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 \
    python scripts/train_bench.py
run train_defaults_merge87_b16 env TRAIN_BENCH_BATCH=16 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 TRAIN_BENCH_MERGE_TO=87 \
    python scripts/train_bench.py
run train_defaults_b32 env TRAIN_BENCH_BATCH=32 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 \
    python scripts/train_bench.py
run train_defaults_merge87_b32 env TRAIN_BENCH_BATCH=32 TRAIN_BENCH_REMAT=1 \
    TRAIN_BENCH_OPT_DTYPE=bfloat16 TRAIN_BENCH_RBG=1 TRAIN_BENCH_MERGE_TO=87 \
    python scripts/train_bench.py

# 2. VERDICT #7 (device half): the canvas orientation tax, same session.
#    auto-bucketing emits (384,608) for landscape and (608,384) for
#    portrait batches; the fixed one-program canvas is 608x608.  The
#    landscape control + the two missing geometries settle whether
#    per-orientation bucketing (2 programs) earns its complexity over the
#    fixed square (+13% measured in r02, re-paired here).
run canvas_landscape env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 \
    PERF_SWEEP_CANVAS=384,608 python scripts/perf_sweep.py
run canvas_portrait env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 \
    PERF_SWEEP_CANVAS=608,384 python scripts/perf_sweep.py
run canvas_square env PERF_SWEEP_IMPLS=auto PERF_SWEEP_BATCHES=16 \
    PERF_SWEEP_CANVAS=608,608 python scripts/perf_sweep.py

note "queue part 1 complete -> $OUT"
