#!/bin/bash
# Headline-results driver — rebuild of the reference scripts/test-results.sh
# (ViLT-only vs +bert-base vs +bertweet on twitter2015/twitter, Bloomberg,
# MVSA x2; per-config epochs follow the reference recipe :18-99).
#
# Usage: ./scripts/test-results.sh -t <twitter_root> -b <bloomberg_root> \
#            -m <mvsa_root> -r <reps>
# Model checkpoints are local HF dirs via $BERT_DIR/$BERTWEET_DIR/$VILT_DIR
# (random-init geometry is used when unset — useful for smoke runs).
#
# Smoke knobs (defaults preserve the reference recipe exactly):
#   EXTRA_FLAGS  extra args appended to every driver call (argparse keeps
#                the last occurrence, so these override the recipe values)
#   VARIANTS     space-separated subset of "none bert bertweet" to restrict
#                which LM variants run (default: all three)

set -e

VARIANTS=${VARIANTS:-"none bert bertweet"}
variant_flag () {
  case $1 in
    none) echo "" ;;
    bert) echo "--bert_model_name_or_path $BERT" ;;
    bertweet) echo "--bert_model_name_or_path $BERTWEET" ;;
  esac
}

REPS=5
while getopts "t:b:m:r:" opt; do
  case $opt in
    t) TWITTER=$OPTARG ;;
    b) BLOOMBERG=$OPTARG ;;
    m) MVSA=$OPTARG ;;
    r) REPS=$OPTARG ;;
    *) exit 1 ;;
  esac
done

VILT=${VILT_DIR:-dandelin/vilt-b32-mlm}
BERT=${BERT_DIR:-bert-base-uncased}
BERTWEET=${BERTWEET_DIR:-vinai/bertweet-base}

# Reference recipe facts (scripts/test-results.sh:18-99): ALL legs train on
# the merged train+dev splits with test for final eval (no dev eval / early
# stopping), Twitter augments via --preprocess_on_fetch, Bloomberg/MVSA use
# --image_augmentation + batch 16, MVSA adds --max_num_workers 5; epochs
# vary per (dataset, LM) pair — tables below.

run_tmsc () {  # $1=dataset dir under twitter root, $2=bert flag(s), $3=epochs
  python experiments/clsf_vault.py Twitter201X \
    --dir "$TWITTER/$1" --train_split train dev --test_split test \
    --vilt_model_name_or_path "$VILT" $2 \
    --preprocess_on_fetch --num_train_epochs "$3" \
    --reps "$REPS" $EXTRA_FLAGS
}

if [ -n "$TWITTER" ]; then
  for ds in twitter2015 twitter; do
    [ -d "$TWITTER/$ds" ] || continue
    for v in $VARIANTS; do
      [ "$v" = bert ] && epochs=25 || epochs=15   # :20-45
      run_tmsc "$ds" "$(variant_flag $v)" "$epochs"
    done
  done
fi

if [ -n "$BLOOMBERG" ]; then
  for v in $VARIANTS; do
    [ "$v" = bert ] && epochs=15 || epochs=8     # :47-63
    python experiments/clsf_vault.py Bloomberg \
      --root_dir "$BLOOMBERG" $(variant_flag $v) \
      --train_split train dev --test_split test --image_augmentation \
      --train_batch_size 16 --num_train_epochs "$epochs" \
      --reps "$REPS" $EXTRA_FLAGS
  done
fi

if [ -n "$MVSA" ]; then
  for root in "$MVSA/MVSA_Single" "$MVSA/MVSA"; do
    [ -d "$root" ] || continue
    for v in $VARIANTS; do
      case "$(basename $root):$v" in                 # :67-99
        MVSA_Single:none) epochs=15 ;;
        MVSA_Single:bert) epochs=15 ;;
        MVSA_Single:bertweet) epochs=9 ;;
        *:none) epochs=2 ;;
        *:bert) epochs=3 ;;
        *:bertweet) epochs=2 ;;
      esac
      python experiments/clsf_vault.py MVSA \
        --root_dir "$root" --preprocessed $(variant_flag $v) \
        --train_split train dev --test_split test --image_augmentation \
        --train_batch_size 16 --max_num_workers 5 \
        --num_train_epochs "$epochs" \
        --reps "$REPS" $EXTRA_FLAGS
    done
  done
fi
