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

run_tmsc () {  # $1=dataset dir under twitter root, $2=bert flag(s), $3=epochs
  python experiments/clsf_vault.py Twitter201X \
    --dir "$TWITTER/$1" --train_split train --dev_split dev --test_split test \
    --vilt_model_name_or_path "$VILT" $2 \
    --num_train_epochs "$3" --early_stopping_patience 5 \
    --reps "$REPS" $EXTRA_FLAGS
}

if [ -n "$TWITTER" ]; then
  for ds in twitter2015 twitter; do
    for v in $VARIANTS; do
      [ "$v" = none ] && epochs=15 || epochs=25
      run_tmsc "$ds" "$(variant_flag $v)" "$epochs"
    done
  done
fi

if [ -n "$BLOOMBERG" ]; then
  for v in $VARIANTS; do
    python experiments/clsf_vault.py Bloomberg \
      --root_dir "$BLOOMBERG" $(variant_flag $v) \
      --train_batch_size 16 --num_train_epochs 8 --early_stopping_patience 5 \
      --reps "$REPS" $EXTRA_FLAGS
  done
fi

if [ -n "$MVSA" ]; then
  for root in "$MVSA/MVSA_Single" "$MVSA/MVSA"; do
    [ -d "$root" ] || continue
    for v in $VARIANTS; do
      python experiments/clsf_vault.py MVSA \
        --root_dir "$root" --preprocessed $(variant_flag $v) \
        --num_train_epochs 9 --early_stopping_patience 5 \
        --reps "$REPS" $EXTRA_FLAGS
    done
  done
fi
