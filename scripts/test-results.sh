#!/bin/bash
# Headline-results driver — rebuild of the reference scripts/test-results.sh
# (ViLT-only vs +bert-base vs +bertweet on twitter2015/twitter, Bloomberg,
# MVSA x2; per-config epochs follow the reference recipe :18-99).
#
# Usage: ./scripts/test-results.sh -t <twitter_root> -b <bloomberg_root> \
#            -m <mvsa_root> -r <reps>
# Model checkpoints are local HF dirs via $BERT_DIR/$BERTWEET_DIR/$VILT_DIR
# (random-init geometry is used when unset — useful for smoke runs).

set -e

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
    --reps "$REPS"
}

if [ -n "$TWITTER" ]; then
  for ds in twitter2015 twitter; do
    run_tmsc "$ds" "" 15
    run_tmsc "$ds" "--bert_model_name_or_path $BERT" 25
    run_tmsc "$ds" "--bert_model_name_or_path $BERTWEET" 25
  done
fi

if [ -n "$BLOOMBERG" ]; then
  for bert in "" "--bert_model_name_or_path $BERT" "--bert_model_name_or_path $BERTWEET"; do
    python experiments/clsf_vault.py Bloomberg \
      --root_dir "$BLOOMBERG" $bert \
      --train_batch_size 16 --num_train_epochs 8 --early_stopping_patience 5 \
      --reps "$REPS"
  done
fi

if [ -n "$MVSA" ]; then
  for root in "$MVSA/MVSA_Single" "$MVSA/MVSA"; do
    [ -d "$root" ] || continue
    for bert in "" "--bert_model_name_or_path $BERT" "--bert_model_name_or_path $BERTWEET"; do
      python experiments/clsf_vault.py MVSA \
        --root_dir "$root" --preprocessed $bert \
        --num_train_epochs 9 --early_stopping_patience 5 \
        --reps "$REPS"
    done
  done
fi
