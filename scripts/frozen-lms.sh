#!/bin/bash
# Frozen-LM ablation (--freeze_lm) for TMSC + Bloomberg — rebuild of the
# reference scripts/frozen-lms.sh:27-50.

set -e

REPS=5
while getopts "t:b:r:" opt; do
  case $opt in
    t) TWITTER=$OPTARG ;;
    b) BLOOMBERG=$OPTARG ;;
    r) REPS=$OPTARG ;;
    *) exit 1 ;;
  esac
done

VILT=${VILT_DIR:-dandelin/vilt-b32-mlm}
BERT=${BERT_DIR:-bert-base-uncased}
BERTWEET=${BERTWEET_DIR:-vinai/bertweet-base}

if [ -n "$TWITTER" ]; then
  for ds in twitter2015 twitter; do
    for bert in "$BERT" "$BERTWEET"; do
      python experiments/clsf_vault.py Twitter201X \
        --dir "$TWITTER/$ds" --train_split train --dev_split dev \
        --test_split test --vilt_model_name_or_path "$VILT" \
        --bert_model_name_or_path "$bert" --freeze_lm \
        --num_train_epochs 25 --early_stopping_patience 5 --reps "$REPS"
    done
  done
fi

if [ -n "$BLOOMBERG" ]; then
  for bert in "$BERT" "$BERTWEET"; do
    python experiments/clsf_vault.py Bloomberg \
      --root_dir "$BLOOMBERG" --bert_model_name_or_path "$bert" --freeze_lm \
      --train_batch_size 16 --num_train_epochs 8 \
      --early_stopping_patience 5 --reps "$REPS"
  done
fi
