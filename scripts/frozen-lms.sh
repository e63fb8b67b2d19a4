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

# Reference's ACTIVE legs (:27-50): Twitter twitter2015/twitter with
# BERTweet only (bert-base legs are commented out upstream), 15 epochs,
# merged train+dev; Bloomberg with bert-base (15 epochs) and BERTweet (8),
# batch 16 + augmentation.  MVSA frozen legs are commented out upstream.
if [ -n "$TWITTER" ]; then
  for ds in twitter2015 twitter; do
    [ -d "$TWITTER/$ds" ] || continue
    python experiments/clsf_vault.py Twitter201X \
      --dir "$TWITTER/$ds" --train_split train dev --test_split test \
      --vilt_model_name_or_path "$VILT" \
      --bert_model_name_or_path "$BERTWEET" --freeze_lm \
      --preprocess_on_fetch --num_train_epochs 15 --reps "$REPS" $EXTRA_FLAGS
  done
fi

if [ -n "$BLOOMBERG" ]; then
  for spec in "$BERT:15" "$BERTWEET:8"; do
    bert=${spec%:*}; epochs=${spec##*:}
    python experiments/clsf_vault.py Bloomberg \
      --root_dir "$BLOOMBERG" --bert_model_name_or_path "$bert" --freeze_lm \
      --train_split train dev --test_split test --image_augmentation \
      --train_batch_size 16 --num_train_epochs "$epochs" \
      --reps "$REPS" $EXTRA_FLAGS
  done
fi
