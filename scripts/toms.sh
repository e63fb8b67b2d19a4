#!/bin/bash
# TomVAuLT (--use_tweet_bert) vs TomViLT on twitter2015/twitter — rebuild of
# the reference scripts/toms.sh:16-40 (resnet101, max_total 40, max_target 10).

set -e

REPS=5
while getopts "t:r:" opt; do
  case $opt in
    t) TWITTER=$OPTARG ;;
    r) REPS=$OPTARG ;;
    *) exit 1 ;;
  esac
done

BERT=${BERT_DIR:-bert-base-uncased}
VILT=${VILT_DIR:-dandelin/vilt-b32-mlm}

# reference recipe (:16-40): train on train, dev eval, NO test leg,
# 10 epochs, resnet101, max_total 40 / max_target 10
for ds in twitter2015 twitter; do
  [ -d "$TWITTER/$ds" ] || continue
  for tweet_bert in "--use_tweet_bert" ""; do
    python experiments/tmsc_tombert.py TomViLT \
      --dir "$TWITTER/$ds" --train_split train --dev_split dev \
      --model_name_or_path "$BERT" \
      --vilt_model_name_or_path "$VILT" $tweet_bert \
      --resnet_depth 101 --max_total_length 40 --max_target_length 10 \
      --num_train_epochs 10 --reps "$REPS" $EXTRA_FLAGS
  done
done
