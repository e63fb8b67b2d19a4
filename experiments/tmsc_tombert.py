#!/usr/bin/env python
"""TomBERT / TomViLT fine-tuning on Twitter-201X — rebuild of
experiments/tmsc_tombert.py (MODEL map :25-28, rep loop :145-222).

  python experiments/tmsc_tombert.py TomBERT --dir /data/twitter-tmsc/twitter2015 \
      --train_split train --dev_split dev --test_split test -r 5
  python experiments/tmsc_tombert.py TomViLT --dir ... --use_tweet_bert
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from experiments.utils import (
    GENERAL_ARGS,
    TRAINER_ARGS,
    add_arguments,
    trainer_args_from_namespace,
)

MODEL_ARGS = dict(
    model_name_or_path=dict(default="bert-base-uncased", type=str,
                            help="BERT checkpoint for the text stacks"),
    vilt_model_name_or_path=dict(default="dandelin/vilt-b32-mlm", type=str,
                                 help="ViLT checkpoint (TomViLT only)"),
    num_hidden_cross_layers=dict(default=1, type=int,
                                 help="cross-attention layers"),
    pooling=dict(default="first", choices=["first", "cls", "both"], type=str),
    resnet_depth=dict(default=101, type=int, choices=[18, 34, 50, 101, 152]),
    train_image_encoder=dict(action="store_true", help="fine-tune ResNet"),
    use_tweet_bert=dict(action="store_true",
                        help="TomViLT: use the LM tower inside VAuLT"),
    max_total_length=dict(default=64, type=int,
                          help="max tweet+target tokens (40 for TomViLT)"),
    max_target_length=dict(default=16, type=int, help="max target tokens"),
    crop_size=dict(default=224, type=int, help="image crop for ResNet"),
    debug_tiny=dict(action="store_true",
                    help="debug: tiny model geometry + tiny images"),
)

DATASET_ARGS = dict(
    dir=dict(required=True, type=str, help="tweet dataset directory"),
    image_dir=dict(type=str, help="image dir (default <dir>_images)"),
    train_split=dict(required=True, type=str, nargs="+"),
    dev_split=dict(type=str, nargs="+"),
    test_split=dict(type=str, nargs="+"),
)


def parse_args():
    parser = argparse.ArgumentParser()
    sp = parser.add_subparsers(dest="model", required=True)
    for model in ("TomBERT", "TomViLT"):
        p = sp.add_parser(model)
        add_arguments(p, MODEL_ARGS)
        add_arguments(p, DATASET_ARGS)
        add_arguments(p, TRAINER_ARGS)
        add_arguments(p, GENERAL_ARGS)
        p.add_argument("-r", "--reps_short", type=int, dest="reps_short",
                       help=argparse.SUPPRESS)
    args = parser.parse_args()
    if getattr(args, "reps_short", None):
        args.reps = args.reps_short
    return args


def main():
    args = parse_args()
    logging.basicConfig(level=args.logging_level.upper(),
                        filename=args.logging_file)

    from vault_tpu.config import VaultConfig
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.data.tombert_dataset import TomBertTmscDataset
    from vault_tpu.models.pretrained import (
        build_tokenizer,
        text_config_from_name,
        vilt_config_from_name,
    )
    from vault_tpu.models.resnet import RESNET_OUT_DIM, init_resnet
    from vault_tpu.models.tombert import init_tombert, tombert_apply
    from vault_tpu.models.tomvilt import init_tomvilt, tomvilt_apply
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.task_trainers import TomBertTrainer

    if args.debug_tiny:
        from vault_tpu.config import tiny_text_config

        text_cfg = tiny_text_config(vocab_size=30522)
        args.resnet_depth = 18
        args.crop_size = 64
    else:
        text_cfg = text_config_from_name(args.model_name_or_path)
    tokenizer = build_tokenizer(args.model_name_or_path)
    processor = VaultProcessor(tokenizer, max_length=args.max_total_length)

    max_total = args.max_total_length
    if args.model == "TomViLT":
        max_total = min(max_total, 40)  # ViLT text constraint

    mk = lambda kinds: TomBertTmscDataset(
        args.dir, kinds, processor, image_dir=args.image_dir,
        max_total_length=max_total, max_target_length=args.max_target_length,
        crop_size=args.crop_size)
    train_ds = mk(args.train_split)
    dev_ds = mk(args.dev_split) if args.dev_split else None
    test_ds = mk(args.test_split) if args.test_split else None
    n_classes = len(train_ds.label_mapping)
    vis_dim = RESNET_OUT_DIM[args.resnet_depth]

    targs = trainer_args_from_namespace(args)

    for rep in range(args.reps):
        exp_name = f"{args.model}TMSC"
        handler = ExperimentHandler(args.experiment_root, exp_name)
        handler.set_params({
            "vilt_model": (os.path.basename(args.vilt_model_name_or_path)
                           if args.model == "TomViLT" else "None"),
            "dataset": train_ds.name,
            "bert_model": os.path.basename(args.model_name_or_path),
            "use_tweet_bert": args.use_tweet_bert,
            "lr": args.lr, "pooling": args.pooling,
            "resnet_depth": args.resnet_depth,
        })
        if args.description:
            handler.set_param("description", args.description,
                              disabled=True)
        handler.set_name_params(["vilt_model", "dataset", "bert_model",
                                 "use_tweet_bert"])

        rng = jax.random.PRNGKey(args.seed + rep)
        if args.model == "TomBERT":
            params = init_tombert(rng, text_cfg, n_classes, args.pooling,
                                  vis_dim, args.num_hidden_cross_layers,
                                  resnet_depth=args.resnet_depth)

            def apply_fn(p, batch, deterministic, rng):
                return tombert_apply(p, text_cfg, pooling=args.pooling,
                                     resnet_depth=args.resnet_depth,
                                     train_image_encoder=args.train_image_encoder,
                                     deterministic=deterministic, rng=rng,
                                     **batch)
        else:
            if args.debug_tiny:
                from vault_tpu.config import tiny_vilt_config

                vilt_cfg = tiny_vilt_config(vocab_size=30522)
            else:
                vilt_cfg = vilt_config_from_name(args.vilt_model_name_or_path)
            vault_cfg = VaultConfig(
                vilt=vilt_cfg,
                text_tower=text_cfg if args.use_tweet_bert else None)
            params = init_tomvilt(rng, vault_cfg, text_cfg, n_classes,
                                  vis_dim, args.num_hidden_cross_layers,
                                  resnet_depth=args.resnet_depth)

            def apply_fn(p, batch, deterministic, rng):
                return tomvilt_apply(p, vault_cfg, text_cfg,
                                     resnet_depth=args.resnet_depth,
                                     train_image_encoder=args.train_image_encoder,
                                     deterministic=deterministic, rng=rng,
                                     **batch)

        trainer = TomBertTrainer(
            apply_fn, params, targs, train_ds, dev_dataset=dev_ds,
            test_dataset=test_ds, exp_handler=handler,
            resnet_params=params.get("resnet"),
            resnet_depth=args.resnet_depth,
            train_image_encoder=args.train_image_encoder)
        trainer.train()


if __name__ == "__main__":
    main()
