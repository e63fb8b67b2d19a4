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
    apply_device_arg,
    trainer_args_from_namespace,
)

MODEL_ARGS = dict(
    model_name_or_path=dict(default="bert-base-uncased", type=str,
                            help="BERT checkpoint for the text stacks"),
    tweet_model_name_or_path=dict(type=str,
                                  help="TomBERT: separate checkpoint for the "
                                       "tweet tower (+ its tokenizer); "
                                       "default: model_name_or_path "
                                       "(reference tombert/model.py:42-45)"),
    vilt_model_name_or_path=dict(default="dandelin/vilt-b32-mlm", type=str,
                                 help="ViLT checkpoint (TomViLT only)"),
    num_hidden_cross_layers=dict(default=1, type=int,
                                 help="cross-attention layers"),
    pooling=dict(default="first", choices=["first", "cls", "both"], type=str),
    mm_pooling=dict(default="first", choices=["first", "cls", "both"], type=str,
                    help="TomViLT multimodal pooling (accepted for reference "
                         "CLI parity, tomvilt/model.py:44-48; the reference "
                         "never threads it into the model, which pools "
                         "ViLT's token 0 — neither do we)"),
    vilt_dropout_prob=dict(default=0.1, type=float,
                           help="TomViLT: VAuLT classifier-head dropout "
                                "(the reference's ViLT-internal override is "
                                "a typo'd no-op, vault/models/vault/"
                                "model.py:71-75, so the head is its only "
                                "effective consumer)"),
    tie_target_bert_weights=dict(action="store_true",
                                 help="TomBERT: the target tower shares the "
                                      "tweet tower's weights (reference "
                                      "from_pretrained kwarg, "
                                      "tombert/model.py:164-165)"),
    resnet_depth=dict(default=101, type=int, choices=[18, 34, 50, 101, 152]),
    resnet_weights=dict(type=str,
                        help="local torchvision state-dict (.pth) to seed "
                             "the ResNet (no-egress stand-in for the "
                             "reference's pretrained=True)"),
    train_image_encoder=dict(action="store_true", help="fine-tune ResNet"),
    use_tweet_bert=dict(action="store_true",
                        help="TomViLT: use the LM tower inside VAuLT"),
    add_placeholder_token=dict(action="store_true",
                               help="add $T$ to the tokenizer and resize "
                                    "the text towers' embeddings"),
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
    preprocess_on_fetch=dict(action="store_true",
                             help="decode+transform train images per fetch "
                                  "instead of eagerly (reference flag; its "
                                  "transform is deterministic, so this is a "
                                  "memory tradeoff, not augmentation)"),
)

ENTITY_ARGS = dict(
    entity_cache=dict(type=str,
                      help="JSON entity cache (target -> [entity, "
                           "description]); adds entity tokens to the "
                           "tokenizer + max-pool embeddings "
                           "(vault/entity_linking.py:115-148)"),
    wiki_store=dict(type=str,
                    help="offline alias-store dir for link-then-cache when "
                         "--entity_cache is missing"),
    entity_threshold=dict(default=0.0, type=float,
                          help="entity-linking confidence threshold"),
)


def parse_args():
    parser = argparse.ArgumentParser()
    sp = parser.add_subparsers(dest="model", required=True)
    for model in ("TomBERT", "TomViLT"):
        p = sp.add_parser(model)
        add_arguments(p, MODEL_ARGS)
        add_arguments(p, DATASET_ARGS)
        add_arguments(p, ENTITY_ARGS)
        add_arguments(p, TRAINER_ARGS)
        add_arguments(p, GENERAL_ARGS)
        p.add_argument("-r", "--reps_short", type=int, dest="reps_short",
                       help=argparse.SUPPRESS)
    args = parser.parse_args()
    if getattr(args, "reps_short", None):
        args.reps = args.reps_short
    if args.merge_to is not None:
        # ToMe targets ViLT's ~200 patch tokens; TomBERT has no ViLT and
        # TomViLT feeds ~max_target_length attended region tokens as
        # image_embeds — silently ignoring the flag would let a user
        # believe they trained with merging (clsf_vault.py threads it).
        parser.error("--merge_to is not supported for the TomBERT/TomViLT "
                     "families (no patch-token path to merge); use "
                     "experiments/clsf_vault.py")
    return args


def main():
    args = parse_args()
    apply_device_arg(args)
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

    # TomBERT's tokenizer follows the tweet tower when that differs
    # (reference experiments/tmsc_tombert.py:73-78)
    tokenizer_src = args.model_name_or_path
    if args.model == "TomBERT" and args.tweet_model_name_or_path:
        tokenizer_src = args.tweet_model_name_or_path

    if args.debug_tiny:
        from vault_tpu.config import tiny_text_config

        text_cfg = tiny_text_config(vocab_size=30522)
        args.resnet_depth = 18
        args.crop_size = 64
    else:
        text_cfg = text_config_from_name(args.model_name_or_path)
    tokenizer = build_tokenizer(tokenizer_src)
    # Guard the silent-garbage configurations: when exactly one of the two
    # checkpoint paths resolves locally, the tokenizer and the tower
    # weights come from different sources (e.g. a hub-name tweet model
    # falls back to the minimal tokenizer while bert-base weights load).
    if args.model == "TomBERT" and args.tweet_model_name_or_path and \
            os.path.isdir(tokenizer_src) != os.path.isdir(args.model_name_or_path):
        logging.warning(
            "tokenizer follows %r but tower weights follow %r and only one "
            "is a local checkpoint dir — token ids will not line up with "
            "the pretrained embeddings", tokenizer_src,
            args.model_name_or_path)
    if not os.path.isdir(tokenizer_src) and os.path.isdir(args.model_name_or_path):
        logging.warning(
            "%r is not a local checkpoint dir: using a minimal fallback "
            "tokenizer while pretrained weights load from %r — real text "
            "will encode as [UNK]/char pieces", tokenizer_src,
            args.model_name_or_path)
    processor = VaultProcessor(tokenizer, max_length=args.max_total_length)

    max_total = args.max_total_length
    if args.model == "TomViLT":
        max_total = min(max_total, 40)  # ViLT text constraint

    # Entity linking resolves BEFORE dataset construction so the entity
    # tokens reach the encoded target text (reference wires the same
    # subparser into this CLI, experiments/tmsc_tombert.py:47, 15-19)
    from vault_tpu.text.entity_linking import resolve_entities_for_cli

    def read_targets():
        from vault_tpu.data.datasets import read_twitter201x

        kinds = (list(args.train_split) + list(args.dev_split or [])
                 + list(args.test_split or []))
        return [e.target for e in read_twitter201x(args.dir, kinds)]

    entity_map, entity_descriptions = resolve_entities_for_cli(
        args.entity_cache, args.wiki_store, args.entity_threshold,
        tokenizer, read_targets)

    if args.add_placeholder_token and hasattr(tokenizer, "add_tokens"):
        # after entity tokens, so per-rep embedding growth (entity max-pool
        # rows first, then the random $T$ row) lines up with token ids
        tokenizer.add_tokens(["$T$"])

    mk = lambda kinds, on_fetch=False, label_mapping=None: TomBertTmscDataset(
        args.dir, kinds, processor, image_dir=args.image_dir,
        max_total_length=max_total, max_target_length=args.max_target_length,
        crop_size=args.crop_size, preprocess_on_fetch=on_fetch,
        num_workers=args.max_num_workers, entity_map=entity_map or None,
        label_mapping=label_mapping)
    train_ds = mk(args.train_split, on_fetch=args.preprocess_on_fetch)
    # dev/test reuse the train mapping (identical when all classes appear
    # in every split; safe when a small split is missing one)
    lm = train_ds.label_mapping
    dev_ds = mk(args.dev_split, label_mapping=lm) if args.dev_split else None
    test_ds = mk(args.test_split, label_mapping=lm) if args.test_split else None
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
        if args.model == "TomBERT" and args.tweet_model_name_or_path:
            # reference names TomBERT runs by the tweet checkpoint too
            # (experiments/tmsc_tombert.py:188-195)
            handler.set_param(
                "tweet_model",
                os.path.basename(args.tweet_model_name_or_path))
        if args.description:
            handler.set_param("description", args.description,
                              disabled=True)
        name_params = ["vilt_model", "dataset", "bert_model",
                       "use_tweet_bert"]
        if args.model == "TomBERT" and args.tweet_model_name_or_path:
            name_params.insert(2, "tweet_model")
        handler.set_name_params(name_params)

        rng = jax.random.PRNGKey(args.seed + rep)
        from vault_tpu.models.bert import grow_word_embeddings
        from vault_tpu.models.pretrained import (
            load_bert_tower,
            load_resnet_tower,
        )
        from vault_tpu.text.entity_linking import (
            integrate_entities_into_embeddings,
        )

        resnet_params = (load_resnet_tower(args.resnet_weights,
                                           args.resnet_depth)
                         if args.resnet_weights else None)

        def grow_towers(tree, keys):
            """Entity max-pool rows + random $T$ row, in token-id order, for
            the named BERT towers (reference resize_token_embeddings,
            tombert/model.py:185-187 / tomvilt/model.py:173-175)."""
            for k in keys:
                emb = tree[k]["embeddings"]
                word = emb["word"]
                if entity_descriptions:
                    word = integrate_entities_into_embeddings(
                        word, entity_descriptions, tokenizer)
                tree[k] = {**tree[k], "embeddings": {**emb, "word": word}}
                if args.add_placeholder_token and hasattr(tokenizer, "__len__"):
                    tree[k] = grow_word_embeddings(
                        tree[k], len(tokenizer), jax.random.fold_in(rng, 11))
            return tree

        if args.model == "TomBERT":
            from vault_tpu.models.tombert import init_tombert_from_bert

            tweet_cfg = text_cfg
            if os.path.isdir(args.model_name_or_path):
                # the reference's from_pretrained surgery: one BERT seeds
                # all four text stacks; a separate tweet checkpoint feeds
                # the tweet+target towers (tombert/model.py:131-183)
                bert_params = load_bert_tower(args.model_name_or_path,
                                              text_cfg)
                tweet_params = None
                if args.tweet_model_name_or_path and \
                        os.path.isdir(args.tweet_model_name_or_path):
                    tweet_cfg = text_config_from_name(
                        args.tweet_model_name_or_path)
                    tweet_params = load_bert_tower(
                        args.tweet_model_name_or_path, tweet_cfg)
                params = init_tombert_from_bert(
                    bert_params, rng, text_cfg, n_classes, args.pooling,
                    vis_dim, args.num_hidden_cross_layers,
                    resnet_params=resnet_params, tweet_params=tweet_params,
                    tie_target_bert=args.tie_target_bert_weights)
                if "resnet" not in params:
                    params["resnet"] = init_resnet(
                        jax.random.fold_in(rng, 99), args.resnet_depth)
            else:
                params = init_tombert(rng, text_cfg, n_classes, args.pooling,
                                      vis_dim, args.num_hidden_cross_layers,
                                      resnet_depth=args.resnet_depth,
                                      tie_target_bert=args.tie_target_bert_weights)
                if resnet_params is not None:
                    params["resnet"] = resnet_params
            params = grow_towers(params, ["tweet_bert"] +
                                 ([] if args.tie_target_bert_weights
                                  else ["target_bert"]))

            def apply_fn(p, batch, deterministic, rng,
                         _tweet_cfg=tweet_cfg):
                return tombert_apply(p, text_cfg, pooling=args.pooling,
                                     resnet_depth=args.resnet_depth,
                                     train_image_encoder=args.train_image_encoder,
                                     tweet_cfg=_tweet_cfg,
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
            # pretrained seeding from local checkpoint dirs (reference
            # tomvilt/model.py:114-171: ViLT + BERT into the VAuLT core,
            # BERT into the target tower)
            vilt_dir = (args.vilt_model_name_or_path
                        if os.path.isdir(args.vilt_model_name_or_path) else None)
            bert_dir = (args.model_name_or_path
                        if os.path.isdir(args.model_name_or_path) else None)
            if vilt_dir or (args.use_tweet_bert and bert_dir):
                from vault_tpu.models.pretrained import load_vault_backbone

                backbone = load_vault_backbone(
                    vault_cfg, jax.random.fold_in(rng, 3), vilt_dir,
                    bert_dir if args.use_tweet_bert else None)
                params["vault"] = {**params["vault"], **backbone}
            if os.path.isdir(args.model_name_or_path):
                params["target_bert"] = load_bert_tower(
                    args.model_name_or_path, text_cfg)
            if resnet_params is not None:
                params["resnet"] = resnet_params

            run_vault_cfg = vault_cfg
            params = grow_towers(params, ["target_bert"])
            if entity_descriptions:
                from vault_tpu.text.entity_linking import (
                    integrate_entities_into_vault,
                )

                params["vault"], run_vault_cfg = integrate_entities_into_vault(
                    params["vault"], run_vault_cfg, entity_descriptions,
                    tokenizer)
            if args.add_placeholder_token and hasattr(tokenizer, "__len__"):
                from vault_tpu.models.vault import resize_token_embeddings

                params["vault"], run_vault_cfg = resize_token_embeddings(
                    params["vault"], run_vault_cfg, len(tokenizer),
                    jax.random.fold_in(rng, 11))

            def apply_fn(p, batch, deterministic, rng,
                         _cfg=run_vault_cfg):
                return tomvilt_apply(p, _cfg, text_cfg,
                                     resnet_depth=args.resnet_depth,
                                     train_image_encoder=args.train_image_encoder,
                                     head_dropout=args.vilt_dropout_prob,
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
