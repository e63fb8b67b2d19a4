#!/usr/bin/env python
"""VAuLT fine-tuning CLI — the rebuild of experiments/clsf_vault.py.

Subcommand per task (Twitter201X / Bloomberg / MVSA), composing flags from
model + dataset + trainer specs; per-rep loop builds a fresh ExperimentHandler
named ``VaultTMSC{task}`` + fresh model and runs the task trainer
(reference :52-70, :179-252).

Usage examples (dataset paths per the reference README):
  python experiments/clsf_vault.py Twitter201X --dir /data/twitter-tmsc/twitter2015 \
      --train_split train --dev_split dev --test_split test \
      --bert_model_name_or_path bert-base-uncased -r 5
  python experiments/clsf_vault.py MVSA --root_dir /data/mvsa/MVSA_Single --preprocessed
  python experiments/clsf_vault.py Bloomberg --root_dir /data/bloomberg
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from experiments.utils import (
    GENERAL_ARGS,
    TRAINER_ARGS,
    add_arguments,
    apply_device_arg,
    trainer_args_from_namespace,
)

VAULT_MODEL_ARGS = dict(
    vilt_model_name_or_path=dict(default="dandelin/vilt-b32-mlm", type=str,
                                 help="ViLT checkpoint (local HF dir or name)"),
    bert_model_name_or_path=dict(type=str,
                                 help="LM tower checkpoint, if any"),
    vilt_dropout_prob=dict(default=0.1, type=float,
                           help="classifier-head dropout (the reference flag "
                                "of the same name: its ViLT-internals "
                                "override was a typo'd no-op, so 0.1 only "
                                "ever reached the head — the published "
                                "recipe)"),
    vilt_internal_dropout_prob=dict(default=0.0, type=float,
                                    help="hidden/attention dropout inside "
                                         "ViLT encoder layers — the "
                                         "reference's *intended* override, "
                                         "actually wired here (its effective "
                                         "value was always 0.0, which is the "
                                         "default for published-recipe "
                                         "parity; the fused MLP kernels "
                                         "support nonzero via in-fusion "
                                         "dropout masks)"),
    freeze_lm=dict(action="store_true", help="freeze the language tower"),
    use_vilt_position_embeddings=dict(action="store_true",
                                      help="keep ViLT's text position embeds"),
    add_placeholder_token=dict(action="store_true",
                               help="add $T$ to the tokenizer"),
    max_length=dict(default=40, type=int, help="max text tokens (<=40)"),
    image_augmentation=dict(action="store_true",
                            help="random-crop augmentation at fetch"),
    orientation_buckets=dict(action="store_true",
                             help="draw canvas-homogeneous batches so the "
                                  "auto canvas gives orientation-pure "
                                  "batches the fast (384, 608) geometry "
                                  "(shuffle stays uniform within buckets)"),
    debug_tiny=dict(action="store_true",
                    help="debug: tiny model geometry + tiny image canvas"),
    entity_cache=dict(type=str,
                      help="JSON entity cache (target -> [entity, "
                           "description]); adds entity tokens to the "
                           "tokenizer and max-pool-initializes their "
                           "embeddings (Twitter201X only)"),
    wiki_store=dict(type=str,
                    help="local alias-dictionary + description store for "
                         "offline entity linking; builds --entity_cache "
                         "from the dataset's targets when the cache file "
                         "is missing (Twitter201X only)"),
    entity_threshold=dict(default=0.0, type=float,
                          help="linker confidence threshold (reference "
                               "EntityLinker threshold)"),
    canvas=dict(default="default", type=str,
                help="pixel canvas: 'default' (static 608x608, one jit "
                     "program), 'auto' ({384,608}-bucketed per batch, <=4 "
                     "programs, landscape batches ~13%% faster), or 'HxW'"),
)

TASK_ARGS = {
    "Twitter201X": dict(
        dir=dict(required=True, type=str, help="tweet dataset directory"),
        image_dir=dict(type=str, help="image directory (default <dir>_images)"),
        train_split=dict(required=True, type=str, nargs="+"),
        dev_split=dict(type=str, nargs="+"),
        test_split=dict(type=str, nargs="+"),
        preprocess_on_fetch=dict(
            action="store_true",
            help="re-encode train images on fetch, aka augmentation "
                 "(reference vault/models/tombert/dataset.py flag name; "
                 "equivalent to --image_augmentation)"),
    ),
    "Bloomberg": dict(
        root_dir=dict(required=True, type=str, help="bloomberg dataset root"),
        tasks=dict(default=["text_is_represented"], type=str, nargs="+"),
        dev_size=dict(default=564, type=int,
                      help="dev split size (reference default 564)"),
        test_size=dict(default=704, type=int,
                       help="test split size (reference default 704)"),
        train_split=dict(default=["train"], type=str, nargs="+",
                         help="train split(s); the published recipe merges "
                              "train+dev (scripts/test-results.sh)"),
        val_split=dict(type=str, nargs="+",
                       help="development split(s); omit for no dev eval"),
        test_split=dict(type=str, nargs="+"),
    ),
    "MVSA": dict(
        root_dir=dict(required=True, type=str, help="MVSA dataset root"),
        preprocessed=dict(action="store_true",
                          help="literature label preprocessing"),
        train_split=dict(default=["train"], type=str, nargs="+",
                         help="train split(s); the published recipe merges "
                              "train+dev (scripts/test-results.sh)"),
        val_split=dict(type=str, nargs="+",
                       help="development split(s); omit for no dev eval"),
        test_split=dict(type=str, nargs="+"),
    ),
}


def parse_args():
    parser = argparse.ArgumentParser()
    sp = parser.add_subparsers(dest="task", required=True)
    for task, spec in TASK_ARGS.items():
        p = sp.add_parser(task)
        add_arguments(p, VAULT_MODEL_ARGS)
        add_arguments(p, spec)
        add_arguments(p, TRAINER_ARGS)
        add_arguments(p, GENERAL_ARGS)
        p.add_argument("-r", "--reps_short", type=int, dest="reps_short",
                       help=argparse.SUPPRESS)
    args = parser.parse_args()
    if getattr(args, "reps_short", None):
        args.reps = args.reps_short
    return args


def build_model(args, cfg, n_classes, rng):
    from vault_tpu.models.pretrained import load_vault_backbone
    from vault_tpu.models.vault import init_classifier_head

    params = load_vault_backbone(cfg, rng, args.vilt_model_name_or_path,
                                 args.bert_model_name_or_path)
    params["head"] = init_classifier_head(jax.random.fold_in(rng, 7),
                                          cfg.vilt.hidden_size, n_classes)
    return params


def main():
    args = parse_args()
    apply_device_arg(args)
    logging.basicConfig(level=args.logging_level.upper(),
                        filename=args.logging_file)

    from vault_tpu.config import VaultConfig
    from vault_tpu.data.datasets import (
        Twitter201XDataset,
        VisionLanguageDataset,
        load_bloomberg,
        load_mvsa,
    )
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import (
        build_tokenizer,
        text_config_from_name,
        vilt_config_from_name,
    )
    from vault_tpu.models.vault import vault_for_classification
    from vault_tpu.text.preprocess import demojizer_selector, twitter_preprocessor
    from vault_tpu.training.experiment import ExperimentHandler
    from vault_tpu.training.task_trainers import (
        BloombergTrainer,
        MvsaTrainer,
        TmscTrainer,
    )

    bert_name = args.bert_model_name_or_path
    canvas = None
    if args.debug_tiny:
        from vault_tpu.config import tiny_text_config, tiny_vilt_config

        vilt_cfg = tiny_vilt_config(image_size=64, patch_size=16,
                                    num_patch_tokens=16,
                                    vocab_size=30522)
        text_cfg = tiny_text_config(vocab_size=30522) if bert_name else None
        canvas = (64, 64)
    else:
        vilt_cfg = vilt_config_from_name(args.vilt_model_name_or_path)
        text_cfg = text_config_from_name(bert_name) if bert_name else None
    # ViLT-internal dropout: the reference's --vilt_dropout_prob INTENT (its
    # own override is a typo'd no-op, vault/models/vault/model.py:71-75, so
    # its effective value was always the pretrained 0.0 — our default, for
    # published-recipe parity).  --vilt_internal_dropout_prob wires the
    # fixed intent; the fused kernels keep working either way (in-fusion
    # dropout masks).
    import dataclasses
    vilt_cfg = dataclasses.replace(
        vilt_cfg, hidden_dropout_prob=args.vilt_internal_dropout_prob,
        attention_probs_dropout_prob=args.vilt_internal_dropout_prob)
    cfg = VaultConfig(vilt=vilt_cfg, text_tower=text_cfg,
                      use_vilt_position_embeddings=args.use_vilt_position_embeddings,
                      freeze_lm=args.freeze_lm)

    tokenizer = build_tokenizer(bert_name or args.vilt_model_name_or_path,
                                args.max_length)
    proc_kw = {}
    if canvas:  # debug_tiny geometry wins
        proc_kw["canvas"] = canvas
    elif args.canvas == "auto":
        proc_kw["canvas"] = "auto"
    elif args.canvas != "default":
        h, w = args.canvas.lower().split("x")
        proc_kw["canvas"] = (int(h), int(w))
    processor = VaultProcessor(tokenizer, max_length=args.max_length, **proc_kw)

    # text preprocessing per reference recipe (twitter preprocessor +
    # per-LM demojizer) for the VL datasets
    # normpath first: a trailing slash would make basename return "" and
    # silently select the identity demojizer
    demojizer = demojizer_selector(
        os.path.basename(os.path.normpath(bert_name)) if bert_name else "")
    pre = twitter_preprocessor()
    text_pre = lambda t: pre(demojizer(t))

    # Entity linking resolves BEFORE dataset construction so entity tokens
    # actually reach the encoded text: the reference appends "/[entity]" to
    # each linked target prior to encode_plus
    # (vault/tmsc_utils/dataset.py:260-283).
    entity_map: dict = {}
    entity_descriptions: list = []
    if args.task == "Twitter201X":
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
        # added AFTER entity tokens so the embedding rows appended per rep
        # (max-pool entity rows first, then the random $T$ row) line up
        # with the token ids
        tokenizer.add_tokens(["$T$"])

    if args.task == "Twitter201X":
        mk = lambda kinds, augment=False, label_mapping=None: Twitter201XDataset(
            args.dir, kinds, processor, image_dir=args.image_dir,
            max_length=args.max_length, augment=augment,
            num_workers=args.max_num_workers, entity_map=entity_map or None,
            orientation_buckets=args.orientation_buckets,
            label_mapping=label_mapping)
        train_ds = mk(args.train_split,
                      augment=args.image_augmentation or args.preprocess_on_fetch)
        # dev/test REUSE the train mapping: identical when every split
        # carries every class (sorted over the same set — the reference's
        # per-split derivation), and safe when a small split is missing one
        lm = train_ds.label_mapping
        dev_ds = mk(args.dev_split, label_mapping=lm) if args.dev_split else None
        test_ds = mk(args.test_split, label_mapping=lm) if args.test_split else None
        n_classes = len(train_ds.label_mapping)
        trainer_cls = TmscTrainer
        splits = list(args.train_split) + list(args.dev_split or [])
        dataset_label = (os.path.basename(os.path.normpath(args.dir))
                         + "(" + ";".join(splits) + ")")
        exp_name = "VaultTMSCTwitter201X"
    elif args.task == "Bloomberg":
        def mk(splits, augment=False):
            ids, texts, fns, labels, _ = load_bloomberg(
                args.root_dir, splits, args.tasks,
                dev_size=args.dev_size, test_size=args.test_size)
            return VisionLanguageDataset(
                ids, texts, fns, labels, processor,
                name=f"bloomberg-twitter-text-image({';'.join(splits)})",
                max_length=args.max_length, text_preprocessor=text_pre,
                augment=augment, num_workers=args.max_num_workers,
                orientation_buckets=args.orientation_buckets)
        train_ds = mk(args.train_split, augment=args.image_augmentation)
        dev_ds = mk(args.val_split) if args.val_split else None
        test_ds = mk(args.test_split) if args.test_split else None
        n_classes = len(args.tasks)
        trainer_cls = BloombergTrainer
        dataset_label = train_ds.name
        exp_name = "VaultTMSCBloomberg"
    else:  # MVSA
        def mk(splits, augment=False):
            ids, texts, fns, labels = load_mvsa(args.root_dir, splits,
                                                args.preprocessed)
            return VisionLanguageDataset(
                ids, texts, fns, labels, processor,
                name=f"{os.path.basename(args.root_dir)}({';'.join(splits)})",
                max_length=args.max_length, text_preprocessor=text_pre,
                augment=augment, num_workers=args.max_num_workers,
                orientation_buckets=args.orientation_buckets)
        train_ds = mk(args.train_split, augment=args.image_augmentation)
        dev_ds = mk(args.val_split) if args.val_split else None
        test_ds = mk(args.test_split) if args.test_split else None
        n_classes = 3 if args.preprocessed else 6
        trainer_cls = MvsaTrainer
        dataset_label = train_ds.name
        exp_name = "VaultTMSCMVSA"

    targs = trainer_args_from_namespace(args)

    for rep in range(args.reps):
        handler = ExperimentHandler(args.experiment_root, exp_name)
        handler.set_params({
            "bert_model": bert_name or "None",
            "dataset": dataset_label,
            "vilt_model": os.path.basename(args.vilt_model_name_or_path),
            "freeze_lm": args.freeze_lm,
            "lr": args.lr,
            "train_batch_size": args.train_batch_size,
            "num_train_epochs": args.num_train_epochs,
            "max_length": args.max_length,
        })
        if args.description:
            handler.set_param("description", args.description,
                              disabled=True)
        handler.set_name_params(["bert_model", "dataset", "vilt_model",
                                 "freeze_lm"])

        rng = jax.random.PRNGKey(args.seed + rep)
        params = build_model(args, cfg, n_classes, rng)
        run_cfg = cfg

        # Entity-token embeddings init as max-pool of the description
        # tokens' (vault/entity_linking.py:115-148); fresh per rep since
        # each rep draws fresh model weights.
        if entity_descriptions:
            from vault_tpu.text.entity_linking import (
                integrate_entities_into_vault,
            )

            params, run_cfg = integrate_entities_into_vault(
                params, run_cfg, entity_descriptions, tokenizer)

        if args.add_placeholder_token and hasattr(tokenizer, "__len__"):
            from vault_tpu.models.vault import resize_token_embeddings

            params, run_cfg = resize_token_embeddings(
                params, run_cfg, len(tokenizer), jax.random.fold_in(rng, 11))

        def apply_fn(p, batch, deterministic, rng, _cfg=run_cfg):
            return vault_for_classification(
                p, _cfg, batch, head_dropout=args.vilt_dropout_prob,
                deterministic=deterministic, rng=rng,
                use_pallas=targs.use_pallas, remat=targs.remat,
                merge_patches_to=targs.merge_to,
                merge_at_layer=targs.merge_at_layer)

        kw = {}
        if args.task == "MVSA":
            kw["preprocessed"] = args.preprocessed
        trainer = trainer_cls(apply_fn, params, targs, train_ds,
                              dev_dataset=dev_ds, test_dataset=test_ds,
                              exp_handler=handler, **kw)
        trainer.train()


if __name__ == "__main__":
    main()
