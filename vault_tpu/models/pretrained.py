"""Loading pretrained checkpoints from local HF-format directories.

The reference calls ``from_pretrained`` on hub names (downloads); this
environment has no egress, so checkpoints must be local directories in HF
layout (config.json + pytorch_model.bin / model.safetensors [+ vocab files]).
When the path doesn't exist we fall back to random init with the named
geometry — every code path stays runnable without weights.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

from vault_tpu.config import TextTowerConfig, VaultConfig, ViltConfig
from vault_tpu.models import bert as bert_mod
from vault_tpu.models import vilt as vilt_mod
from vault_tpu.models.convert import bert_params_from_torch, vilt_params_from_torch
from vault_tpu.presets import bert_base_uncased, bertweet_base, vilt_b32


def load_torch_state_dict(model_dir: str):
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(f"no weights in {model_dir}")


def _read_config(model_dir: str) -> Optional[dict]:
    p = os.path.join(model_dir, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def text_config_from_name(name_or_path: str) -> TextTowerConfig:
    cfg = _read_config(name_or_path) if os.path.isdir(name_or_path) else None
    if cfg is None:
        if "bertweet" in name_or_path:
            return bertweet_base()
        return bert_base_uncased()
    style = "roberta" if cfg.get("model_type") == "roberta" else "bert"
    return TextTowerConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        hidden_act=cfg.get("hidden_act", "gelu"),
        hidden_dropout_prob=cfg.get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=cfg.get("attention_probs_dropout_prob", 0.1),
        max_position_embeddings=cfg["max_position_embeddings"],
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        pad_token_id=cfg.get("pad_token_id", 0),
        position_embedding_style=style,
    )


def vilt_config_from_name(name_or_path: str, **overrides) -> ViltConfig:
    cfg = _read_config(name_or_path) if os.path.isdir(name_or_path) else None
    if cfg is None:
        return vilt_b32(**overrides)
    kw = dict(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        hidden_act=cfg.get("hidden_act", "gelu"),
        hidden_dropout_prob=cfg.get("hidden_dropout_prob", 0.0),
        attention_probs_dropout_prob=cfg.get("attention_probs_dropout_prob", 0.0),
        max_position_embeddings=cfg["max_position_embeddings"],
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        image_size=cfg.get("image_size", 384),
        patch_size=cfg.get("patch_size", 32),
        qkv_bias=cfg.get("qkv_bias", True),
        max_image_length=cfg.get("max_image_length", -1),
        modality_type_vocab_size=cfg.get("modality_type_vocab_size", 2),
    )
    kw.update(overrides)
    return ViltConfig(**kw)


def _strip_known_prefixes(sd, prefixes=("vilt.", "bert.", "roberta.")):
    for p in prefixes:
        if any(k.startswith(p) for k in sd):
            return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}, p
    return dict(sd), ""


def load_vault_backbone(cfg: VaultConfig, rng,
                        vilt_path: Optional[str] = None,
                        bert_path: Optional[str] = None,
                        dropout_override: Optional[float] = None):
    """VaultMixin.from_pretrained equivalent (vault/models/vault/model.py:
    92-128): ViLT weights + optional LM tower weights; random init where a
    path is missing."""
    k_vilt, k_bert = jax.random.split(rng)
    vilt_cfg = cfg.resolved_vilt()

    def _warn_random(which, path):
        # random init MUST be loud: a typo'd local path (or an unfetchable
        # hub name in this no-egress environment) would otherwise produce a
        # completed run with untrained-backbone metrics that look like a
        # legitimate bad experiment
        logger.warning(
            "%s: %r is not a local checkpoint directory — initializing "
            "RANDOM weights (hub downloads are unavailable here)",
            which, path)

    if vilt_path and os.path.isdir(vilt_path):
        sd, _ = _strip_known_prefixes(load_torch_state_dict(vilt_path))
        vilt_params = vilt_params_from_torch(sd, vilt_cfg)
    else:
        if vilt_path:
            _warn_random("vilt tower", vilt_path)
        vilt_params = vilt_mod.init_vilt(k_vilt, vilt_cfg)
    params = {"vilt": vilt_params}
    if cfg.text_tower is not None:
        if bert_path and os.path.isdir(bert_path):
            sd, _ = _strip_known_prefixes(load_torch_state_dict(bert_path))
            params["bert"] = bert_params_from_torch(sd, cfg.text_tower)
        else:
            if bert_path:
                _warn_random("LM tower", bert_path)
            params["bert"] = bert_mod.init_bert(k_bert, cfg.text_tower)
    return params


def load_bert_tower(model_dir: str, cfg: TextTowerConfig):
    """One BERT/RoBERTa tower from a local HF checkpoint dir — the building
    block of TomBERT's from_pretrained surgery
    (vault/models/tombert/model.py:131-183)."""
    sd, _ = _strip_known_prefixes(load_torch_state_dict(model_dir))
    return bert_params_from_torch(sd, cfg)


def load_resnet_tower(weights_path: str, depth: int):
    """torchvision ResNet state-dict (.pth) -> our param tree; the
    no-egress stand-in for the reference's ``pretrained=True`` ResNets
    (vault/modules.py:210-308)."""
    import torch

    from vault_tpu.models.resnet import resnet_params_from_torch

    # weights_only=True can only yield a tensor dict (full pickled Modules
    # are rejected at load time), so no state_dict() unwrap exists here
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    return resnet_params_from_torch(sd, depth)


def build_tokenizer(name_or_path: str, max_length: int = 40):
    """Native WordPiece from a local vocab.txt; HF AutoTokenizer for other
    local formats (BERTweet BPE); fresh minimal WordPiece otherwise."""
    from vault_tpu.text.wordpiece import WordPieceTokenizer

    if os.path.isdir(name_or_path):
        vocab = os.path.join(name_or_path, "vocab.txt")
        bpe_codes = os.path.join(name_or_path, "bpe.codes")
        if os.path.exists(bpe_codes) and os.path.exists(vocab):
            # BERTweet layout: fairseq dict vocab + fastBPE codes
            from vault_tpu.text.fastbpe import FastBPE

            return FastBPE(vocab, bpe_codes)
        if os.path.exists(vocab):
            # do_lower_case lives in tokenizer_config.json (HF layout);
            # fall back to the name heuristic: lowercase unless the name
            # says "cased" without "uncased" (bert-base-cased vs -uncased)
            lower = None
            tok_cfg_path = os.path.join(name_or_path, "tokenizer_config.json")
            if os.path.exists(tok_cfg_path):
                with open(tok_cfg_path) as f:
                    lower = json.load(f).get("do_lower_case")
            if lower is None:
                lower = (_read_config(name_or_path) or {}).get("do_lower_case")
            if lower is None:
                base = os.path.basename(os.path.normpath(name_or_path))
                lower = not ("cased" in base and "uncased" not in base)
            return WordPieceTokenizer(vocab, lowercase=bool(lower))
        vjson = os.path.join(name_or_path, "vocab.json")
        merges = os.path.join(name_or_path, "merges.txt")
        if os.path.exists(vjson) and os.path.exists(merges):
            from vault_tpu.text.bpe import ByteLevelBPE

            return ByteLevelBPE(vjson, merges)
        try:
            # BERTweet's fastBPE, tokenizer.json fast-tokenizer layouts,
            # and other exotic formats
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(name_or_path)
            if max_length:
                tok.model_max_length = max_length
            return tok
        except Exception as e:
            # an EXISTING checkpoint dir whose tokenizer can't be built must
            # not silently degrade to the 57-token toy vocab — real weights
            # + garbage token ids produce quietly wrong predictions
            raise RuntimeError(
                f"{name_or_path} is a checkpoint directory but no tokenizer "
                f"could be built from it (no vocab.txt / vocab.json+merges "
                f"/ bpe.codes; AutoTokenizer failed with: {e})") from e
    # not a local path at all: minimal functional tokenizer (random-weight
    # runs / tests)
    base = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        [chr(c) for c in range(ord("a"), ord("z") + 1)] + \
        ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    return WordPieceTokenizer({t: i for i, t in enumerate(base)})
