"""Helpers to build random-initialized HF torch models for numerical parity
tests (no network: checkpoints can't be downloaded in this environment, so we
instantiate HF architectures from config, seed torch, and port the random
weights through our converter — this validates both converter and math)."""

import torch


def hf_bert_config(cfg):
    from transformers import BertConfig

    return BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=cfg.pad_token_id,
        attn_implementation="eager",
    )


def hf_vilt_config(cfg, **overrides):
    from transformers import ViltConfig as HFViltConfig

    kw = dict(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        hidden_act=cfg.hidden_act,
        hidden_dropout_prob=cfg.hidden_dropout_prob,
        attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        num_channels=cfg.num_channels,
        qkv_bias=cfg.qkv_bias,
        max_image_length=cfg.max_image_length,
        modality_type_vocab_size=cfg.modality_type_vocab_size,
        attn_implementation="eager",
    )
    kw.update(overrides)
    return HFViltConfig(**kw)


def make_hf_bert(cfg, seed=0):
    from transformers import BertModel

    torch.manual_seed(seed)
    model = BertModel(hf_bert_config(cfg), add_pooling_layer=False)
    model.eval()
    return model


def make_hf_vilt(cfg, seed=0, **overrides):
    from transformers import ViltModel

    torch.manual_seed(seed)
    model = ViltModel(hf_vilt_config(cfg, **overrides))
    model.eval()
    return model


class DeterministicMultinomial:
    """Context manager replacing torch.multinomial with a deterministic
    raster-order choice, so HF ViLT's patch-select (modeling_vilt.py:154-160)
    matches our deterministic valid-first gather.  (HF's multinomial draws a
    random permutation even when all patches are valid.)"""

    def __enter__(self):
        self._orig = torch.multinomial

        def det_multinomial(weights, num_samples, replacement=False, **kw):
            n = weights.shape[-1]
            if replacement:
                idx = torch.arange(num_samples) % n
            else:
                idx = torch.arange(num_samples)
            return idx

        torch.multinomial = det_multinomial
        return self

    def __exit__(self, *exc):
        torch.multinomial = self._orig
        return False
