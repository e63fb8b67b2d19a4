"""Checkpoint conversion: HF PyTorch state_dicts -> vault_tpu pytrees.

This is the weight-porting layer called for in SURVEY.md §7 step 1: the
reference loads ``dandelin/vilt-b32-*`` and BERT/BERTweet checkpoints through
HF ``from_pretrained`` (vault/models/vault/model.py:92-128); we load the same
torch state_dicts and re-layout them into our functional pytrees.

Layout notes:
  * torch ``nn.Linear`` weight is (out, in); ours is (in, out) -> transpose.
  * torch ``Conv2d`` weight (O, I, kh, kw) is kept as-is (patchify uses OIHW).
  * per-layer weights are stacked along a leading layer axis for lax.scan.

Only numpy is required here; tensors may be torch Tensors or numpy arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import TextTowerConfig, ViltConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd, name):
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _emb(sd, name):
    return jnp.asarray(_np(sd[f"{name}.weight"]))


def _stack(trees):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def strip_prefix(state_dict, prefix: str):
    """Return a view of state_dict with ``prefix`` removed from keys."""
    if not prefix:
        return dict(state_dict)
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def bert_params_from_torch(state_dict, cfg: TextTowerConfig, prefix: str = ""):
    """Convert HF BertModel/RobertaModel state_dict (add_pooling_layer=False)."""
    sd = strip_prefix(state_dict, prefix)
    params = {
        "embeddings": {
            "word": _emb(sd, "embeddings.word_embeddings"),
            "position": _emb(sd, "embeddings.position_embeddings"),
            "token_type": _emb(sd, "embeddings.token_type_embeddings"),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        }
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        layers.append({
            "q": _lin(sd, f"{p}.attention.self.query"),
            "k": _lin(sd, f"{p}.attention.self.key"),
            "v": _lin(sd, f"{p}.attention.self.value"),
            "attn_out": _lin(sd, f"{p}.attention.output.dense"),
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "mlp_in": _lin(sd, f"{p}.intermediate.dense"),
            "mlp_out": _lin(sd, f"{p}.output.dense"),
            "mlp_ln": _ln(sd, f"{p}.output.LayerNorm"),
        })
    params["layers"] = _stack(layers)
    return params


def vilt_params_from_torch(state_dict, cfg: ViltConfig, prefix: str = ""):
    """Convert HF ViltModel state_dict (optionally under e.g. 'vilt.')."""
    sd = strip_prefix(state_dict, prefix)
    params = {
        "text_embeddings": {
            "word": _emb(sd, "embeddings.text_embeddings.word_embeddings"),
            "position": _emb(sd, "embeddings.text_embeddings.position_embeddings"),
            "token_type": _emb(sd, "embeddings.text_embeddings.token_type_embeddings"),
            "ln": _ln(sd, "embeddings.text_embeddings.LayerNorm"),
        },
        "cls_token": jnp.asarray(_np(sd["embeddings.cls_token"]).reshape(-1)),
        "patch_proj": {
            "w": jnp.asarray(_np(sd["embeddings.patch_embeddings.projection.weight"])),
            "b": jnp.asarray(_np(sd["embeddings.patch_embeddings.projection.bias"])),
        },
        "pos_embeddings": jnp.asarray(
            _np(sd["embeddings.position_embeddings"]).reshape(-1, cfg.hidden_size)),
        "modality_type": _emb(sd, "embeddings.token_type_embeddings"),
        "final_ln": _ln(sd, "layernorm"),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        layers.append({
            "ln_before": _ln(sd, f"{p}.layernorm_before"),
            "q": _lin(sd, f"{p}.attention.attention.query"),
            "k": _lin(sd, f"{p}.attention.attention.key"),
            "v": _lin(sd, f"{p}.attention.attention.value"),
            "attn_out": _lin(sd, f"{p}.attention.output.dense"),
            "ln_after": _ln(sd, f"{p}.layernorm_after"),
            "mlp_in": _lin(sd, f"{p}.intermediate.dense"),
            "mlp_out": _lin(sd, f"{p}.output.dense"),
        })
    params["layers"] = _stack(layers)
    if "pooler.dense.weight" in sd:
        params["pooler"] = _lin(sd, "pooler.dense")
    return params


# ---------------------------------------------------------------------------
# Reverse converters: our pytrees -> HF torch state_dicts (interop back out)
# ---------------------------------------------------------------------------

def _t(x):
    import torch

    return torch.tensor(np.asarray(x, np.float32))


def _lin_out(sd, name, p):
    sd[f"{name}.weight"] = _t(p["w"]).T.contiguous()
    if "b" in p:
        sd[f"{name}.bias"] = _t(p["b"])


def _ln_out(sd, name, p):
    sd[f"{name}.weight"] = _t(p["scale"])
    sd[f"{name}.bias"] = _t(p["bias"])


def bert_params_to_torch(params, cfg: TextTowerConfig, prefix: str = ""):
    """Our BERT pytree -> HF BertModel(add_pooling_layer=False) state_dict."""
    import torch

    sd = {}
    emb = params["embeddings"]
    sd["embeddings.word_embeddings.weight"] = _t(emb["word"])
    sd["embeddings.position_embeddings.weight"] = _t(emb["position"])
    sd["embeddings.token_type_embeddings.weight"] = _t(emb["token_type"])
    _ln_out(sd, "embeddings.LayerNorm", emb["ln"])
    n = cfg.num_hidden_layers
    for i in range(n):
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        p = f"encoder.layer.{i}"
        _lin_out(sd, f"{p}.attention.self.query", lp["q"])
        _lin_out(sd, f"{p}.attention.self.key", lp["k"])
        _lin_out(sd, f"{p}.attention.self.value", lp["v"])
        _lin_out(sd, f"{p}.attention.output.dense", lp["attn_out"])
        _ln_out(sd, f"{p}.attention.output.LayerNorm", lp["attn_ln"])
        _lin_out(sd, f"{p}.intermediate.dense", lp["mlp_in"])
        _lin_out(sd, f"{p}.output.dense", lp["mlp_out"])
        _ln_out(sd, f"{p}.output.LayerNorm", lp["mlp_ln"])
    return {prefix + k: v for k, v in sd.items()}


def vilt_params_to_torch(params, cfg: ViltConfig, prefix: str = ""):
    """Our ViLT pytree -> HF ViltModel state_dict."""
    import torch

    sd = {}
    te = params["text_embeddings"]
    sd["embeddings.text_embeddings.word_embeddings.weight"] = _t(te["word"])
    sd["embeddings.text_embeddings.position_embeddings.weight"] = _t(te["position"])
    sd["embeddings.text_embeddings.token_type_embeddings.weight"] = _t(te["token_type"])
    _ln_out(sd, "embeddings.text_embeddings.LayerNorm", te["ln"])
    sd["embeddings.cls_token"] = _t(params["cls_token"]).reshape(1, 1, -1)
    sd["embeddings.patch_embeddings.projection.weight"] = _t(params["patch_proj"]["w"])
    sd["embeddings.patch_embeddings.projection.bias"] = _t(params["patch_proj"]["b"])
    sd["embeddings.position_embeddings"] = _t(params["pos_embeddings"])[None]
    sd["embeddings.token_type_embeddings.weight"] = _t(params["modality_type"])
    _ln_out(sd, "layernorm", params["final_ln"])
    for i in range(cfg.num_hidden_layers):
        lp = jax.tree.map(lambda x: x[i], params["layers"])
        p = f"encoder.layer.{i}"
        _ln_out(sd, f"{p}.layernorm_before", lp["ln_before"])
        _lin_out(sd, f"{p}.attention.attention.query", lp["q"])
        _lin_out(sd, f"{p}.attention.attention.key", lp["k"])
        _lin_out(sd, f"{p}.attention.attention.value", lp["v"])
        _lin_out(sd, f"{p}.attention.output.dense", lp["attn_out"])
        _ln_out(sd, f"{p}.layernorm_after", lp["ln_after"])
        _lin_out(sd, f"{p}.intermediate.dense", lp["mlp_in"])
        _lin_out(sd, f"{p}.output.dense", lp["mlp_out"])
    if "pooler" in params:
        _lin_out(sd, "pooler.dense", params["pooler"])
    return {prefix + k: v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Task-head converters (HF ViltFor* checkpoints -> our head pytrees)
# ---------------------------------------------------------------------------

def mlm_head_from_torch(state_dict, prefix: str = "mlm_score."):
    """ViltForMaskedLM's mlm_score (modeling_vilt.py:889-908); the decoder is
    tied to the word embeddings so only transform + bias are stored."""
    sd = strip_prefix(state_dict, prefix)
    return {
        "transform": _lin(sd, "transform.dense"),
        "transform_ln": _ln(sd, "transform.LayerNorm"),
        "bias": jnp.asarray(_np(sd["bias"])),
    }


def vqa_head_from_torch(state_dict, prefix: str = "classifier."):
    """ViltForQuestionAnswering's Sequential(Linear, LN, GELU, Linear)."""
    sd = strip_prefix(state_dict, prefix)
    return {"in": _lin(sd, "0"), "ln": _ln(sd, "1"), "out": _lin(sd, "3")}


def rank_head_from_torch(state_dict, prefix: str = ""):
    """ViltForImageAndTextRetrieval's rank_output, or the itm-checkpoint
    surgery: a 2-way itm_score head's row 1 becomes the rank head
    (vault/models/vault/model.py:375-405)."""
    sd = strip_prefix(state_dict, prefix)
    if "rank_output.weight" in sd:
        return {"out": _lin(sd, "rank_output")}
    # itm_score is Sequential(Linear(h,h*2), LN, GELU, Linear(h*2,2))? No —
    # for vilt-b32-finetuned-coco the original itm head is Linear(h, 2).
    itm = _lin(sd, "itm_score.fc" if "itm_score.fc.weight" in sd else "itm_score")
    return {"out": {"w": itm["w"][:, 1:2], "b": itm["b"][1:2]}}


def pair_head_from_torch(state_dict, prefix: str = "classifier."):
    """ViltForImagesAndTextClassification's NLVR2 classifier."""
    sd = strip_prefix(state_dict, prefix)
    return {"in": _lin(sd, "0"), "ln": _ln(sd, "1"), "out": _lin(sd, "3")}
