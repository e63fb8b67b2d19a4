"""vault_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of gchochla/VAuLT.

VAuLT: a pretrained BERT/BERTweet language tower encodes the text; its
contextual embeddings replace ViLT's token-embedding lookup; ViLT's joint
text+image co-encoder and task heads run on top (reference:
vault/models/vault/model.py:20-27, 207-218; arXiv 2208.09021).

Design: pure-functional models (params are pytrees; ``init``/``apply`` pairs),
static shapes throughout, lax.scan over stacked encoder layers, data
parallelism via ``jax.sharding`` meshes, Pallas kernels for the co-encoder
hot loop.
"""

__version__ = "0.1.0"

# Public API surface (kept import-light: heavy deps load on first use).
from vault_tpu.config import (  # noqa: E402,F401
    TextTowerConfig,
    VaultConfig,
    ViltConfig,
    bertweet_config,
)


def __getattr__(name):
    """Lazy re-exports of the main entry points."""
    import importlib

    table = {
        "init_vault": ("vault_tpu.models.vault", "init_vault"),
        "vault_apply": ("vault_tpu.models.vault", "vault_apply"),
        "vault_for_classification": ("vault_tpu.models.vault",
                                     "vault_for_classification"),
        "VaultProcessor": ("vault_tpu.data.processor", "VaultProcessor"),
        "VaultPipeline": ("vault_tpu.pipeline_api", "VaultPipeline"),
        "Trainer": ("vault_tpu.training.trainer", "Trainer"),
        "TrainArgs": ("vault_tpu.training.trainer", "TrainArgs"),
        "ExperimentHandler": ("vault_tpu.training.experiment",
                              "ExperimentHandler"),
        "InferenceServer": ("vault_tpu.serving", "InferenceServer"),
        "quantize_model_params": ("vault_tpu.ops.quantize",
                                  "quantize_model_params"),
        "vault_base": ("vault_tpu.presets", "vault_base"),
        "load_vault_backbone": ("vault_tpu.models.pretrained",
                                "load_vault_backbone"),
        "build_tokenizer": ("vault_tpu.models.pretrained", "build_tokenizer"),
    }
    if name in table:
        mod, attr = table[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
