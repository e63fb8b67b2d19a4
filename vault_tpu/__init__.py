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
