"""High-level inference pipeline: processor + jitted model in one object.

The serving-side counterpart of the reference's README quickstart
(README.md:34-58): processor(image, text) -> model forward -> embeddings /
logits, with fixed-shape batching so one compilation serves all calls (pad
to ``max_batch`` and mask).  Throughput/latency counters included (the p50
process+encode metric in BASELINE.md)."""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig
from vault_tpu.data.processor import VaultProcessor
from vault_tpu.models.vault import vault_apply
from vault_tpu.utils.profiling import StepTimer


class VaultPipeline:
    def __init__(self, params, cfg: VaultConfig, processor: VaultProcessor,
                 max_batch: int = 16, head_fn=None, merge_patches_to=None,
                 merge_at_layer=0):
        """head_fn(params, ViltOutput) -> task output; default returns
        (last_hidden_state, pooler_output).  ``merge_patches_to`` /
        ``merge_at_layer``: opt-in ToMe patch-token merging (the serving
        accelerator — ops/token_merge.py, budgets in docs/BENCHMARKS.md)."""
        self.params = params
        self.cfg = cfg
        self.processor = processor
        self.max_batch = max_batch
        # NOTE: deliberately NOT stored as an attribute — the jitted fwd
        # below closes over it, so a post-construction reassignment would
        # silently have no effect; build a new pipeline for a new head
        self.preprocess_timer = StepTimer()
        self.forward_timer = StepTimer()

        def fwd(p, batch):
            out = vault_apply(p, cfg, merge_patches_to=merge_patches_to,
                              merge_at_layer=merge_at_layer, **batch)
            if head_fn is not None:
                return head_fn(p, out)
            return out.last_hidden_state, out.pooler_output

        self._fwd = jax.jit(fwd)

    def _pad(self, enc: Dict[str, np.ndarray], n: int):
        pad_n = self.max_batch - n
        if pad_n == 0:
            return enc
        return {k: np.pad(v, [(0, pad_n)] + [(0, 0)] * (v.ndim - 1))
                for k, v in enc.items()}

    def __call__(self, images, texts):
        if isinstance(texts, str):
            texts = [texts]
        if not isinstance(images, (list, tuple)):
            images = [images]
        n = len(texts)
        # real raises, not asserts (asserts vanish under python -O, and a
        # mismatch would otherwise surface as an opaque XLA shape error
        # deep inside the jitted trace)
        if len(images) != n:
            raise ValueError(
                f"got {len(images)} images for {n} texts — the pipeline "
                "pairs them elementwise")
        if n > self.max_batch:
            raise ValueError(f"batch {n} > max_batch {self.max_batch}")
        with self.preprocess_timer:
            enc = self.processor(list(images), list(texts))
        enc = self._pad(enc, n)
        with self.forward_timer:
            out = self._fwd(self.params, {k: jnp.asarray(v)
                                          for k, v in enc.items()})
            out = jax.tree.map(lambda x: np.asarray(x)[:n], out)
        return out

    def stats(self) -> Dict[str, Dict[str, float]]:
        return {"preprocess": self.preprocess_timer.summary(),
                "forward": self.forward_timer.summary()}
