"""2-stage pipelined VAuLT — the TPU rebuild of ``PipelineVaultMixin``.

Reference (vault/models/vault/model.py:221-366): BERT tower on one device,
ViLT on another; the batch is split into ``inner_batch_size`` micro-batches
and LM(i+1) overlaps ViLT(i) in a 1-deep software pipeline; outputs are
concatenated, with an optional output device.

TPU-native expression: the two tower programs are jit-compiled with explicit
device placement; the host loop dispatches micro-batches asynchronously (JAX
dispatch is non-blocking), which yields exactly the reference's LM(i+1)/
ViLT(i) overlap — the role its CUDA streams played — with ICI/PCIe transfers
handled by ``jax.device_put`` of the activation.

For intra-model scaling use the mesh DP/TP path instead
(vault_tpu/parallel/mesh.py, sharding.py) — this module exists for capability
parity with the reference's only model-parallel construct.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vault_tpu.config import VaultConfig
from vault_tpu.models import bert as bert_mod
from vault_tpu.models import vilt as vilt_mod


class PipelineVault:
    def __init__(self, params, cfg: VaultConfig,
                 lm_device=None, vilt_device=None, output_device=None,
                 inner_batch_size: Optional[int] = None):
        assert cfg.text_tower is not None, "pipeline needs the LM tower"
        devices = jax.devices()
        self.lm_device = lm_device or devices[0]
        self.vilt_device = vilt_device or devices[min(1, len(devices) - 1)]
        self.output_device = output_device
        self.inner_batch_size = inner_batch_size
        self.cfg = cfg

        self.bert_params = jax.device_put(params["bert"], self.lm_device)
        self.vilt_params = jax.device_put(params["vilt"], self.vilt_device)

        tower = cfg.text_tower
        vilt_cfg = cfg.resolved_vilt()

        def lm_step(p, input_ids, attention_mask, token_type_ids):
            if tower.type_vocab_size < 2 and token_type_ids is not None:
                token_type_ids = jnp.zeros_like(token_type_ids)
            return bert_mod.bert_apply(p, tower, input_ids, attention_mask,
                                       token_type_ids)

        def vilt_step(p, inputs_embeds, attention_mask, token_type_ids,
                      pixel_values, pixel_mask):
            out = vilt_mod.vilt_apply(
                p, vilt_cfg, attention_mask=attention_mask,
                token_type_ids=token_type_ids, pixel_values=pixel_values,
                pixel_mask=pixel_mask, inputs_embeds=inputs_embeds)
            return out.last_hidden_state, out.pooler_output

        # placement follows the inputs: params were device_put to each stage's
        # device, so each jitted program executes on its stage
        self._lm_step = jax.jit(lm_step)
        self._vilt_step = jax.jit(vilt_step)

    def _split(self, batch: Dict[str, np.ndarray]) -> List[Dict]:
        n = next(iter(batch.values())).shape[0]
        mb = self.inner_batch_size or n
        return [{k: v[i:i + mb] for k, v in batch.items()}
                for i in range(0, n, mb)]

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 pixel_values=None, pixel_mask=None):
        micros = self._split(dict(
            input_ids=input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, pixel_values=pixel_values,
            pixel_mask=pixel_mask))

        outs = []
        # async dispatch: LM(i+1) is enqueued while ViLT(i) still runs
        lm_hidden = [None] * len(micros)
        for i, m in enumerate(micros):
            lm_hidden[i] = self._lm_step(
                self.bert_params,
                jax.device_put(m["input_ids"], self.lm_device),
                jax.device_put(m["attention_mask"], self.lm_device),
                jax.device_put(m["token_type_ids"], self.lm_device))
            if i > 0:
                outs.append(self._dispatch_vilt(micros[i - 1], lm_hidden[i - 1]))
        outs.append(self._dispatch_vilt(micros[-1], lm_hidden[-1]))

        last = jnp.concatenate([o[0] for o in outs], axis=0)
        pooled = jnp.concatenate([o[1] for o in outs], axis=0)
        if self.output_device is not None:
            last = jax.device_put(last, self.output_device)
            pooled = jax.device_put(pooled, self.output_device)
        return vilt_mod.ViltOutput(last_hidden_state=last,
                                   pooler_output=pooled, attention_mask=None)

    def _dispatch_vilt(self, micro, hidden):
        return self._vilt_step(
            self.vilt_params,
            jax.device_put(hidden, self.vilt_device),
            jax.device_put(micro["attention_mask"], self.vilt_device),
            jax.device_put(micro["token_type_ids"], self.vilt_device),
            jax.device_put(micro["pixel_values"], self.vilt_device),
            jax.device_put(micro["pixel_mask"], self.vilt_device))
