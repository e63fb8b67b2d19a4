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
        # synthesize the optional masks/types like vilt_apply does — the
        # micro-batch splitter slices every value, so None can't flow through
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(input_ids.shape, jnp.int32)
        if pixel_values is None:
            raise ValueError("PipelineVault requires pixel_values (the ViLT "
                             "stage has no external image_embeds path here)")
        if pixel_mask is None:
            pixel_mask = jnp.ones((pixel_values.shape[0],
                                   *pixel_values.shape[2:]), jnp.int32)
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


# ---------------------------------------------------------------------------
# Trainable pipeline
# ---------------------------------------------------------------------------

def make_pipeline_train_fn(cfg: VaultConfig, loss_fn, params,
                           lm_device=None, vilt_device=None,
                           num_micro: int = 2, head_dropout: float = 0.0):
    """Differentiable 2-stage pipeline train function — the capability the
    reference's ``PipelineVaultMixin`` gets from torch autograd across its two
    CUDA devices (vault/models/vault/model.py:221-366: forward crosses
    lm_device -> vilt_device per micro-batch at :327-337, the overlap loop is
    :340-366, and backward flows back through the same ``.to()`` transfers).

    TPU-native expression: three single-device jitted programs —
      * ``lm_fwd``  (lm_device):   LM tower forward on a micro-batch;
      * ``stage2``  (vilt_device): ViLT + head forward AND backward, returning
        (weighted loss, grads of vilt/head, cotangent w.r.t. the incoming
        activation);
      * ``lm_bwd``  (lm_device):   LM backward given that cotangent shuttled
        back across the device boundary (flash-style: recomputes the LM
        forward instead of shipping residuals across devices).
    The host loop dispatches micro-batches asynchronously, so LM(i+1) overlaps
    stage2(i) — the same 1-deep software pipeline as the reference — and each
    stage's parameter gradients accumulate on that stage's own device.

    Returns ``fn(params, batch, labels, weight, rng) -> (loss, grads)``;
    place ``params`` with :func:`place_pipeline_params`.  (``params`` is only
    used as a structure prototype here.)
    """
    del params  # structure prototype; placement is by top-level key
    devices = jax.devices()
    lm_device = lm_device or devices[0]
    vilt_device = vilt_device or devices[min(1, len(devices) - 1)]
    vilt_cfg = cfg.resolved_vilt()

    from vault_tpu.models.vault import classifier_head_apply, lm_encode

    def lm_fn(bert_p, mb, rng):
        return lm_encode({"bert": bert_p}, cfg, mb["input_ids"],
                         mb["attention_mask"], mb.get("token_type_ids"),
                         deterministic=rng is None, rng=rng)

    def stage2_fn(p2, hidden, mb, lb, wb, rng):
        r_vilt = r_head = None
        if rng is not None:
            r_vilt, r_head = jax.random.split(rng)

        def wloss(p2, hidden):
            out = vilt_mod.vilt_apply(
                p2["vilt"], vilt_cfg, attention_mask=mb["attention_mask"],
                token_type_ids=mb.get("token_type_ids"),
                pixel_values=mb["pixel_values"], pixel_mask=mb["pixel_mask"],
                inputs_embeds=hidden, deterministic=rng is None, rng=r_vilt)
            logits = classifier_head_apply(p2["head"], out.pooler_output,
                                           head_dropout, rng is None, r_head)
            # weighted SUM form so micro-batch contributions add exactly
            return loss_fn(logits, lb, wb) * wb.sum()

        val, (g_p2, g_hidden) = jax.value_and_grad(wloss, argnums=(0, 1))(
            p2, hidden)
        return val, g_p2, g_hidden

    def lm_bwd_fn(bert_p, mb, ct, rng):
        # VJP by recompute: grad of <lm_fwd(p), ct>
        return jax.grad(lambda p: jnp.vdot(
            lm_fn(p, mb, rng).astype(jnp.float32), ct.astype(jnp.float32)))(
                bert_p)

    lm_fwd = jax.jit(lm_fn)
    stage2 = jax.jit(stage2_fn)
    lm_bwd = jax.jit(lm_bwd_fn)

    def fn(params, batch, labels, weight, rng=None):
        n = labels.shape[0]
        # ceil split so the remainder rows are COVERED when n % num_micro
        # != 0 (a floor split silently dropped them while still normalizing
        # by the full weight.sum(), biasing loss and grads); the weighted-
        # SUM micro losses make unequal micro sizes exact.  The last micro
        # may be shorter (at most one extra jit shape).
        nm = min(num_micro, max(int(n), 1))
        mbsz = -(-n // nm)
        # re-derive nm from the ceil size: with mbsz=ceil(n/nm) the final
        # slice is empty whenever (nm-1)*mbsz >= n (e.g. n=9, num_micro=4 ->
        # [0:3],[3:6],[6:9],[9:9]); ceil(n/mbsz) counts only non-empty slices
        nm = -(-max(int(n), 1) // mbsz)
        to_lm = lambda t: jax.device_put(t, lm_device)
        to_vilt = lambda t: jax.device_put(t, vilt_device)
        p2 = {"vilt": params["vilt"], "head": params["head"]}

        def micro(i):
            sl = slice(i * mbsz, min(n, (i + 1) * mbsz))
            return ({k: v[sl] for k, v in batch.items()}, labels[sl],
                    weight[sl])

        if rng is not None:
            ks = jax.random.split(rng, 2 * nm)
            lm_rngs, s2_rngs = ks[:nm], ks[nm:]
        else:
            lm_rngs = s2_rngs = [None] * nm

        def run_stage2(i):
            mb, lb, wb = micro(i)
            return stage2(p2, to_vilt(hiddens[i]), jax.tree.map(to_vilt, mb),
                          to_vilt(lb), to_vilt(wb), s2_rngs[i])

        # ---- 1-deep software pipeline: dispatch LM(i+1) before stage2(i)
        hiddens, stage2_out = [None] * nm, [None] * nm
        for i in range(nm):
            mb, _, _ = micro(i)
            hiddens[i] = lm_fwd(params["bert"],
                                jax.tree.map(to_lm, mb), lm_rngs[i])
            if i > 0:
                stage2_out[i - 1] = run_stage2(i - 1)
        stage2_out[nm - 1] = run_stage2(nm - 1)

        # ---- backward shuttle: cotangents cross vilt -> lm per micro-batch
        g_bert = None
        loss_sum = jnp.float32(0.0)
        g_p2_acc = None
        for i in range(nm):
            val, g_p2, g_hidden = stage2_out[i]
            loss_sum = loss_sum + jax.device_put(val, vilt_device)
            g_p2_acc = g_p2 if g_p2_acc is None else jax.tree.map(
                jnp.add, g_p2_acc, g_p2)
            mb, _, _ = micro(i)
            g = lm_bwd(params["bert"], jax.tree.map(to_lm, mb),
                       to_lm(g_hidden), lm_rngs[i])
            g_bert = g if g_bert is None else jax.tree.map(jnp.add, g_bert, g)

        wsum = jnp.maximum(weight.sum(), 1.0)
        scale_lm = to_lm(1.0 / wsum)
        scale_vilt = to_vilt(1.0 / wsum)
        grads = {"bert": jax.tree.map(lambda g: g * scale_lm, g_bert),
                 "vilt": jax.tree.map(lambda g: g * scale_vilt,
                                      g_p2_acc["vilt"]),
                 "head": jax.tree.map(lambda g: g * scale_vilt,
                                      g_p2_acc["head"])}
        return loss_sum / to_vilt(wsum), grads

    return fn


def place_pipeline_params(params, lm_device=None, vilt_device=None):
    """Stage placement: LM tower on lm_device; ViLT + heads on vilt_device
    (the reference's from_pretrained placement, model.py:259-284)."""
    devices = jax.devices()
    lm_device = lm_device or devices[0]
    vilt_device = vilt_device or devices[min(1, len(devices) - 1)]
    placed = {}
    for k, v in params.items():
        placed[k] = jax.device_put(v, lm_device if k == "bert" else vilt_device)
    return placed
