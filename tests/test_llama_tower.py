"""Llama tower parity vs HF LlamaModel + ViLT composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import tiny_vilt_config
from vault_tpu.models.llama import (
    LlamaConfig,
    init_llama,
    init_lm_projection,
    llama_apply,
    llama_params_from_torch,
    tiny_llama_config,
)
from vault_tpu.models.vault import vault_with_llama_tower
from vault_tpu.models.vilt import init_vilt


def _hf_llama(cfg, seed=0):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaModel

    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    m = LlamaModel(hf_cfg)
    m.eval()
    return m


@pytest.mark.parametrize("unroll", [1, 2], ids=["scan", "unroll2"])
def test_llama_parity_full_mask(unroll):
    cfg = tiny_llama_config(scan_unroll=unroll)
    hf = _hf_llama(cfg)
    params = llama_params_from_torch(hf.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = llama_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    assert np.abs(np.asarray(out) - ref).max() < 2e-4


def test_gqa_grouped_matches_repeat():
    """_gqa_attend (grouped einsum, no materialized K/V repeat) must equal
    the HF repeat_kv composition (jnp.repeat + attend) exactly — same
    contraction order over D, so this pins bit-level-tight equality, with
    both a padding bias and a per-head bias through the reshape branch."""
    from vault_tpu.models.llama import _gqa_attend
    from vault_tpu.ops.attention import attend

    rng = np.random.default_rng(7)
    b, h, kvh, l, d = 2, 8, 2, 9, 16
    rep = h // kvh
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
    for bias in (
            None,
            jnp.asarray(rng.normal(size=(b, 1, l, l)) * 3, jnp.float32),
            jnp.asarray(rng.normal(size=(b, h, l, l)) * 3, jnp.float32)):
        ref = attend(jnp.repeat(q, 1, axis=1),
                     jnp.repeat(k, rep, axis=1),
                     jnp.repeat(v, rep, axis=1), bias)
        got = _gqa_attend(q, k, v, bias, rep)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-6


def test_gqa_pallas_kernel_matches_xla():
    """fused_attention_gqa (interpret mode on CPU — same kernel body the
    TPU runs) vs the XLA grouped path, at GQA and rep=1 shapes, with a
    causal+padding 2-D bias."""
    from vault_tpu.models.llama import _gqa_attend
    from vault_tpu.ops.pallas_attention import fused_attention_gqa

    rng = np.random.default_rng(11)
    for h, kvh in ((8, 2), (4, 4)):
        b, l, d = 2, 10, 16
        rep = h // kvh
        q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
        causal = jnp.tril(jnp.ones((l, l), jnp.float32))[None, None]
        pad = jnp.asarray(rng.integers(0, 2, (b, 1, 1, l)), jnp.float32)
        pad = pad.at[..., 0].set(1.0)  # no fully-masked rows
        bias = (1.0 - causal * pad) * jnp.finfo(jnp.float32).min
        ref = _gqa_attend(q, k, v, bias, rep)
        got = fused_attention_gqa(q, k, v, bias, interpret=True)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


def test_llama_parity_pallas_attn():
    """The full tower through attn_impl="pallas" (kernel in interpret
    mode) must still match HF LlamaModel."""
    cfg = tiny_llama_config(attn_impl="pallas")
    hf = _hf_llama(cfg)
    params = llama_params_from_torch(hf.state_dict(), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = llama_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    assert np.abs(np.asarray(out) - ref).max() < 2e-4


def test_llama_parity_padded():
    cfg = tiny_llama_config()
    hf = _hf_llama(cfg, seed=1)
    params = llama_params_from_torch(hf.state_dict(), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = np.asarray(llama_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    valid = mask.astype(bool)
    assert np.abs(out - ref)[valid].max() < 2e-4


def test_llama_vilt_composition():
    llama_cfg = tiny_llama_config(hidden_size=48, num_attention_heads=4,
                                  num_key_value_heads=2)
    vilt_cfg = tiny_vilt_config()
    params = {
        "llama": init_llama(jax.random.PRNGKey(0), llama_cfg),
        "vilt": init_vilt(jax.random.PRNGKey(1), vilt_cfg),
        "lm_proj": init_lm_projection(jax.random.PRNGKey(2), 48,
                                      vilt_cfg.hidden_size),
    }
    rng = np.random.default_rng(0)
    ids = rng.integers(0, llama_cfg.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int64)
    pixels = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    pmask = np.ones((2, 64, 64), np.int64)
    out = vault_with_llama_tower(params, vilt_cfg, llama_cfg,
                                 jnp.asarray(ids), jnp.asarray(mask),
                                 pixel_values=jnp.asarray(pixels),
                                 pixel_mask=jnp.asarray(pmask))
    assert out.pooler_output.shape == (2, vilt_cfg.hidden_size)
    assert np.isfinite(np.asarray(out.pooler_output)).all()


def test_llama_vilt_mesh_inference():
    # batched TPU-mesh inference shape for the stretch config: DP over 8
    # virtual devices with TP-style replicated params
    from vault_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    llama_cfg = tiny_llama_config(hidden_size=48, num_attention_heads=4,
                                  num_key_value_heads=2)
    vilt_cfg = tiny_vilt_config()
    params = {
        "llama": init_llama(jax.random.PRNGKey(0), llama_cfg),
        "vilt": init_vilt(jax.random.PRNGKey(1), vilt_cfg),
        "lm_proj": init_lm_projection(jax.random.PRNGKey(2), 48,
                                      vilt_cfg.hidden_size),
    }
    mesh = make_mesh(num_data=8)
    params = replicate(mesh, params)
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=rng.integers(0, llama_cfg.vocab_size, (16, 10)).astype(np.int32),
        attention_mask=np.ones((16, 10), np.int32),
        pixel_values=rng.normal(size=(16, 3, 64, 64)).astype(np.float32),
        pixel_mask=np.ones((16, 64, 64), np.int32),
    )
    batch = shard_batch(mesh, batch)

    @jax.jit
    def fwd(p, b):
        return vault_with_llama_tower(p, vilt_cfg, llama_cfg, **b).pooler_output

    out = fwd(params, batch)
    assert out.shape == (16, vilt_cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_probe_llama8b_host_quant_matches_ops_quantize():
    """scripts/probe_llama8b.py initializes + w8-quantizes the 8B tower
    host-side in numpy (an on-device fp32 init would need 32 GB HBM); its
    format must stay BIT-identical to ops.quantize so `linear()` dispatches
    the same dequant-fused matmul, and the tree must match what
    quantize_model_params(init_llama(...)) would produce."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "scripts"))
    from probe_llama8b import _np_quant_linear, build_llama_w8
    from vault_tpu.models.llama import init_llama, tiny_llama_config
    from vault_tpu.ops.quantize import quantize_model_params, quantize_weight

    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 4), dtype=np.float32) * 0.02
    q_ref, s_ref = quantize_weight(jnp.asarray(w))
    hq = _np_quant_linear(np.random.default_rng(1), 8, 4)
    np.testing.assert_array_equal(np.asarray(q_ref), hq["w_q"])
    np.testing.assert_allclose(np.asarray(s_ref), hq["w_scale"], rtol=1e-6)

    cfg = tiny_llama_config()
    qp = quantize_model_params(init_llama(jax.random.PRNGKey(0), cfg))
    hostq = jax.tree.map(jnp.asarray, build_llama_w8(cfg, seed=0))
    assert (jax.tree_util.tree_structure(qp)
            == jax.tree_util.tree_structure(hostq))
    # and the quantized tower actually runs through llama_apply
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)), jnp.int32)
    out = llama_apply(hostq, cfg, ids)
    assert out.shape == (2, 8, cfg.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()
