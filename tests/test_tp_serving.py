"""Tests: tensor-parallel SERVING (scripts/serve.py --tp) — quantized
params shard under the Megatron rules and the GSPMD forward matches the
single-device forward.

The reference serves from a notebook on one GPU; TP serving is the
TPU-native scale-out (SURVEY.md §2.8): params Megatron-sharded over a
1xN "model" mesh, batch replicated, XLA/GSPMD emitting the collectives.
The int8 paths have an exactness story worth locking down: the int8
dots accumulate in int32 and the per-row activation absmax is
order-independent, so the TP w8a8 forward is not merely close to the
single-device one — the quantized values and int32 dot results are
identical, with only fp32 dequant/LN reduction order differing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.ops.quantize import quantize_model_params
from vault_tpu.parallel.mesh import make_mesh, replicated
from vault_tpu.parallel.sharding import shard_params, vault_param_specs


def _tiny_cfg():
    return VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=6),
        text_tower=tiny_text_config(num_hidden_layers=2),
    )


def _params(cfg, n_classes=3):
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, n_classes)
    return params


def _batch(cfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.text_tower.vocab_size, (n, 8)),
                              jnp.int32),
        attention_mask=jnp.ones((n, 8), jnp.int32),
        token_type_ids=jnp.zeros((n, 8), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(n, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((n, 32, 32), jnp.int32),
    )


def test_quantized_tp_specs():
    """w_q/w_q8 shard like w; w_scale follows the out dim (sharded for
    column-parallel, replicated for row-parallel where the sharded dim is
    the contraction dim)."""
    cfg = _tiny_cfg()
    for mode in ("w8", "w8a8"):
        qparams = quantize_model_params(_params(cfg), mode=mode)
        specs = vault_param_specs(qparams)
        wk = "w_q" if mode == "w8" else "w_q8"
        assert specs["bert"]["layers"]["q"][wk] == P(None, None, "model")
        assert specs["bert"]["layers"]["q"]["w_scale"] == P(None, None, "model")
        assert specs["bert"]["layers"]["attn_out"][wk] == P(None, "model", None)
        assert specs["bert"]["layers"]["attn_out"]["w_scale"] == P()
        assert specs["bert"]["layers"]["mlp_out"]["b"] == P()
        # head/embeddings stay replicated
        assert specs["head"]["out"]["w"] == P()


@pytest.mark.parametrize("mode", [None, "w8", "w8a8"])
def test_tp_serving_forward_matches_single_device(mode):
    """The scripts/serve.py --tp composition: Megatron-sharded params on a
    1x4 TP mesh + replicated batch == the single-device forward."""
    cfg = _tiny_cfg()
    params = _params(cfg)
    if mode is not None:
        params = quantize_model_params(params, mode=mode)
    batch = _batch(cfg)

    ref = vault_for_classification(params, cfg, batch, head_dropout=0.0,
                                   deterministic=True, use_pallas=False)

    mesh = make_mesh(num_data=1, num_model=4)
    sharded = shard_params(mesh, params)
    rep = replicated(mesh)

    jfwd = jax.jit(lambda p, b: vault_for_classification(
        p, cfg, b, head_dropout=0.0, deterministic=True, use_pallas=False))
    out = jfwd(sharded, jax.device_put(batch, rep))

    # fp32 end-to-end here; differences come only from reduction order in
    # the row-parallel partial sums / LN stats
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode,impl", [
    (None, False),
    # the REAL scripts/serve.py --dp compositions: fused Pallas kernels
    # (interpret mode off-TPU) running inside shard_map
    (None, "fuseqkv+fusemlp"),
    ("w8a8", "fuselnqkv+fusemlp"),
])
def test_dp_serving_forward_matches_single_device(mode, impl):
    """scripts/serve.py --dp: batch sharded over 'data' under shard_map
    (keeping per-device Pallas kernels engaged) == single-device forward
    under the SAME impl — the only difference is the sharding."""
    from vault_tpu.serving import dp_sharded_forward

    cfg = _tiny_cfg()
    params = _params(cfg)
    if mode is not None:
        params = quantize_model_params(params, mode=mode)
    batch = _batch(cfg, n=8)

    ref = vault_for_classification(params, cfg, batch, head_dropout=0.0,
                                   deterministic=True, use_pallas=impl)

    mesh = make_mesh(num_data=4, num_model=1)
    fwd = dp_sharded_forward(
        lambda p, b: vault_for_classification(p, cfg, b, head_dropout=0.0,
                                              deterministic=True,
                                              use_pallas=impl),
        mesh, params)
    out = fwd(batch)
    # per-shard math is the same program on disjoint rows — differences are
    # at most XLA fusion/layout choices at the different batch shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_tp_serving_through_batching_engine():
    """Full serving stack over a TP mesh: BatchingEngine -> replicated
    device_put -> GSPMD forward, as wired in scripts/serve.py."""
    from vault_tpu.serving import BatchingEngine

    cfg = _tiny_cfg()
    params = quantize_model_params(_params(cfg), mode="w8a8")
    mesh = make_mesh(num_data=1, num_model=2)
    sharded = shard_params(mesh, params)
    rep = replicated(mesh)

    class _Proc:
        def __call__(self, images, texts):
            return {k: np.asarray(v) for k, v in _batch(cfg, len(images)).items()}

    jfwd = jax.jit(lambda p, b: vault_for_classification(
        p, cfg, b, head_dropout=0.0, deterministic=True, use_pallas=False))
    fwd = lambda b: jfwd(sharded, jax.device_put(b, rep))

    engine = BatchingEngine(_Proc(), fwd, max_batch=4, max_wait_ms=1.0)
    try:
        out = engine.predict(np.zeros((8, 8, 3), np.uint8), "hello")
        assert out.shape == (3,) and np.isfinite(np.asarray(out)).all()
    finally:
        engine.close()


def test_pp_serving_forward_matches_single_device():
    """scripts/serve.py --pp: the 2-stage pipelined forward + head (the
    reference PipelineVaultMixin serving shape) == single-device forward."""
    from vault_tpu.models.vault import classifier_head_apply
    from vault_tpu.parallel.pipeline import PipelineVault

    cfg = _tiny_cfg()
    params = _params(cfg)
    batch = _batch(cfg, n=4)

    ref = vault_for_classification(params, cfg, batch, head_dropout=0.0,
                                   deterministic=True, use_pallas=False)

    devs = jax.devices()[:2]
    pipe = PipelineVault(params, cfg, lm_device=devs[0], vilt_device=devs[1],
                         inner_batch_size=2)
    head = jax.device_put(params["head"], pipe.vilt_device)
    out = classifier_head_apply(head, pipe(**batch).pooler_output,
                                dropout_prob=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
