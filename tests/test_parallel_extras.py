"""Tests: TP sharding rules, 2-stage pipeline, VQA normalization, entity
integration, profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.vault import init_vault, vault_apply
from vault_tpu.parallel.mesh import make_mesh
from vault_tpu.parallel.pipeline import PipelineVault
from vault_tpu.parallel.sharding import shard_params, vault_param_specs


def _tiny_cfg():
    return VaultConfig(
        vilt=tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=6),
        text_tower=tiny_text_config(num_hidden_layers=2),
    )


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


def test_tp_sharding_specs():
    cfg = _tiny_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    specs = vault_param_specs(params)
    assert specs["bert"]["layers"]["q"]["w"] == P(None, None, "model")
    assert specs["bert"]["layers"]["attn_out"]["w"] == P(None, "model", None)
    assert specs["bert"]["layers"]["mlp_in"]["w"] == P(None, None, "model")
    assert specs["bert"]["layers"]["mlp_out"]["w"] == P(None, "model", None)
    assert specs["bert"]["layers"]["attn_ln"]["scale"] == P()
    assert specs["vilt"]["text_embeddings"]["word"] == P()


def test_tp_forward_matches_replicated():
    # 4-way DP x 2-way TP mesh: sharded forward == single-device forward
    cfg = _tiny_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    ref = vault_apply(params, cfg, **batch).pooler_output

    mesh = make_mesh(num_data=4, num_model=2)
    sharded = shard_params(mesh, params)

    @jax.jit
    def fwd(p, b):
        return vault_apply(p, cfg, **b).pooler_output

    out = fwd(sharded, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_vault_matches_monolithic():
    cfg = _tiny_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, n=6)

    ref = vault_apply(params, cfg, **batch)

    devs = jax.devices()
    pipe = PipelineVault(params, cfg, lm_device=devs[0], vilt_device=devs[1],
                         inner_batch_size=2)
    out = pipe(**{k: np.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(out.pooler_output),
                               np.asarray(ref.pooler_output), atol=2e-5)
    assert out.last_hidden_state.shape == ref.last_hidden_state.shape


@pytest.mark.slow
def test_pipeline_train_grads_match_single_device():
    """The trainable 2-stage pipeline (reference PipelineVaultMixin is
    differentiable via torch autograd across its two devices,
    vault/models/vault/model.py:221-366): pipeline grads must equal
    single-device grads."""
    import jax.numpy as jnp

    from vault_tpu.models.vault import (
        classifier_head_apply,
        init_classifier_head,
        vault_for_classification,
    )
    from vault_tpu.parallel.pipeline import (
        make_pipeline_train_fn,
        place_pipeline_params,
    )
    from vault_tpu.training.losses import softmax_cross_entropy

    cfg = _tiny_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg, n=8).items()}
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, 8))
    weight = jnp.ones(8, jnp.float32)

    # single-device reference grads
    def ref_loss(p):
        logits = vault_for_classification(p, cfg, batch, head_dropout=0.0,
                                          deterministic=True)
        return softmax_cross_entropy(logits, labels, weight)

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)

    devs = jax.devices()
    placed = place_pipeline_params(params, devs[0], devs[1])
    fn = make_pipeline_train_fn(cfg, softmax_cross_entropy, params,
                                lm_device=devs[0], vilt_device=devs[1],
                                num_micro=2)
    val, grads = fn(placed, batch, labels, weight, None)

    assert abs(float(val) - float(ref_val)) < 1e-5
    # stage grads land on their stage's device
    assert jax.tree.leaves(grads["bert"])[0].devices() == {devs[0]}
    assert jax.tree.leaves(grads["vilt"])[0].devices() == {devs[1]}
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # ADVICE r2 regression: the ceil micro split must not run an EMPTY final
    # micro-batch — n=9 with num_micro=4 used to slice [0:3],[3:6],[6:9],
    # [9:9] (nm is now re-derived as ceil(n/mbsz) = 3 non-empty micros);
    # remainder rows still covered, grads still exact
    batch9 = {k: jnp.asarray(v) for k, v in _batch(cfg, n=9).items()}
    labels9 = jnp.asarray(np.random.default_rng(1).integers(0, 3, 9))
    weight9 = jnp.ones(9, jnp.float32)

    def ref_loss9(p):
        logits = vault_for_classification(p, cfg, batch9, head_dropout=0.0,
                                          deterministic=True)
        return softmax_cross_entropy(logits, labels9, weight9)

    ref_val9, ref_grads9 = jax.value_and_grad(ref_loss9)(params)
    fn9 = make_pipeline_train_fn(cfg, softmax_cross_entropy, params,
                                 lm_device=devs[0], vilt_device=devs[1],
                                 num_micro=4)
    val9, grads9 = fn9(placed, batch9, labels9, weight9, None)
    assert abs(float(val9) - float(ref_val9)) < 1e-5
    for a, b in zip(jax.tree.leaves(ref_grads9), jax.tree.leaves(grads9)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_vqa_normalize():
    from vault_tpu.data.vqa import answer_scores, normalize_word

    assert normalize_word("The Cat") == "cat"
    assert normalize_word("two") == "2"
    assert normalize_word("dont") == "don't"
    assert normalize_word("a dog!") == "dog"
    assert normalize_word("1,000") == "1000"

    label2id = {"cat": 0, "2": 1}
    scores = answer_scores(["the cat", "Cat", "cat", "two"], label2id, 3)
    np.testing.assert_allclose(scores, [1.0, 1 / 3, 0.0], atol=1e-6)


def test_entity_integration():
    from vault_tpu.text.entity_linking import (
        integrate_entities_into_embeddings,
        load_entity_cache,
        save_entity_cache,
    )
    from vault_tpu.text.wordpiece import WordPieceTokenizer

    vocab = {t: i for i, t in enumerate(
        "[PAD] [UNK] [CLS] [SEP] [MASK] alpha beta gamma".split())}
    tok = WordPieceTokenizer(vocab)
    tok.add_tokens(["[ENT1]", "[ENT2]"])
    emb = jnp.asarray(np.arange(8 * 4, dtype=np.float32).reshape(8, 4))
    out = integrate_entities_into_embeddings(emb, ["alpha beta", "gamma"], tok)
    assert out.shape == (10, 4)
    # row 8 <- max-pool(alpha, beta) = beta row; row 9 <- gamma row
    np.testing.assert_allclose(np.asarray(out[8]), np.asarray(emb[6]))
    np.testing.assert_allclose(np.asarray(out[9]), np.asarray(emb[7]))


def test_entity_cache_roundtrip(tmp_path):
    from vault_tpu.text.entity_linking import (
        entities_cache_filename,
        load_entity_cache,
        save_entity_cache,
    )

    path = entities_cache_filename(str(tmp_path), "/data/twitter2015",
                                   ["train"], "wiki_2019", 10000.0)
    cache = {"obama": ("Barack_Obama", "44th president"),
             "xyzzy": (None, None)}
    save_entity_cache(path, cache)
    loaded = load_entity_cache(path)
    assert loaded == {"obama": ("Barack_Obama", "44th president"),
                      "xyzzy": (None, None)}
    # corrupted file -> None
    with open(path, "w") as f:
        f.write("{broken")
    assert load_entity_cache(path) is None


def test_step_timer():
    from vault_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary(items_per_step=8)
    assert s["steps"] == 5 and s["items_per_sec"] > 0


@pytest.mark.slow
def test_shard_map_step_matches_gspmd():
    """The explicit psum train step equals the GSPMD-annotated step."""
    import optax

    from vault_tpu.models.vault import init_classifier_head, vault_for_classification
    from vault_tpu.parallel.mesh import replicate, shard_batch
    from vault_tpu.parallel.shard_map_step import make_shard_map_train_step

    cfg = _tiny_cfg()
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size, 3)
    batch = _batch(cfg, n=8)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, 8))
    weight = jnp.ones(8, jnp.float32)

    def apply_fn(p, b, deterministic, rng):
        return vault_for_classification(p, cfg, b, head_dropout=0.0,
                                        deterministic=True)

    def per_example_ce(logits, labels):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]

    tx = optax.sgd(1e-2)
    mesh = make_mesh(num_data=8)

    # GSPMD path: sharded inputs, jit infers the collective
    def gspmd_step(p, s, b, l, w):
        def loss_fn(pp):
            per = per_example_ce(apply_fn(pp, b, True, None), l)
            return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, s = tx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    p0 = replicate(mesh, jax.device_get(params))
    s0 = replicate(mesh, tx.init(jax.device_get(params)))
    b_sh = shard_batch(mesh, batch)
    l_sh = shard_batch(mesh, labels)
    w_sh = shard_batch(mesh, weight)
    p_ref, _, loss_ref = jax.jit(gspmd_step)(p0, s0, b_sh, l_sh, w_sh)

    # explicit shard_map path
    step = make_shard_map_train_step(apply_fn, per_example_ce, tx, mesh)
    p1 = replicate(mesh, jax.device_get(params))
    s1 = replicate(mesh, tx.init(jax.device_get(params)))
    p_out, _, loss_out = step(p1, s1, b_sh, l_sh, w_sh, jax.random.PRNGKey(0))

    assert abs(float(loss_out) - float(loss_ref)) < 1e-6
    for a, b in zip(jax.tree.leaves(jax.device_get(p_ref)),
                    jax.tree.leaves(jax.device_get(p_out))):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_offline_entity_linker(tmp_path):
    """OfflineEntityLinker: alias lookup, best-score disambiguation, the
    reference's confidence gate (entity kept, description withheld below
    threshold, vault/entity_linking.py:88-92), and the disambiguation-page
    retry that follows the first suggestion (:101-108)."""
    import json

    from vault_tpu.text.entity_linking import (
        OfflineEntityLinker,
        build_entity_cache,
        load_entity_cache,
    )

    store = tmp_path / "wiki_store.json"
    store.write_text(json.dumps({
        "aliases": {
            "obama": [["Barack_Obama", 0.9], ["Obama_(surname)", 0.2]],
            "apple": [["Apple_Inc.", 0.6]],
            "mercury": [["Mercury", 0.8]],
            "lowconf": [["Some_Entity", 0.05]],
        },
        "descriptions": {
            "Barack_Obama": "Barack Obama is an American politician.",
            "Apple_Inc.": "Apple Inc. is a technology company.",
            "Mercury_(planet)": "Mercury is the smallest planet.",
        },
        "disambiguations": {"Mercury": ["Mercury_(planet)",
                                        "Mercury_(element)"]},
    }))
    linker = OfflineEntityLinker(str(store), threshold=0.1)
    out = linker.link(["Obama", "apple", "Mercury", "lowconf", "nothing"])
    assert out["Obama"] == ("Barack_Obama",
                            "Barack Obama is an American politician.")
    assert out["apple"][0] == "Apple_Inc."
    # disambiguation chain: description comes from the first suggestion's
    # page but the ORIGINAL entity name is returned (the reference's
    # __call__ returns res[3] untouched while get_entity_description
    # resolves locally, vault/entity_linking.py:86-112)
    assert out["Mercury"] == ("Mercury", "Mercury is the smallest planet.")
    # below threshold: entity kept, description withheld
    assert out["lowconf"] == ("Some_Entity", None)
    assert out["nothing"] == (None, None)

    cache_path = str(tmp_path / "cache.json")
    build_entity_cache(cache_path, ["Obama", "nothing"], linker)
    cache = load_entity_cache(cache_path)
    assert cache["Obama"][0] == "Barack_Obama"
    # incremental: second build only links unseen targets and extends
    build_entity_cache(cache_path, ["apple"], linker)
    cache = load_entity_cache(cache_path)
    assert set(cache) == {"Obama", "nothing", "apple"}


def test_llama_tower_tp_forward_matches_replicated():
    """Megatron TP specs extend to the Llama tower (the BASELINE config-5
    composition where TP genuinely matters — an 8B tower outgrows one
    chip): gate/up column-parallel, o/down row-parallel, 2-way model mesh
    matches single-device output."""
    from vault_tpu.models.llama import init_llama, tiny_llama_config
    from vault_tpu.models.vault import vault_with_llama_tower
    from vault_tpu.models.vilt import init_vilt
    from vault_tpu.config import tiny_vilt_config
    from vault_tpu.parallel.sharding import vault_param_specs

    lcfg = tiny_llama_config()
    vcfg = tiny_vilt_config(image_size=32, patch_size=16, num_patch_tokens=8)
    params = {
        "llama": init_llama(jax.random.PRNGKey(0), lcfg),
        "vilt": init_vilt(jax.random.PRNGKey(1), vcfg),
        "adapter": {
            "w": jnp.asarray(np.random.default_rng(2).normal(
                0, 0.02, (lcfg.hidden_size, vcfg.hidden_size)), jnp.float32),
            "b": jnp.zeros((vcfg.hidden_size,), jnp.float32),
        },
    }
    specs = vault_param_specs(params)
    assert specs["llama"]["layers"]["gate"]["w"] == P(None, None, "model")
    assert specs["llama"]["layers"]["down"]["w"] == P(None, "model", None)
    assert specs["llama"]["layers"]["o"]["w"] == P(None, "model", None)
    assert specs["llama"]["layers"]["input_ln"] == P()

    rng = np.random.default_rng(3)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, lcfg.vocab_size, (4, 8)),
                              jnp.int32),
        attention_mask=jnp.ones((4, 8), jnp.int32),
        pixel_values=jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32),
        pixel_mask=jnp.ones((4, 32, 32), jnp.int32),
    )

    ref = vault_with_llama_tower(params, vcfg, lcfg, **batch).pooler_output

    mesh = make_mesh(num_data=4, num_model=2)
    sharded = shard_params(mesh, params)

    @jax.jit
    def fwd(p, b):
        return vault_with_llama_tower(p, vcfg, lcfg, **b).pooler_output

    out = fwd(sharded, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
