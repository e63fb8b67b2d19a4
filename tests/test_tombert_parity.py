"""Full TomBERT forward parity vs a torch composition wired from HF
primitives exactly as the reference describes (vault/models/tombert/
model.py:199-332): tweet-BERT + target-BERT, visual mapper, target-queries-
regions cross block, tanh pooler on token 0, [pooled-visual ; tweet] through
a BERT encoder stack, pooling, linear classifier."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vault_tpu.config import tiny_text_config
from vault_tpu.models.convert import bert_params_from_torch, strip_prefix
from vault_tpu.models.tombert import init_tombert, tombert_apply

from tests.hf_utils import hf_bert_config, make_hf_bert


def _torch_linear_params(lin):
    return {"w": jnp.asarray(lin.weight.detach().numpy().T),
            "b": jnp.asarray(lin.bias.detach().numpy())}


def test_tombert_full_forward_parity():
    cfg = tiny_text_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    hcfg = hf_bert_config(cfg)
    vis_dim = 24
    n_classes = 3

    torch.manual_seed(0)
    tweet_bert = make_hf_bert(cfg, seed=1)
    target_bert = make_hf_bert(cfg, seed=2)
    mapper = torch.nn.Linear(vis_dim, cfg.hidden_size)
    from transformers.models.bert.modeling_bert import (
        BertAttention,
        BertEncoder,
        BertIntermediate,
        BertOutput,
    )
    cross_attn = BertAttention(hcfg).eval()
    cross_inter = BertIntermediate(hcfg).eval()
    cross_out = BertOutput(hcfg).eval()
    cross_pool = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)
    mm_encoder = BertEncoder(hcfg).eval()
    out_pool = torch.nn.Linear(cfg.hidden_size, cfg.hidden_size)
    classifier = torch.nn.Linear(cfg.hidden_size, n_classes)

    # ---- our params from the torch modules --------------------------------
    params = init_tombert(jax.random.PRNGKey(0), cfg, n_classes, "first",
                          vis_dim, num_hidden_cross_layers=1)
    params["tweet_bert"] = bert_params_from_torch(tweet_bert.state_dict(), cfg)
    params["target_bert"] = bert_params_from_torch(target_bert.state_dict(), cfg)
    params["vis_mapper"] = _torch_linear_params(mapper)
    cross_sd = {**{f"attention.{k}": v for k, v in cross_attn.state_dict().items()},
                **{f"intermediate.{k}": v for k, v in cross_inter.state_dict().items()},
                **{f"output.{k}": v for k, v in cross_out.state_dict().items()}}

    def lin_sd(sd, name):
        return {"w": jnp.asarray(sd[f"{name}.weight"].numpy().T),
                "b": jnp.asarray(sd[f"{name}.bias"].numpy())}

    def ln_sd(sd, name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"].numpy()),
                "bias": jnp.asarray(sd[f"{name}.bias"].numpy())}

    cross_layer = {
        "q": lin_sd(cross_sd, "attention.self.query"),
        "k": lin_sd(cross_sd, "attention.self.key"),
        "v": lin_sd(cross_sd, "attention.self.value"),
        "attn_out": lin_sd(cross_sd, "attention.output.dense"),
        "attn_ln": ln_sd(cross_sd, "attention.output.LayerNorm"),
        "mlp_in": lin_sd(cross_sd, "intermediate.dense"),
        "mlp_out": lin_sd(cross_sd, "output.dense"),
        "mlp_ln": ln_sd(cross_sd, "output.LayerNorm"),
    }
    params["cross"] = {"layers": jax.tree.map(lambda x: x[None], cross_layer)}
    params["cross_pooler"] = {"dense": _torch_linear_params(cross_pool)}
    mm_sd = strip_prefix(
        {f"encoder.{k}": v for k, v in mm_encoder.state_dict().items()}, "")
    params["mm_encoder"] = {
        "layers": bert_params_from_torch(
            {**tweet_bert.state_dict(), **mm_sd}, cfg)["layers"]}
    params["out_pooler"] = {"dense": _torch_linear_params(out_pool)}
    params["classifier"] = _torch_linear_params(classifier)

    # ---- inputs ------------------------------------------------------------
    rng = np.random.default_rng(0)
    b, lt, ltar, nreg = 2, 10, 4, 7
    ids = rng.integers(0, cfg.vocab_size, (b, lt))
    tids = rng.integers(0, cfg.vocab_size, (b, ltar))
    mask = np.ones((b, lt), np.int64)
    tmask = np.ones((b, ltar), np.int64)
    vis = rng.normal(size=(b, nreg, vis_dim)).astype(np.float32)

    # ---- torch reference forward (the reference's wiring) ------------------
    with torch.no_grad():
        tweet_out = tweet_bert(input_ids=torch.tensor(ids),
                               attention_mask=torch.tensor(mask)).last_hidden_state
        target_out = target_bert(input_ids=torch.tensor(tids),
                                 attention_mask=torch.tensor(tmask)).last_hidden_state
        vmap = mapper(torch.tensor(vis))
        # manual HF cross-attention (regions fully valid -> no mask)
        h = hcfg.num_attention_heads
        d = cfg.hidden_size // h

        def heads(x):
            return x.view(x.shape[0], x.shape[1], h, d).transpose(1, 2)

        q = heads(cross_attn.self.query(target_out))
        k = heads(cross_attn.self.key(vmap))
        v = heads(cross_attn.self.value(vmap))
        probs = torch.softmax(q @ k.transpose(-1, -2) / d ** 0.5, dim=-1)
        ctx = (probs @ v).transpose(1, 2).reshape(target_out.shape)
        a = cross_attn.output.LayerNorm(cross_attn.output.dense(ctx) + target_out)
        attended = cross_out(cross_inter(a), a)
        pooled_vis = torch.tanh(cross_pool(attended[:, 0]))

        mm = torch.cat([pooled_vis[:, None], tweet_out], dim=1)
        mm_mask = torch.cat([torch.ones(b, 1, dtype=torch.long),
                             torch.tensor(mask)], dim=1)
        ext = (1.0 - mm_mask[:, None, None, :].float()) * torch.finfo(torch.float32).min
        mm_out = mm_encoder(mm, attention_mask=ext).last_hidden_state
        pooled = torch.tanh(out_pool(mm_out[:, 0]))
        ref_logits = classifier(pooled).numpy()

    # ---- ours ---------------------------------------------------------------
    logits = tombert_apply(params, cfg,
                           input_ids=jnp.asarray(ids),
                           target_input_ids=jnp.asarray(tids),
                           visual_embeddings=jnp.asarray(vis),
                           attention_mask=jnp.asarray(mask),
                           target_attention_mask=jnp.asarray(tmask),
                           pooling="first")
    assert np.abs(np.asarray(logits) - ref_logits).max() < 1e-4
