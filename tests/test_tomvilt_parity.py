"""TomViLT forward parity vs a torch composition wired from HF primitives per
the reference (vault/models/tomvilt/model.py:187-289): target-BERT -> mapped
regions cross-attended by the target -> fed to VAuLT(TMSC head) as external
image_embeds with pixel_mask = target mask."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.convert import bert_params_from_torch, vilt_params_from_torch
from vault_tpu.models.tomvilt import init_tomvilt, tomvilt_apply

from tests.hf_utils import (
    DeterministicMultinomial,
    hf_bert_config,
    make_hf_bert,
    make_hf_vilt,
)


def _lin(l):
    return {"w": jnp.asarray(l.weight.detach().numpy().T),
            "b": jnp.asarray(l.bias.detach().numpy())}


def test_tomvilt_full_forward_parity():
    text_cfg = tiny_text_config(hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
    vilt_cfg = tiny_vilt_config()
    vault_cfg = VaultConfig(vilt=vilt_cfg, text_tower=text_cfg)
    hcfg = hf_bert_config(text_cfg)
    vis_dim = 24

    torch.manual_seed(0)
    target_bert = make_hf_bert(text_cfg, seed=3)
    tweet_bert = make_hf_bert(text_cfg, seed=4)
    hf_vilt = make_hf_vilt(vilt_cfg, seed=5)
    hf_vilt.embeddings.text_embeddings.position_embedding_type = "NOT_absolute"
    mapper = torch.nn.Linear(vis_dim, text_cfg.hidden_size)
    from transformers.models.bert.modeling_bert import (
        BertAttention,
        BertIntermediate,
        BertOutput,
    )
    c_attn = BertAttention(hcfg).eval()
    c_inter = BertIntermediate(hcfg).eval()
    c_out = BertOutput(hcfg).eval()
    head = torch.nn.Linear(vilt_cfg.hidden_size, 3)

    params = init_tomvilt(jax.random.PRNGKey(0), vault_cfg, text_cfg, 3,
                          vis_dim, num_hidden_cross_layers=1)
    params["target_bert"] = bert_params_from_torch(target_bert.state_dict(),
                                                   text_cfg)
    params["vis_mapper"] = _lin(mapper)
    sd = {**{f"attention.{k}": v for k, v in c_attn.state_dict().items()},
          **{f"intermediate.{k}": v for k, v in c_inter.state_dict().items()},
          **{f"output.{k}": v for k, v in c_out.state_dict().items()}}

    def lin_sd(name):
        return {"w": jnp.asarray(sd[f"{name}.weight"].numpy().T),
                "b": jnp.asarray(sd[f"{name}.bias"].numpy())}

    def ln_sd(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"].numpy()),
                "bias": jnp.asarray(sd[f"{name}.bias"].numpy())}

    cl = {"q": lin_sd("attention.self.query"), "k": lin_sd("attention.self.key"),
          "v": lin_sd("attention.self.value"),
          "attn_out": lin_sd("attention.output.dense"),
          "attn_ln": ln_sd("attention.output.LayerNorm"),
          "mlp_in": lin_sd("intermediate.dense"),
          "mlp_out": lin_sd("output.dense"), "mlp_ln": ln_sd("output.LayerNorm")}
    params["cross"] = {"layers": jax.tree.map(lambda x: x[None], cl)}
    params["vault"] = {
        "bert": bert_params_from_torch(tweet_bert.state_dict(), text_cfg),
        "vilt": vilt_params_from_torch(hf_vilt.state_dict(),
                                       vault_cfg.resolved_vilt()),
        "head": {"out": _lin(head)},
    }

    rng = np.random.default_rng(0)
    b, lt, ltar, nreg = 2, 10, 4, 7
    ids = rng.integers(0, text_cfg.vocab_size, (b, lt))
    tids = rng.integers(0, text_cfg.vocab_size, (b, ltar))
    mask = np.ones((b, lt), np.int64)
    tmask = np.ones((b, ltar), np.int64)
    vis = rng.normal(size=(b, nreg, vis_dim)).astype(np.float32)

    with torch.no_grad(), DeterministicMultinomial():
        t_out = target_bert(input_ids=torch.tensor(tids),
                            attention_mask=torch.tensor(tmask)).last_hidden_state
        vmap = mapper(torch.tensor(vis))
        h = hcfg.num_attention_heads
        d = text_cfg.hidden_size // h

        def heads(x):
            return x.view(x.shape[0], x.shape[1], h, d).transpose(1, 2)

        q = heads(c_attn.self.query(t_out))
        k = heads(c_attn.self.key(vmap))
        v = heads(c_attn.self.value(vmap))
        probs = torch.softmax(q @ k.transpose(-1, -2) / d ** 0.5, dim=-1)
        ctx = (probs @ v).transpose(1, 2).reshape(t_out.shape)
        a = c_attn.output.LayerNorm(c_attn.output.dense(ctx) + t_out)
        attended = c_out(c_inter(a), a)

        lm = tweet_bert(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask)).last_hidden_state
        out = hf_vilt(inputs_embeds=lm, attention_mask=torch.tensor(mask),
                      image_embeds=attended,
                      pixel_mask=torch.tensor(tmask))
        ref_logits = head(out.pooler_output).numpy()

    logits = tomvilt_apply(params, vault_cfg, text_cfg,
                           input_ids=jnp.asarray(ids),
                           target_input_ids=jnp.asarray(tids),
                           visual_embeddings=jnp.asarray(vis),
                           attention_mask=jnp.asarray(mask),
                           target_attention_mask=jnp.asarray(tmask),
                           head_dropout=0.0)
    assert np.abs(np.asarray(logits) - ref_logits).max() < 1e-4
