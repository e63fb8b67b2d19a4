"""Tom* family tests: ResNet parity vs torchvision, cross-encoder parity vs
HF BertAttention wiring, TomBERT/TomViLT forward + gradient smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vault_tpu.config import VaultConfig, tiny_text_config, tiny_vilt_config
from vault_tpu.models.modules import cross_encoder_apply, init_cross_encoder
from vault_tpu.models.resnet import (
    RESNET_OUT_DIM,
    resnet_features,
    resnet_params_from_torch,
)
from vault_tpu.models.tombert import (
    init_tombert,
    init_tombert_from_bert,
    tombert_apply,
)
from vault_tpu.models.tomvilt import init_tomvilt, tomvilt_apply
from vault_tpu.ops.masks import extend_attention_mask

from tests.hf_utils import make_hf_bert


def _torch_resnet(depth):
    """Canonical torchvision-v1 ResNet rebuilt with plain torch.nn (the
    torchvision package is not in this image); state_dict keys mirror
    torchvision's so the converter is exercised too."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inp, w, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, w, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(w)
            self.downsample = None
            if stride != 1 or inp != w:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, w, 1, stride, bias=False), nn.BatchNorm2d(w))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            sc = x if self.downsample is None else self.downsample(x)
            return torch.relu(out + sc)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inp, w, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, w, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(w)
            self.conv3 = nn.Conv2d(w, w * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(w * 4)
            self.downsample = None
            if stride != 1 or inp != w * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, w * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(w * 4))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            sc = x if self.downsample is None else self.downsample(x)
            return torch.relu(out + sc)

    cfgs = {18: (BasicBlock, [2, 2, 2, 2]), 50: (Bottleneck, [3, 4, 6, 3])}
    block, layers = cfgs[depth]

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inp = 64
            for s, (w, n) in enumerate(zip([64, 128, 256, 512], layers)):
                blocks = []
                for b in range(n):
                    stride = 2 if (s > 0 and b == 0) else 1
                    blocks.append(block(inp, w, stride))
                    inp = w * block.expansion
                setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for s in range(4):
                x = getattr(self, f"layer{s + 1}")(x)
            return x

    return Net()


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet_matches_torch_reference(depth):
    torch.manual_seed(0)
    tv = _torch_resnet(depth).eval()
    # perturb BN stats so the test isn't trivially mean0/var1
    for m in tv.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    params = resnet_params_from_torch(tv.state_dict(), depth)

    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x)).flatten(-2).permute(0, 2, 1).numpy()

    ours = np.asarray(resnet_features(params, depth, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 4, RESNET_OUT_DIM[depth])
    assert np.abs(ours - ref).max() < 1e-3


def test_cross_encoder_matches_hf_wiring():
    # Reference cross block = HF BertAttention(encoder_hidden_states=queried)
    # + BertIntermediate + BertOutput (vault/modules.py:22-99).
    from transformers.models.bert.modeling_bert import (
        BertAttention,
        BertIntermediate,
        BertOutput,
    )

    cfg = tiny_text_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    from tests.hf_utils import hf_bert_config
    hf_cfg = hf_bert_config(cfg)
    hf_cfg.is_decoder = False
    torch.manual_seed(0)
    attn = BertAttention(hf_cfg, position_embedding_type="absolute").eval()
    inter = BertIntermediate(hf_cfg).eval()
    outp = BertOutput(hf_cfg).eval()

    lp = {
        "q": {"w": jnp.asarray(attn.self.query.weight.detach().numpy().T),
              "b": jnp.asarray(attn.self.query.bias.detach().numpy())},
        "k": {"w": jnp.asarray(attn.self.key.weight.detach().numpy().T),
              "b": jnp.asarray(attn.self.key.bias.detach().numpy())},
        "v": {"w": jnp.asarray(attn.self.value.weight.detach().numpy().T),
              "b": jnp.asarray(attn.self.value.bias.detach().numpy())},
        "attn_out": {"w": jnp.asarray(attn.output.dense.weight.detach().numpy().T),
                     "b": jnp.asarray(attn.output.dense.bias.detach().numpy())},
        "attn_ln": {"scale": jnp.asarray(attn.output.LayerNorm.weight.detach().numpy()),
                    "bias": jnp.asarray(attn.output.LayerNorm.bias.detach().numpy())},
        "mlp_in": {"w": jnp.asarray(inter.dense.weight.detach().numpy().T),
                   "b": jnp.asarray(inter.dense.bias.detach().numpy())},
        "mlp_out": {"w": jnp.asarray(outp.dense.weight.detach().numpy().T),
                    "b": jnp.asarray(outp.dense.bias.detach().numpy())},
        "mlp_ln": {"scale": jnp.asarray(outp.LayerNorm.weight.detach().numpy()),
                   "bias": jnp.asarray(outp.LayerNorm.bias.detach().numpy())},
    }
    params = {"layers": jax.tree.map(lambda x: x[None], lp)}

    rng = np.random.default_rng(0)
    querying = rng.normal(size=(2, 5, cfg.hidden_size)).astype(np.float32)
    queried = rng.normal(size=(2, 7, cfg.hidden_size)).astype(np.float32)
    qmask = np.ones((2, 7), np.int64)
    qmask[1, 4:] = 0

    with torch.no_grad():
        # manual HF cross-attention math (Q from querying, K/V from queried,
        # additive mask, per-head softmax, output dense + residual LN) — the
        # exact computation BertAttention(encoder_hidden_states=...) performs.
        h = hf_cfg.num_attention_heads
        d = hf_cfg.hidden_size // h
        tq = torch.tensor(querying)
        tk = torch.tensor(queried)
        ext = (1.0 - torch.tensor(qmask, dtype=torch.float32)[:, None, None, :]) \
            * torch.finfo(torch.float32).min

        def heads(x):
            b, l, _ = x.shape
            return x.view(b, l, h, d).transpose(1, 2)

        q = heads(attn.self.query(tq))
        k = heads(attn.self.key(tk))
        v = heads(attn.self.value(tk))
        scores = q @ k.transpose(-1, -2) / (d ** 0.5) + ext
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).transpose(1, 2).reshape(tq.shape)
        a = attn.output.LayerNorm(attn.output.dense(ctx) + tq)
        ref = outp(inter(a), a).numpy()

    bias = extend_attention_mask(jnp.asarray(qmask))
    ours = cross_encoder_apply(params, cfg, jnp.asarray(querying),
                               jnp.asarray(queried), bias)
    assert np.abs(np.asarray(ours) - ref).max() < 1e-4


def _text_inputs(cfg, b=2, lt=10, ltar=4, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (b, lt))),
        target_input_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, (b, ltar))),
        attention_mask=jnp.ones((b, lt), jnp.int32),
        target_attention_mask=jnp.ones((b, ltar), jnp.int32),
        token_type_ids=jnp.zeros((b, lt), jnp.int32),
        target_type_ids=jnp.zeros((b, ltar), jnp.int32),
    )


@pytest.mark.parametrize("pooling", ["first", "cls", "both"])
def test_tombert_forward_poolings(pooling):
    cfg = tiny_text_config()
    params = init_tombert(jax.random.PRNGKey(0), cfg, n_classes=3,
                          pooling=pooling, vis_emb_dim=64,
                          num_hidden_cross_layers=1)
    inputs = _text_inputs(cfg)
    vis = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 64)),
                      jnp.float32)
    logits = tombert_apply(params, cfg, visual_embeddings=vis,
                           pooling=pooling, **inputs)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_tombert_from_bert_surgery():
    cfg = tiny_text_config()
    hf = make_hf_bert(cfg)
    from vault_tpu.models.convert import bert_params_from_torch
    bert_params = bert_params_from_torch(hf.state_dict(), cfg)
    params = init_tombert_from_bert(bert_params, jax.random.PRNGKey(0), cfg,
                                    vis_emb_dim=64, num_hidden_cross_layers=1)
    np.testing.assert_allclose(
        np.asarray(params["tweet_bert"]["embeddings"]["word"]),
        np.asarray(bert_params["embeddings"]["word"]))
    np.testing.assert_allclose(
        np.asarray(params["mm_encoder"]["layers"]["q"]["w"]),
        np.asarray(bert_params["layers"]["q"]["w"]))
    # cross encoder took the first layer's weights
    np.testing.assert_allclose(
        np.asarray(params["cross"]["layers"]["q"]["w"][0]),
        np.asarray(bert_params["layers"]["q"]["w"][0]))


@pytest.mark.slow
def test_tombert_with_resnet_end_to_end():
    cfg = tiny_text_config()
    params = init_tombert(jax.random.PRNGKey(0), cfg, vis_emb_dim=512,
                          num_hidden_cross_layers=1, resnet_depth=18)
    inputs = _text_inputs(cfg)
    images = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 64, 64)),
                         jnp.float32)
    logits, emb = tombert_apply(params, cfg, images=images, resnet_depth=18,
                                return_embeddings=True, **inputs)
    assert logits.shape == (2, 3)
    assert emb.shape == (2, 4, 512)
    # frozen resnet: no gradient flows into it
    def loss(p):
        return jnp.sum(tombert_apply(p, cfg, images=images, resnet_depth=18,
                                     **inputs) ** 2)
    grads = jax.grad(loss)(params)
    rn = sum(jnp.abs(g).sum() for g in jax.tree.leaves(grads["resnet"]))
    tb = sum(jnp.abs(g).sum() for g in jax.tree.leaves(grads["tweet_bert"]))
    assert float(rn) == 0.0 and float(tb) > 0.0
    # precomputed-embedding pass-through (the reference's caching hook)
    logits2 = tombert_apply(params, cfg, visual_embeddings=emb, **inputs)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               atol=1e-5)


def test_tomvilt_forward():
    text = tiny_text_config()
    vault_cfg = VaultConfig(vilt=tiny_vilt_config(), text_tower=text)
    params = init_tomvilt(jax.random.PRNGKey(0), vault_cfg, text, n_classes=3,
                          vis_emb_dim=64, num_hidden_cross_layers=1)
    inputs = _text_inputs(text)
    vis = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 64)),
                      jnp.float32)
    logits = tomvilt_apply(params, vault_cfg, text, visual_embeddings=vis,
                           head_dropout=0.0, **inputs)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_tomvilt_plain_vilt_mode():
    # use_tweet_bert=False: VAuLT inside runs without an LM tower
    text = tiny_text_config()
    vault_cfg = VaultConfig(vilt=tiny_vilt_config(), text_tower=None)
    params = init_tomvilt(jax.random.PRNGKey(0), vault_cfg, text, n_classes=3,
                          vis_emb_dim=64, num_hidden_cross_layers=1)
    inputs = _text_inputs(text)
    vis = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 64)),
                      jnp.float32)
    logits = tomvilt_apply(params, vault_cfg, text, visual_embeddings=vis,
                           head_dropout=0.0, **inputs)
    assert logits.shape == (2, 3)


@pytest.mark.slow
def test_tombert_tied_target_tower():
    """tie_target_bert (reference tie_target_bert_weights kwarg,
    tombert/model.py:164-165): no target_bert subtree, the tweet tower
    serves both streams, and gradients from both call sites accumulate
    into it — grad wrt the tied tower equals the SUM of the two towers'
    grads in the untied model started from identical weights."""
    cfg = tiny_text_config(hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    tied = init_tombert(jax.random.PRNGKey(0), cfg, n_classes=3,
                        vis_emb_dim=64, num_hidden_cross_layers=1,
                        tie_target_bert=True)
    assert "target_bert" not in tied
    untied = {**jax.tree.map(lambda x: x, tied),
              "target_bert": jax.tree.map(jnp.copy, tied["tweet_bert"])}
    inputs = _text_inputs(cfg)
    vis = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 64)),
                      jnp.float32)

    def loss(p):
        return tombert_apply(p, cfg, visual_embeddings=vis, **inputs).sum()

    # identical forward
    np.testing.assert_allclose(np.asarray(loss(tied)),
                               np.asarray(loss(untied)), rtol=1e-6)
    g_tied = jax.grad(loss)(tied)
    g_untied = jax.grad(loss)(untied)
    summed = jax.tree.map(lambda a, b: a + b, g_untied["tweet_bert"],
                          g_untied["target_bert"])
    leaves_t = jax.tree.leaves(g_tied["tweet_bert"])
    leaves_s = jax.tree.leaves(summed)
    for a, b in zip(leaves_t, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_from_bert_deep_cross_partial_seeding():
    """num_hidden_cross_layers > donor depth: the first n_bert cross layers
    take donor weights, extras stay random (torch strict=False load
    semantics the reference relies on, tombert/model.py:173-176)."""
    from vault_tpu.models.tombert import init_tombert_from_bert
    from vault_tpu.models import bert as bert_mod

    cfg = tiny_text_config(num_hidden_layers=2)
    donor = bert_mod.init_bert(jax.random.PRNGKey(5), cfg)
    params = init_tombert_from_bert(donor, jax.random.PRNGKey(6), cfg,
                                    num_hidden_cross_layers=3, vis_emb_dim=64)
    cross_q = np.asarray(params["cross"]["layers"]["q"]["w"])
    donor_q = np.asarray(donor["layers"]["q"]["w"])
    assert cross_q.shape[0] == 3
    np.testing.assert_allclose(cross_q[:2], donor_q, atol=0)
    assert np.abs(cross_q[2] - donor_q[0]).max() > 1e-3  # extras random
