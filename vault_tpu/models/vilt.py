"""ViLT vision-and-language co-encoder — pure-functional JAX, TPU-first.

Re-implements the numerical contract of HF ``ViltModel`` that the reference
delegates to (SURVEY.md §2.7; call sites vault/models/vault/model.py:204-218):

  * text embeddings: word + segment (+ optional absolute position), LN, dropout
  * visual path: 32x32 conv patch projection; per-image align-corners bilinear
    interpolation of the 12x12 position grid; valid-patch selection; CLS;
    modality-type embeddings; concat with text
  * 12 pre-LN transformer layers; final LayerNorm; tanh pooler on token 0.

TPU-native deviations (documented in SURVEY.md §7 "hard parts"):
  * HF selects/pads patches with data-dependent ``torch.multinomial``
    (modeling_vilt.py:143-160) — non-deterministic, shape-dynamic.  We instead
    gather valid patches valid-first in raster order into a *static*
    ``num_patch_tokens`` budget and mask padded slots; equivalent under the
    attention mask, deterministic, and jit-stable.
  * The per-image interpolate/pad python loop becomes one batched gather
    (vault_tpu/ops/interpolate.py).
  * Encoder layers are stacked and executed with ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vault_tpu.config import ViltConfig
from vault_tpu.ops.attention import (
    attend,
    merge_heads,
    parse_impl,
    project_qkv,
    split_heads,
)
from vault_tpu.ops.interpolate import downsample_mask_nearest, interpolate_pos_grid
from vault_tpu.ops.masks import extend_attention_mask
from vault_tpu.ops.nn import (
    act_fn,
    dropout,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


class ViltOutput(NamedTuple):
    last_hidden_state: jax.Array   # (B, L_text + 1 + L_img, H)
    pooler_output: jax.Array       # (B, H)
    attention_mask: jax.Array      # (B, L_text + 1 + L_img) joint mask


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_layer(rng, cfg: ViltConfig):
    ks = jax.random.split(rng, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    s = cfg.initializer_range
    return {
        "ln_before": init_layer_norm(h),
        "q": init_linear(ks[0], h, h, s, bias=cfg.qkv_bias),
        "k": init_linear(ks[1], h, h, s, bias=cfg.qkv_bias),
        "v": init_linear(ks[2], h, h, s, bias=cfg.qkv_bias),
        "attn_out": init_linear(ks[3], h, h, s),
        "ln_after": init_layer_norm(h),
        "mlp_in": init_linear(ks[4], h, i, s),
        "mlp_out": init_linear(ks[5], i, h, s),
    }


def init_vilt(rng, cfg: ViltConfig, add_pooling_layer: bool = True):
    keys = jax.random.split(rng, 8)
    h = cfg.hidden_size
    s = cfg.initializer_range
    g = cfg.pos_grid
    te_keys = jax.random.split(keys[0], 3)
    params = {
        "text_embeddings": {
            "word": init_embedding(te_keys[0], cfg.vocab_size, h, s, cfg.pad_token_id),
            "position": init_embedding(te_keys[1], cfg.max_position_embeddings, h, s),
            "token_type": init_embedding(te_keys[2], cfg.type_vocab_size, h, s),
            "ln": init_layer_norm(h),
        },
        "cls_token": jnp.zeros((h,), jnp.float32),
        # torch Conv2d OIHW layout kept so the converter is a straight copy.
        "patch_proj": {
            "w": jax.random.normal(keys[1], (h, cfg.num_channels, cfg.patch_size,
                                             cfg.patch_size), jnp.float32) * s,
            "b": jnp.zeros((h,), jnp.float32),
        },
        "pos_embeddings": jnp.zeros((g * g + 1, h), jnp.float32),
        "modality_type": init_embedding(keys[2], cfg.modality_type_vocab_size, h, s),
        "final_ln": init_layer_norm(h),
    }
    layer_keys = jax.random.split(keys[3], cfg.num_hidden_layers)
    per_layer = [_init_layer(k, cfg) for k in layer_keys]
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if add_pooling_layer:
        params["pooler"] = init_linear(keys[4], h, h, s)
    return params


# ---------------------------------------------------------------------------
# Embedding stages
# ---------------------------------------------------------------------------

def text_embed(params, cfg: ViltConfig, input_ids=None, token_type_ids=None,
               inputs_embeds=None, deterministic=True, rng=None):
    """ViLT TextEmbeddings (modeling_vilt.py TextEmbeddings.forward); position
    add is skipped when ``cfg.add_text_position_embeddings`` is False — the
    honest version of the reference's "NOT_absolute" switch
    (vault/models/vault/model.py:77-79)."""
    te = params["text_embeddings"]
    if inputs_embeds is None:
        inputs_embeds = te["word"][input_ids]
    b, l = inputs_embeds.shape[:2]
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, l), jnp.int32)
    x = inputs_embeds + te["token_type"][token_type_ids]
    if cfg.add_text_position_embeddings:
        x = x + te["position"][jnp.arange(l)][None]
    x = layer_norm(te["ln"], x, cfg.layer_norm_eps)
    return dropout(rng, x, cfg.hidden_dropout_prob, deterministic)


def patchify(params, cfg: ViltConfig, pixel_values):
    """32x32/stride-32 patch projection -> (B, hidden, H', W').

    TPU note: expressed as space-to-depth + one (N, 3072)x(3072, 768) matmul
    rather than a conv — a stride=kernel "conv" over 3 input channels badly
    underutilizes the MXU (the contraction dim would be 3), while the
    flattened form runs at full tile width.  Numerically identical to torch's
    Conv2d with OIHW weights."""
    w = params["patch_proj"]["w"]          # (O, I, ph, pw) — torch layout
    o, i, ph, pw = w.shape
    x = pixel_values.astype(w.dtype)
    b, c, h, wd = x.shape
    gh, gw = h // ph, wd // pw
    # (B, C, gh, ph, gw, pw) -> (B, gh, gw, C, ph, pw) -> (B*N, C*ph*pw)
    x = x.reshape(b, c, gh, ph, gw, pw).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c * ph * pw)
    proj = jnp.matmul(x, w.reshape(o, i * ph * pw).T,
                      preferred_element_type=jnp.float32)
    proj = proj.astype(w.dtype) + params["patch_proj"]["b"]
    # back to the conv's (B, O, gh, gw) layout the callers expect
    return proj.transpose(0, 2, 1).reshape(b, o, gh, gw)


def visual_embed(params, cfg: ViltConfig, pixel_values, pixel_mask,
                 deterministic=True, rng=None):
    """Patch tokens with interpolated position embeddings and validity mask.

    Returns (tokens (B, 1+L_img, H), mask (B, 1+L_img)) with CLS prepended.
    Static L_img = min(cfg.num_patch_tokens, H'*W') patch slots; valid patches
    come first in raster order (deterministic analogue of HF's multinomial
    select, modeling_vilt.py:143-168).
    """
    x = patchify(params, cfg, pixel_values)          # (B, H, H', W')
    b, hdim, gh, gw = x.shape
    n = gh * gw

    x_mask = downsample_mask_nearest(pixel_mask.astype(jnp.int32), gh, gw)
    x_h = jnp.sum(x_mask[:, :, 0], axis=1)           # valid rows (col 0)
    x_w = jnp.sum(x_mask[:, 0, :], axis=1)           # valid cols (row 0)

    grid = params["pos_embeddings"][1:].reshape(cfg.pos_grid, cfg.pos_grid, hdim)
    pos = interpolate_pos_grid(grid, x_h, x_w, gh, gw)    # (B, H', W', Hd)

    x = x.reshape(b, hdim, n).transpose(0, 2, 1)          # (B, N, Hd) raster
    pos = pos.reshape(b, n, hdim)
    flat_mask = x_mask.reshape(b, n)

    # Valid-first stable ordering, truncated to the static token budget.
    l_img = min(cfg.num_patch_tokens, n)
    order = jnp.argsort(1 - flat_mask, axis=1, stable=True)[:, :l_img]
    x = jnp.take_along_axis(x, order[..., None], axis=1)
    pos = jnp.take_along_axis(pos, order[..., None], axis=1)
    sel_mask = jnp.take_along_axis(flat_mask, order, axis=1)

    cls = jnp.broadcast_to(params["cls_token"], (b, 1, hdim))
    cls_pos = jnp.broadcast_to(params["pos_embeddings"][0], (b, 1, hdim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = jnp.concatenate([cls_pos, pos], axis=1)
    x = x + pos
    x = dropout(rng, x, cfg.hidden_dropout_prob, deterministic)
    mask = jnp.concatenate([jnp.ones((b, 1), sel_mask.dtype), sel_mask], axis=1)
    return x, mask


def joint_embed(params, cfg: ViltConfig, input_ids=None, attention_mask=None,
                token_type_ids=None, pixel_values=None, pixel_mask=None,
                inputs_embeds=None, image_embeds=None, image_token_type_idx=1,
                deterministic=True, rng=None, merge_patches_to=None):
    """ViltEmbeddings.forward: text + visual + modality types, concatenated.

    Returns (tokens, mask, sizes); ``sizes`` is None unless
    ``merge_patches_to`` is set, in which case patch tokens are ToMe-merged
    down to that static count (ops/token_merge.py) and ``sizes`` carries the
    per-token multiplicities for proportional attention."""
    if rng is not None:
        r_text, r_img = jax.random.split(rng)
    else:
        r_text = r_img = None
    text = text_embed(params, cfg, input_ids, token_type_ids, inputs_embeds,
                      deterministic, r_text)
    b, l_text = text.shape[:2]
    if attention_mask is None:
        attention_mask = jnp.ones((b, l_text), jnp.int32)

    if image_embeds is None:
        img, img_mask = visual_embed(params, cfg, pixel_values, pixel_mask,
                                     deterministic, r_img)
    else:
        # External image-embeds path (TomViLT feeds attended ResNet regions
        # here, vault/models/tomvilt/model.py:281-287): pixel_mask is already
        # the per-token mask (all-valid when omitted, mirroring the text
        # path's synthesized mask).
        img = image_embeds
        if pixel_mask is None:
            img_mask = jnp.ones(img.shape[:2], jnp.int32)
        else:
            img_mask = pixel_mask.reshape(b, -1)

    text = text + params["modality_type"][0]
    img = img + params["modality_type"][image_token_type_idx]

    sizes = None
    if merge_patches_to is not None and img.shape[1] - 1 > merge_patches_to:
        # merge AFTER all per-token adds (pos/modality embeds) so the
        # size-weighted average composes the final embedded tokens; CLS
        # (img slot 0) is exempt — the pooler reads it
        from vault_tpu.ops.token_merge import merge_tokens_to

        patches, p_sizes, p_mask = merge_tokens_to(
            img[:, 1:], img_mask[:, 1:], merge_patches_to)
        img = jnp.concatenate([img[:, :1], patches], axis=1)
        img_mask = jnp.concatenate(
            [img_mask[:, :1], p_mask.astype(img_mask.dtype)], axis=1)
        b = text.shape[0]
        sizes = jnp.concatenate(
            [jnp.ones((b, text.shape[1] + 1), jnp.float32), p_sizes], axis=1)

    tokens = jnp.concatenate([text, img], axis=1)
    mask = jnp.concatenate([attention_mask.astype(img_mask.dtype), img_mask], axis=1)
    return tokens, mask, sizes


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _encoder_layer(lp, cfg: ViltConfig, x, bias, deterministic, rng,
                   use_pallas="auto"):
    """One pre-LN ViLT layer (modeling_vilt.py ViltLayer.forward)."""
    if rng is not None:
        r_attn, r_attn_out, r_mlp = jax.random.split(rng, 3)
    else:
        r_attn = r_attn_out = r_mlp = None
    fuse_qkv, fuse_lnqkv, fuse_mlp, _ = parse_impl(use_pallas)
    if fuse_lnqkv:
        from vault_tpu.ops.pallas_mlp import fused_ln_qkv

        qkv = fused_ln_qkv(lp["ln_before"], lp["q"], lp["k"], lp["v"], x,
                           cfg.layer_norm_eps)
        q, k, v = (split_heads(t, cfg.num_attention_heads)
                   for t in jnp.split(qkv, 3, axis=-1))
    else:
        y = layer_norm(lp["ln_before"], x, cfg.layer_norm_eps)
        q, k, v = project_qkv(lp, y, cfg.num_attention_heads, fuse_qkv)
    ctx = merge_heads(attend(q, k, v, bias, r_attn,
                             cfg.attention_probs_dropout_prob, deterministic,
                             use_pallas=use_pallas))
    attn = linear(lp["attn_out"], ctx)
    attn = dropout(r_attn_out, attn, cfg.hidden_dropout_prob, deterministic)
    x = x + attn

    if fuse_mlp:
        from vault_tpu.ops.nn import dropout_mask
        from vault_tpu.ops.pallas_mlp import fused_mlp_block

        # dropout sits on the MLP output inside the block; the pre-scaled
        # mask is drawn with the same bernoulli call as the XLA path below,
        # so the two paths are stream-identical (see bert.py counterpart)
        mask = None
        if not deterministic and cfg.hidden_dropout_prob > 0.0:
            mask = dropout_mask(r_mlp, x.shape, cfg.hidden_dropout_prob,
                                x.dtype)
        return fused_mlp_block(lp["ln_after"], lp["mlp_in"], lp["mlp_out"],
                               x, cfg.layer_norm_eps, cfg.hidden_act,
                               drop_mask=mask)
    y = layer_norm(lp["ln_after"], x, cfg.layer_norm_eps)
    mlp = act_fn(cfg.hidden_act)(linear(lp["mlp_in"], y))
    mlp = linear(lp["mlp_out"], mlp)
    mlp = dropout(r_mlp, mlp, cfg.hidden_dropout_prob, deterministic)
    return x + mlp


def vilt_encode(params, cfg: ViltConfig, x, attention_mask, deterministic=True,
                rng=None, use_pallas="auto", remat=False, key_sizes=None,
                merge_spec=None):
    """Encoder stack.  ``merge_spec`` (static, serving-only) is
    ``(layer, patch_start, target)``: after ``layer`` layers, ToMe-merge the
    patch tokens (positions >= patch_start) down to ``target`` — the scan
    splits into two static-shape segments at the merge point.  Mid-stack
    merging operates on contextualized tokens, so it diverges far less than
    embed-time merging for most of the same FLOP savings (ToMe's regime,
    arXiv 2210.09461; budgets in docs/BENCHMARKS.md)."""
    def make_bias(mask, sizes):
        bias = extend_attention_mask(mask, jnp.float32)
        if sizes is not None:
            # proportional attention (ToMe): a key representing s merged
            # tokens weighs s-fold in every softmax — log(s) rides the
            # additive-bias path, so XLA and the fused Pallas kernels need
            # no changes
            bias = bias + jnp.log(jnp.maximum(sizes, 1.0))[:, None, None, :]
        return bias

    def run_layers(h, bias, lo, hi):
        layers = jax.tree.map(lambda t: t[lo:hi], params["layers"])

        def body(carry, lp):
            h, i = carry
            layer_rng = None if rng is None else jax.random.fold_in(rng, i)
            from vault_tpu.ops.nn import maybe_remat
            fn = maybe_remat(_encoder_layer, remat, static_argnums=(1, 4, 6))
            h = fn(lp, cfg, h, bias, deterministic, layer_rng, use_pallas)
            return (h, i + 1), None

        (h, _), _ = jax.lax.scan(body, (h, lo), layers)
        return h

    n_layers = cfg.num_hidden_layers
    if merge_spec is None:
        return (run_layers(x, make_bias(attention_mask, key_sizes),
                           0, n_layers), attention_mask)

    from vault_tpu.ops.token_merge import merge_tokens_to

    # one merge per forward: embed-time sizes would double-count here
    assert key_sizes is None, "merge_spec excludes embed-time merging"
    layer, patch_start, target = merge_spec
    layer = max(0, min(int(layer), n_layers))
    x = run_layers(x, make_bias(attention_mask, None), 0, layer)
    patches, p_sizes, p_mask = merge_tokens_to(
        x[:, patch_start:], attention_mask[:, patch_start:], target)
    x = jnp.concatenate([x[:, :patch_start], patches], axis=1)
    mask = jnp.concatenate(
        [attention_mask[:, :patch_start],
         p_mask.astype(attention_mask.dtype)], axis=1)
    b = x.shape[0]
    sizes = jnp.concatenate(
        [jnp.ones((b, patch_start), jnp.float32), p_sizes], axis=1)
    return run_layers(x, make_bias(mask, sizes), layer, n_layers), mask


def pooler(params, x):
    """Tanh pooler on token 0 (modeling_vilt.py ViltPooler)."""
    return jnp.tanh(linear(params["pooler"], x[:, 0]))


def vilt_apply(params, cfg: ViltConfig, input_ids=None, attention_mask=None,
               token_type_ids=None, pixel_values=None, pixel_mask=None,
               inputs_embeds=None, image_embeds=None, image_token_type_idx=1,
               deterministic=True, rng=None, use_pallas="auto",
               remat=False, merge_patches_to=None,
               merge_at_layer=0) -> ViltOutput:
    """Full ViltModel.forward equivalent (modeling_vilt.py:599-717).

    ``merge_patches_to`` (static int, serving-only): ToMe-merge the patch
    tokens down to this count (ops/token_merge.py) — e.g. 87 makes the
    joint sequence 40+1+87 = 128 and ~halves co-encoder FLOPs; attention
    becomes proportional via a log-size key bias.  ``merge_at_layer``
    picks WHERE: 0 (default) merges raw embeddings before the encoder
    (max savings); k > 0 merges after k encoder layers, on contextualized
    tokens — much lower divergence for (num_layers - k)/num_layers of the
    savings (budgets in docs/BENCHMARKS.md)."""
    if rng is not None:
        r_emb, r_enc = jax.random.split(rng)
    else:
        r_emb = r_enc = None
    embed_merge = merge_patches_to if merge_at_layer == 0 else None
    tokens, mask, sizes = joint_embed(params, cfg, input_ids, attention_mask,
                                      token_type_ids, pixel_values, pixel_mask,
                                      inputs_embeds, image_embeds,
                                      image_token_type_idx, deterministic,
                                      r_emb, embed_merge)
    merge_spec = None
    if merge_patches_to is not None and merge_at_layer > 0:
        if input_ids is not None:
            l_text = input_ids.shape[1]
        elif inputs_embeds is not None:
            l_text = inputs_embeds.shape[1]
        else:
            raise ValueError("merge_at_layer > 0 needs a text span")
        merge_spec = (merge_at_layer, l_text + 1, merge_patches_to)
    x, mask = vilt_encode(params, cfg, tokens, mask, deterministic, r_enc,
                          use_pallas, remat, key_sizes=sizes,
                          merge_spec=merge_spec)
    x = layer_norm(params["final_ln"], x, cfg.layer_norm_eps)
    pooled = pooler(params, x) if "pooler" in params else None
    return ViltOutput(last_hidden_state=x, pooler_output=pooled,
                      attention_mask=mask)
