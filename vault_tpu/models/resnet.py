"""ResNet region-feature extractor — JAX rebuild of ``ResNetEmbeddings``.

The reference wraps torchvision ResNets minus avgpool/fc and flattens the
7x7 output grid into 49 region tokens of dim 512 (r18/34) or 2048
(r50/101/152) (vault/modules.py:210-308).  Here the ResNet itself is
implemented from scratch (torchvision v1 architecture: 7x7/2 stem, max-pool,
4 stages of Basic/Bottleneck blocks) with a torchvision state_dict converter
for weight porting.

BatchNorm runs in inference mode (running stats) — matching the reference's
dominant usage: ResNet frozen + eval mode, with an embedding cache after
epoch 0 (vault/models/tombert/trainer.py:63-77).  Precomputed-embedding
pass-through (x.ndim != 4) is preserved.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

RESNET_LAYERS = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}
RESNET_OUT_DIM = {18: 512, 34: 512, 50: 2048, 101: 2048, 152: 2048}


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    scale = (p["scale"] * inv)[None, :, None, None]
    shift = (p["bias"] - p["mean"] * p["scale"] * inv)[None, :, None, None]
    return x * scale + shift


def _init_conv(rng, out_c, in_c, k):
    fan = in_c * k * k
    return jax.random.normal(rng, (out_c, in_c, k, k), jnp.float32) * np.sqrt(2.0 / fan)


def _init_bn(c):
    return {"scale": jnp.ones(c), "bias": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def init_resnet(rng, depth: int = 152):
    kind, blocks = RESNET_LAYERS[depth]
    keys = iter(jax.random.split(rng, 1024))
    params: Dict = {"stem": {"conv": _init_conv(next(keys), 64, 3, 7),
                             "bn": _init_bn(64)}}
    in_c = 64
    widths = [64, 128, 256, 512]
    expansion = 1 if kind == "basic" else 4
    for s, (w, n) in enumerate(zip(widths, blocks)):
        stage = []
        for b in range(n):
            stride = 2 if (s > 0 and b == 0) else 1
            out_c = w * expansion
            blk: Dict = {}
            if kind == "basic":
                blk["conv1"] = _init_conv(next(keys), w, in_c, 3)
                blk["bn1"] = _init_bn(w)
                blk["conv2"] = _init_conv(next(keys), w, w, 3)
                blk["bn2"] = _init_bn(w)
            else:
                blk["conv1"] = _init_conv(next(keys), w, in_c, 1)
                blk["bn1"] = _init_bn(w)
                blk["conv2"] = _init_conv(next(keys), w, w, 3)
                blk["bn2"] = _init_bn(w)
                blk["conv3"] = _init_conv(next(keys), out_c, w, 1)
                blk["bn3"] = _init_bn(out_c)
            if stride != 1 or in_c != out_c:
                blk["down_conv"] = _init_conv(next(keys), out_c, in_c, 1)
                blk["down_bn"] = _init_bn(out_c)
            stage.append(blk)
            in_c = out_c
        params[f"layer{s + 1}"] = stage
    return params


def _basic_block(p, x, stride):
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], stride, 1)))
    out = _bn(p["bn2"], _conv(out, p["conv2"], 1, 1))
    sc = x
    if "down_conv" in p:
        sc = _bn(p["down_bn"], _conv(x, p["down_conv"], stride, 0))
    return jax.nn.relu(out + sc)


def _bottleneck_block(p, x, stride):
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], 1, 0)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(out, p["conv2"], stride, 1)))
    out = _bn(p["bn3"], _conv(out, p["conv3"], 1, 0))
    sc = x
    if "down_conv" in p:
        sc = _bn(p["down_bn"], _conv(x, p["down_conv"], stride, 0))
    return jax.nn.relu(out + sc)


def resnet_features(params, depth: int, x: jax.Array) -> jax.Array:
    """Images (B, 3, H, W) -> region tokens (B, (H/32)*(W/32), C).
    224x224 input yields the reference's 49 regions."""
    kind, blocks = RESNET_LAYERS[depth]
    block_fn = _basic_block if kind == "basic" else _bottleneck_block

    x = x.astype(params["stem"]["conv"].dtype)  # follow compute dtype
    x = _conv(x, params["stem"]["conv"], 2, 3)
    x = jax.nn.relu(_bn(params["stem"]["bn"], x))
    # torch MaxPool2d(kernel=3, stride=2, padding=1): pad with -inf
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])
    for s in range(4):
        for b, blk in enumerate(params[f"layer{s + 1}"]):
            stride = 2 if (s > 0 and b == 0) else 1
            x = block_fn(blk, x, stride)
    b_, c, h, w = x.shape
    return x.reshape(b_, c, h * w).transpose(0, 2, 1)


def resnet_embed(params, depth: int, x: jax.Array, train: bool = False) -> jax.Array:
    """ResNetEmbeddings.forward: pass through precomputed embeddings
    (ndim != 4), stop_gradient when frozen (vault/modules.py:282-301)."""
    if x.ndim != 4:
        return x
    feats = resnet_features(params, depth, x)
    return feats if train else jax.lax.stop_gradient(feats)


# ---------------------------------------------------------------------------
# torchvision state_dict converter
# ---------------------------------------------------------------------------

def resnet_params_from_torch(state_dict, depth: int):
    from vault_tpu.models.convert import _np
    kind, blocks = RESNET_LAYERS[depth]
    sd = state_dict

    def bn(name):
        return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
                "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
                "mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
                "var": jnp.asarray(_np(sd[f"{name}.running_var"]))}

    params: Dict = {"stem": {"conv": jnp.asarray(_np(sd["conv1.weight"])),
                             "bn": bn("bn1")}}
    n_convs = 2 if kind == "basic" else 3
    for s, n in enumerate(blocks):
        stage = []
        for b in range(n):
            pre = f"layer{s + 1}.{b}"
            blk = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = jnp.asarray(_np(sd[f"{pre}.conv{ci}.weight"]))
                blk[f"bn{ci}"] = bn(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = jnp.asarray(_np(sd[f"{pre}.downsample.0.weight"]))
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            stage.append(blk)
        params[f"layer{s + 1}"] = stage
    return params
