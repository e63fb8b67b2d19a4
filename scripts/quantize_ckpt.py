#!/usr/bin/env python
"""Quantize a trained fp checkpoint into an int8 serving checkpoint, offline.

    python scripts/quantize_ckpt.py --ckpt .../model.npz \
        --out .../model_w8a8.npz --mode w8a8 --n_classes 3

The output stores int8 weights + fp32 per-out-channel scales for every
encoder linear (ops/quantize.py) and round-trips exactly through the npz
format (tests/test_quantize.py).  scripts/serve.py auto-detects the stored
form from the npz keys, so serving skips the per-start requantization —
quantize once, serve many times.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vilt", default="dandelin/vilt-b32-mlm")
    ap.add_argument("--bert", default="bert-base-uncased")
    ap.add_argument("--ckpt", required=True,
                    help="trained {params,...} npz (training/checkpoint.py)")
    ap.add_argument("--out", required=True, help="output npz path")
    ap.add_argument("--mode", default="w8a8", choices=["w8", "w8a8"])
    ap.add_argument("--n_classes", type=int, default=3)
    ap.add_argument("--debug_tiny", action="store_true",
                    help="tiny model geometry (CI smoke; matches serve.py)")
    args = ap.parse_args()

    # quantization is a host-side tree transform; never route it through the
    # TPU tunnel
    jax.config.update("jax_platforms", "cpu")

    from vault_tpu.config import VaultConfig
    from vault_tpu.models.pretrained import (
        text_config_from_name,
        vilt_config_from_name,
    )
    from vault_tpu.models.vault import init_classifier_head, init_vault
    from vault_tpu.ops.quantize import quantize_model_params
    from vault_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    if args.debug_tiny:
        from vault_tpu.config import debug_tiny_vault_config

        cfg = debug_tiny_vault_config()
    else:
        cfg = VaultConfig(vilt=vilt_config_from_name(args.vilt),
                          text_tower=text_config_from_name(args.bert))
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size,
                                          args.n_classes)
    params = restore_checkpoint(args.ckpt, {"params": params})["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    qparams = quantize_model_params(params, mode=args.mode)
    save_checkpoint(args.out, {"params": qparams})
    n_int8 = sum(x.size for x in jax.tree.leaves(qparams)
                 if hasattr(x, "dtype") and x.dtype == jnp.int8)
    print(f"wrote {args.out} ({args.mode}; {n_int8 / 1e6:.1f}M int8 weights)")


if __name__ == "__main__":
    main()
