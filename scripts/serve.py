#!/usr/bin/env python
"""Serve a fine-tuned VAuLT classifier over HTTP with micro-batching.

    python scripts/serve.py --bert /ckpts/bert-base-uncased \
        --ckpt experiment_logs/.../model.npz --n_classes 3 --port 8000

POST /predict {"text": "...", "image_b64": "<png/jpeg base64>"}
  -> {"output": [logit, ...]}
GET  /healthz -> {"ok": true, "batches_run": N, "requests_served": M}

The device only ever sees one compiled program: requests are padded to
--max_batch (vault_tpu/serving.py)."""

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
    ap.add_argument("--ckpt", help="trained {params,...} npz "
                                   "(training/checkpoint.py); random init "
                                   "when omitted")
    ap.add_argument("--n_classes", type=int, default=3)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--int8", action="store_true",
                    help="alias for --quantize w8")
    ap.add_argument("--quantize", default=None, choices=["w8", "w8a8"],
                    help="int8 serving: w8 = weight-only (halved weight "
                         "HBM, bf16 matmuls), w8a8 = also quantize "
                         "activations per row so matmuls run on the MXU's "
                         "double-rate int8 path (ops/quantize.py; pooler "
                         "divergence budgets in docs/BENCHMARKS.md)")
    ap.add_argument("--canvas", default="608x608",
                    help="fixed HxW canvas (default 608x608: one compiled "
                         "program covering both orientations). 'auto' "
                         "bucket mode is NOT recommended for serving: each "
                         "new bucket jit-compiles mid-traffic")
    args = ap.parse_args()

    import numpy as np

    from vault_tpu.config import VaultConfig
    from vault_tpu.data.processor import VaultProcessor
    from vault_tpu.models.pretrained import (
        build_tokenizer,
        text_config_from_name,
        vilt_config_from_name,
    )
    from vault_tpu.models.vault import (
        init_classifier_head,
        init_vault,
        vault_for_classification,
    )
    from vault_tpu.serving import InferenceServer

    cfg = VaultConfig(vilt=vilt_config_from_name(args.vilt),
                      text_tower=text_config_from_name(args.bert))
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size,
                                          args.n_classes)
    if args.ckpt:
        from vault_tpu.training.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, {"params": params})["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    mode = args.quantize or ("w8" if args.int8 else None)
    if mode:
        from vault_tpu.ops.quantize import quantize_model_params

        params = quantize_model_params(params, mode=mode)

    canvas = args.canvas if args.canvas == "auto" else tuple(
        int(v) for v in args.canvas.lower().split("x"))
    processor = VaultProcessor(build_tokenizer(args.bert), canvas=canvas)

    # w8a8 serves fastest with the in-kernel LN->QKV variant (6.58 vs the
    # bf16 default's 7.57 ms at batch 16 — docs/BENCHMARKS.md "Int8
    # quantization"); bf16/w8 stay on the measured-best "auto" kernels
    impl = "fuselnqkv+fusemlp" if mode == "w8a8" else "auto"
    fwd = jax.jit(lambda b: vault_for_classification(
        params, cfg, b, head_dropout=0.0, deterministic=True,
        use_pallas=impl))

    server = InferenceServer(processor, fwd, host=args.host, port=args.port,
                             max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms)
    # pre-warm: compile the serving program BEFORE accepting traffic (first
    # TPU compile can take minutes through a cold cache; without this the
    # triggering request and everything queued behind it would time out)
    print("warming up (compiling the serving program)...")
    warm = np.full((64, 64, 3), 127, np.uint8)
    server.engine.predict(warm, "warmup", timeout=900.0)
    server.start()
    print(f"serving on http://{args.host}:{server.port}  "
          f"(max_batch={args.max_batch})")
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
