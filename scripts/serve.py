#!/usr/bin/env python
"""Serve a fine-tuned VAuLT classifier over HTTP with micro-batching.

    python scripts/serve.py --bert /ckpts/bert-base-uncased \
        --ckpt experiment_logs/.../model.npz --n_classes 3 --port 8000

POST /predict {"text": "...", "image_b64": "<png/jpeg base64>"}
  -> {"output": [logit, ...]}
GET  /healthz -> {"ok": true, batching + latency stats}
GET  /metrics -> Prometheus text (request p50/p99, queue depth, counters)

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
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel serving over N chips: the padded "
                         "batch is sharded over a mesh 'data' axis and the "
                         "per-device forward runs under shard_map, so the "
                         "fused Pallas kernels stay engaged per shard "
                         "(multi-chip THROUGHPUT; --max_batch must divide "
                         "by N).  Composes with --tp as an N x M mesh "
                         "(the combined case takes the XLA path like --tp)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel serving over N chips: params are "
                         "Megatron-sharded (parallel/sharding.py — QKV/MLP-in "
                         "column, attn-out/MLP-out row) over a 1xN mesh and "
                         "GSPMD emits the ICI collectives.  Composes with "
                         "--quantize (int8 weights + scales shard the same "
                         "way).  Uses the XLA compute path: the fused Pallas "
                         "kernels are single-device programs")
    ap.add_argument("--pp", action="store_true",
                    help="2-stage pipelined serving (the reference's "
                         "PipelineVaultMixin): LM tower on device 0, "
                         "ViLT+head on device 1, micro-batches overlapped "
                         "(parallel/pipeline.py).  For when the text tower "
                         "alone outgrows one chip's HBM; prefer --tp/--dp "
                         "otherwise.  Mutually exclusive with --tp/--dp")
    ap.add_argument("--merge_to", type=int, default=None,
                    help="ToMe patch-token merging (ops/token_merge.py): "
                         "merge the patch tokens down to N before the "
                         "co-encoder — 87 makes the joint sequence 128 and "
                         "~halves co-encoder FLOPs at a small accuracy "
                         "cost (duplicate-exact proportional attention). "
                         "Measured batch-16 v5e throughput "
                         "(docs/BENCHMARKS.md): bf16 2042 -> 3429 pairs/s "
                         "at merge@0 (1.68x), 3075 at merge@4; composed "
                         "with --quantize w8a8: 3566.  Merging also moves "
                         "the batch sweet spot to 64 (--max_batch 64): "
                         "bf16+merge87 3630.8, w8a8+merge87 4011.0 — the "
                         "fastest measured config, ~16 ms/step. "
                         "Composes with --quantize/--dp/--tp; not with --pp. "
                         "Head validation (measure_head_divergence.py, "
                         "random-init pessimistic proxy, n in parens): "
                         "narrow pooled heads TMSC-3way (48) and NLVR2 "
                         "(48) flip <=1 decision under every lever and "
                         "composition; VQA's 3129-way argmax (48) and MLM "
                         "top-1 (1920) move a few percent — prefer "
                         "--merge_at_layer 4 for both, and do NOT compose "
                         "ANY --quantize mode with merging on wide heads "
                         "(round-5 full matrix: VQA flips 12.5-16.7%% for "
                         "quant+merge@0, 8.3-10.4%% for quant+merge@4 — "
                         "about the sum of the single levers); retrieval "
                         "rank inversions (1128) stay <=1.6%%, lowest "
                         "under w8 or merge@4")
    ap.add_argument("--merge_at_layer", type=int, default=0,
                    help="WHERE to merge: 0 (default) merges raw embeddings "
                         "before the encoder (max savings); k > 0 merges "
                         "after k encoder layers on contextualized tokens — "
                         "much lower divergence on the random-init proxy "
                         "for (12-k)/12 of the savings.  Caveat (round-5 "
                         "trained-margin proxy, BENCHMARKS): on a TRAINED "
                         "model mid-stack merging measured ~3x MORE "
                         "decision flips than embed-time — validate on "
                         "your task head before assuming @4 is the safe "
                         "variant")
    ap.add_argument("--force", action="store_true",
                    help="serve a measured-bad lever composition anyway "
                         "(vault_tpu/serving.py check_serving_composition; "
                         "e.g. int8 + merge@0 on a wide head flipped "
                         "12.5-16.7%% of VQA decisions on the real-photo "
                         "proxy)")
    ap.add_argument("--canvas", default="608x608",
                    help="fixed HxW canvas (default 608x608: one compiled "
                         "program covering both orientations). 'auto' "
                         "bucket mode is NOT recommended for serving: each "
                         "new bucket jit-compiles mid-traffic")
    ap.add_argument("--debug_tiny", action="store_true",
                    help="tiny model geometry + 64x64 canvas (CI smoke; "
                         "same knob as the experiment CLIs)")
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

    if args.debug_tiny:
        from vault_tpu.config import debug_tiny_vault_config

        cfg = debug_tiny_vault_config()
        args.canvas = "64x64"
    else:
        cfg = VaultConfig(vilt=vilt_config_from_name(args.vilt),
                          text_tower=text_config_from_name(args.bert))
    params = init_vault(jax.random.PRNGKey(0), cfg)
    params["head"] = init_classifier_head(jax.random.PRNGKey(1),
                                          cfg.vilt.hidden_size,
                                          args.n_classes)
    if args.int8 and args.quantize and args.quantize != "w8":
        ap.error(f"--int8 (alias for --quantize w8) conflicts with "
                 f"--quantize {args.quantize}")
    mode = args.quantize or ("w8" if args.int8 else None)
    # pre-quantized checkpoints (quantize once offline, serve many times —
    # the int8 leaves round-trip exactly, tests/test_quantize.py): detect
    # the stored form from the npz keys and build the matching restore
    # target, instead of requantizing from fp at every server start
    ckpt_mode = None
    if args.ckpt:
        path = args.ckpt if args.ckpt.endswith(".npz") else args.ckpt + ".npz"
        with np.load(path) as z:
            keys = [k.rsplit("::", 1)[0] for k in z.files]
        ckpt_mode = ("w8a8" if any(k.endswith("/w_q8") for k in keys)
                     else "w8" if any(k.endswith("/w_q") for k in keys)
                     else None)
        if ckpt_mode and mode and mode != ckpt_mode:
            ap.error(f"--quantize {mode} conflicts with the checkpoint, "
                     f"which stores {ckpt_mode} params")
        mode = mode or ckpt_mode

    # measured-bad composition guard (docs/BENCHMARKS.md head table):
    # refuse red combinations unless --force; always print the warnings
    from vault_tpu.serving import check_serving_composition

    refusals, comp_warnings = check_serving_composition(
        args.n_classes, mode, args.merge_to, args.merge_at_layer)
    for w in comp_warnings:
        print(f"WARNING: {w}", file=sys.stderr)
    if refusals and not args.force:
        for r in refusals:
            print(f"REFUSING: {r}", file=sys.stderr)
        raise SystemExit(2)
    for r in refusals:
        print(f"WARNING (forced): {r}", file=sys.stderr)

    def cast_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    if mode:
        from vault_tpu.ops.quantize import quantize_model_params
    if ckpt_mode:
        params = quantize_model_params(cast_bf16(params), mode=ckpt_mode)
    if args.ckpt:
        from vault_tpu.training.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, {"params": params})["params"]
    if not ckpt_mode:
        params = cast_bf16(params)
        if mode:
            params = quantize_model_params(params, mode=mode)

    canvas = args.canvas if args.canvas == "auto" else tuple(
        int(v) for v in args.canvas.lower().split("x"))
    processor = VaultProcessor(build_tokenizer(args.bert), canvas=canvas)

    # w8a8 serves fastest with the in-kernel LN->QKV variant (6.47-6.58 vs
    # the bf16 default's 7.57 ms at batch 16 — docs/BENCHMARKS.md "Int8
    # quantization").  Adding "fuseqkv" (BERT-tower fused w8a8 QKV) was
    # measured SLOWER (7.23 ms): the per-step in-graph concat of the int8
    # q/k/v weights costs more HBM traffic than the two saved activation
    # quantizations.  bf16/w8 stay on the measured-best "auto" kernels
    impl = "fuselnqkv+fusemlp" if mode == "w8a8" else "auto"
    if args.dp > 1 and args.max_batch % args.dp:
        ap.error(f"--max_batch {args.max_batch} must divide by --dp {args.dp}")
    if args.pp and (args.tp > 1 or args.dp > 1):
        ap.error("--pp is mutually exclusive with --tp/--dp")
    if args.pp and args.merge_to is not None:
        ap.error("--merge_to is not supported with --pp (the pipeline "
                 "stages are compiled without the merge seam)")
    merge_to, merge_layer = args.merge_to, args.merge_at_layer
    if args.pp:
        from vault_tpu.models.vault import classifier_head_apply
        from vault_tpu.parallel.pipeline import PipelineVault

        pipe = PipelineVault(params, cfg,
                             inner_batch_size=max(1, args.max_batch // 2))
        head = jax.device_put(params["head"], pipe.vilt_device)
        headf = jax.jit(lambda h, pooled: classifier_head_apply(
            h, pooled, dropout_prob=0.0, deterministic=True))
        fwd = lambda b: headf(head, pipe(**b).pooler_output)
    elif args.tp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vault_tpu.parallel.mesh import make_mesh, replicated
        from vault_tpu.parallel.sharding import shard_params

        mesh = make_mesh(num_data=args.dp, num_model=args.tp)
        params = shard_params(mesh, params)
        bspec = (NamedSharding(mesh, P("data")) if args.dp > 1
                 else replicated(mesh))
        # XLA path under TP: GSPMD partitions the (sharded-weight) matmuls
        # and inserts the all-reduces; Pallas kernels are single-device
        # programs and would force a gather. Equivalence to the
        # single-device forward is tested on a CPU mesh
        # (tests/test_tp_serving.py), exactly for the int8 modes.
        jfwd = jax.jit(lambda p, b: vault_for_classification(
            p, cfg, b, head_dropout=0.0, deterministic=True,
            use_pallas=False, merge_patches_to=merge_to, merge_at_layer=merge_layer))
        fwd = lambda b: jfwd(params, jax.device_put(b, bspec))
    elif args.dp > 1:
        from vault_tpu.parallel.mesh import make_mesh
        from vault_tpu.serving import dp_sharded_forward

        mesh = make_mesh(num_data=args.dp, num_model=1)
        fwd = dp_sharded_forward(
            lambda p, b: vault_for_classification(
                p, cfg, b, head_dropout=0.0, deterministic=True,
                use_pallas=impl, merge_patches_to=merge_to, merge_at_layer=merge_layer),
            mesh, params)
    else:
        # params passed as an argument, not closed over: closed-over trees
        # bake into the HLO as constants (docs/NOTES.md — oversized programs
        # through the compile relay)
        jfwd = jax.jit(lambda p, b: vault_for_classification(
            p, cfg, b, head_dropout=0.0, deterministic=True,
            use_pallas=impl, merge_patches_to=merge_to, merge_at_layer=merge_layer))
        fwd = lambda b: jfwd(params, b)

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
