#!/usr/bin/env python
"""Does the RANDOM-INIT lever ranking transfer to TRAINED margins?

The per-head serving guidance (docs/BENCHMARKS.md head table;
scripts/serve.py --help) rests on flip rates measured on a random-init
model — honest about being a pessimistic proxy, but the claim that "the
RANKING of levers per head is the actionable part" was itself unverified
on trained margins (VERDICT r4 #3).  This script closes that loop with
the only trained model available offline: the tiny recipe proxy of
measure_merge_recipe_cost.py, trained to convergence on an IMAGE-borne
binary colour-patch task (a signal merging/quantization could plausibly
destroy), through the REAL Trainer protocol (windowed eval, early stop,
best restore).

For the trained model AND a random-init control of the same geometry it
measures, for every lever composition serve.py accepts (tiny-geometry
analogues: 9 patch tokens -> 4, merge@1-of-2 as the @4-of-12 analogue):

  * argmax flip rate vs the same params un-levered,
  * on a contrast sweep: in-distribution (2.0, the training contrast)
    plus boundary-heavy sets (1.0, 0.5) where trained margins shrink --
    saturated margins would otherwise read 0% everywhere and decide
    nothing,
  * plus the base top1-top2 logit margin, showing the trained/random
    margin gap the table's "pessimistic proxy" caveat appeals to.

Summary: lever ranking by flip rate under trained vs random params and
their Spearman rank correlation.

CPU, ~15 min: python scripts/measure_head_divergence_trained.py
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from vault_tpu.models.vault import (
    init_classifier_head,
    init_vault,
    vault_for_classification,
)
from vault_tpu.ops.quantize import quantize_model_params

from measure_merge_recipe_cost import (
    N_CLASSES,
    make_config,
    run_recipe,
    synth_image_task,
)

N_EVAL = 480
CONTRASTS = (2.0, 1.0, 0.5)


def lever_modes():
    """Tiny-geometry analogues of every composition serve.py accepts."""
    out = {}
    for q in (None, "w8", "w8a8"):
        for merge in (None, ("merge4@0", 0), ("merge4@1", 1)):
            if q is None and merge is None:
                continue
            name = "+".join([s for s in (q, merge and merge[0]) if s])
            kw = {} if merge is None else dict(merge_patches_to=4,
                                               merge_at_layer=merge[1])
            out[name] = (q, kw)
    return out


def eval_logits(cfg, params, batch, kw):
    return np.asarray(vault_for_classification(
        params, cfg, batch, head_dropout=0.0, deterministic=True, **kw))


def main():
    cfg = make_config()
    rng = np.random.default_rng(0)
    train = synth_image_task(rng, 480, cfg)
    dev = synth_image_task(rng, 192, cfg)

    params0 = init_vault(jax.random.PRNGKey(0), cfg)
    params0["head"] = init_classifier_head(jax.random.PRNGKey(100),
                                           cfg.vilt.hidden_size, N_CLASSES)

    with tempfile.TemporaryDirectory() as td:
        rec, trained = run_recipe(cfg, params0, train, dev, td, "trained")
    print(json.dumps({"trained_recipe": rec}), flush=True)

    evals = {c: synth_image_task(np.random.default_rng(1000 + int(10 * c)),
                                 N_EVAL, cfg, contrast=c)
             for c in CONTRASTS}

    rows = []
    for tag, params in (("trained", trained), ("random", params0)):
        qp = {m: quantize_model_params(params, mode=m)
              for m in ("w8", "w8a8")}
        base = {}
        for c, (feats, labels) in evals.items():
            logits = eval_logits(cfg, params, feats, {})
            top2 = np.sort(logits, -1)
            base[c] = logits
            print(json.dumps({
                "params": tag, "contrast": c, "mode": "base",
                "accuracy": round(float(np.mean(
                    np.argmax(logits, -1) == labels)), 4),
                "mean_top1_top2_margin": round(float(np.mean(
                    top2[:, -1] - top2[:, -2])), 4),
                "n": N_EVAL}), flush=True)
        for mode, (q, kw) in lever_modes().items():
            p = qp[q] if q else params
            for c, (feats, labels) in evals.items():
                logits = eval_logits(cfg, p, feats, kw)
                row = {
                    "params": tag, "contrast": c, "mode": mode,
                    "argmax_flip_rate": round(float(np.mean(
                        np.argmax(logits, -1)
                        != np.argmax(base[c], -1))), 4),
                    # flips are divergence; ACCURACY under the lever is
                    # what a deployment actually pays
                    "accuracy": round(float(np.mean(
                        np.argmax(logits, -1) == labels)), 4),
                    "logit_max_abs_diff": round(float(
                        np.abs(logits - base[c]).max()), 4),
                    "n": N_EVAL}
                rows.append(row)
                print(json.dumps(row), flush=True)

    # ranking agreement: pool flip rates across contrasts per lever
    def pooled(tag):
        modes = sorted({r["mode"] for r in rows})
        return {m: float(np.mean([r["argmax_flip_rate"] for r in rows
                                  if r["params"] == tag
                                  and r["mode"] == m]))
                for m in modes}

    tr, rd = pooled("trained"), pooled("random")
    modes = sorted(tr)

    def rank(d):
        order = sorted(modes, key=lambda m: d[m])
        return {m: order.index(m) for m in modes}

    rt, rr = rank(tr), rank(rd)
    x = np.array([rt[m] for m in modes], float)
    y = np.array([rr[m] for m in modes], float)
    denom = float(np.std(x) * np.std(y))
    spearman = (float(np.mean((x - x.mean()) * (y - y.mean()))) / denom
                if denom else float("nan"))
    # a flat flip-rate vector carries no ranking information — the tiny
    # RANDOM-init model's pooled output is patch-INSENSITIVE (lever
    # logit diffs ~1e-4), so its "ranking" is alphabetical noise and the
    # correlation against it is meaningless; say so in-band
    degenerate = [tag for tag, d in (("trained", tr), ("random", rd))
                  if max(d.values()) - min(d.values()) < 0.01]
    print(json.dumps({
        "summary": "lever flip-rate ranking, trained vs random margins",
        "pooled_flip_rate_trained": {m: round(tr[m], 4) for m in modes},
        "pooled_flip_rate_random": {m: round(rd[m], 4) for m in modes},
        "ranking_trained": sorted(modes, key=lambda m: tr[m]),
        "ranking_random": sorted(modes, key=lambda m: rd[m]),
        "spearman_rank_correlation": round(spearman, 3),
        "degenerate_rankings": degenerate,
        "ranking_comparison_valid": not degenerate,
    }), flush=True)


if __name__ == "__main__":
    main()
