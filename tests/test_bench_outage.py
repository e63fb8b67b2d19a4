"""bench.py must never die with a raw traceback on a tunnel outage
(BENCH_r03 was exactly that): a dead backend yields ONE in-band JSON line
``{"error": "tpu_unavailable", "last_good": <newest BENCH_r value>}``.

Both observed outage modes (docs/NOTES.md) are forced here via the probe
override: instant failure (rc!=0, the `UNAVAILABLE` mode) and a silent
hang past the probe timeout."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(probe_code, timeout_s="60"):
    env = dict(os.environ,
               VAULT_BENCH_PROBE_CODE=probe_code,
               VAULT_BENCH_PROBE_TIMEOUT_S=timeout_s,
               VAULT_BENCH_PROBE_RETRIES="1",
               VAULT_BENCH_PROBE_BACKOFF_S="0")
    return subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                          capture_output=True, text=True, timeout=180,
                          env=env, cwd=ROOT)


def _assert_outage_json(r):
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    sys.path.insert(0, ROOT)
    import bench
    assert rec["last_good"] == bench._last_recorded_bench()
    return rec


def test_outage_instant_failure_mode():
    """UNAVAILABLE-on-first-op mode: the probe subprocess exits nonzero."""
    _assert_outage_json(_run_bench("import sys; sys.exit(1)"))


def test_outage_silent_hang_mode():
    """Silent-hang mode: the probe subprocess outlives the bounded timeout
    and is killed from outside."""
    _assert_outage_json(_run_bench("import time; time.sleep(30)",
                                   timeout_s="2"))


def test_last_recorded_bench_skips_failed_rounds():
    """_last_recorded_bench must return the newest round WITH a value:
    BENCH_r03.json is a captured outage (parsed: null) and must be skipped
    in favour of r02."""
    sys.path.insert(0, ROOT)
    import bench
    last = bench._last_recorded_bench()
    assert last is not None and last > 0


def test_recorded_serve_fields_pick_levered_best(tmp_path, monkeypatch):
    """The serving-axis field must pick the fastest LEVERED perf-sweep row
    only: production-default (quant off, no merge) rows and train-metric
    rows must never become the levered headline, even when faster."""
    rows = [
        # unlevered and fastest — must be ignored
        {"tag": "ctl", "ts": "2026-01-01T00:00:00Z", "batch": 16,
         "pallas": "auto", "quant": "0", "merge_to": None,
         "merge_at_layer": 0, "pairs_per_sec": 9999.0},
        # train row (has `metric`) — ignored
        {"tag": "train", "ts": "2026-01-01T00:00:01Z", "metric":
         "vault_train_step_pairs_per_sec_per_chip", "value": 8888.0,
         "batch": 32, "merge_to": 87},
        # two levered rows — the faster one wins
        {"tag": "m87", "ts": "2026-01-01T00:00:02Z", "batch": 16,
         "pallas": "auto", "quant": "0", "merge_to": 87,
         "merge_at_layer": 0, "pairs_per_sec": 3000.0},
        {"tag": "w8a8_m87", "ts": "2026-01-01T00:00:03Z", "batch": 64,
         "pallas": "fuselnqkv+fusemlp", "quant": "w8a8", "merge_to": 87,
         "merge_at_layer": 0, "pairs_per_sec": 4000.0},
    ]
    p = tmp_path / "r99_tpu_results.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    sys.path.insert(0, ROOT)
    import glob as glob_mod

    import bench
    monkeypatch.setattr(glob_mod, "glob", lambda pat: [str(p)])
    out = bench._recorded_serve_fields()
    assert out["serve_levered_best_pairs_per_sec"] == 4000.0
    assert out["serve_levered_best_config"]["quant"] == "w8a8"
    assert "w8a8_m87" in out["serve_levered_best_source"]


def test_recorded_llama_fields_pick_best_probe_row(tmp_path, monkeypatch):
    """The big-tower axis must pick the fastest Llama PROBE row only
    (metric-matched), never the w8a8-vs-w8 comparison record or other
    metrics, and must disclose the tower/batch config with the number."""
    rows = [
        # a PRE-AUDIT row (no implied_tflops_per_sec): this is the shape
        # of the retracted 6.91 ms hoisting-bug reading still present in
        # the r04 series — absurdly fast, must never win
        {"tag": "llama8b", "ts": "2025-12-31T00:00:00Z",
         "metric": "llama8b_vault_forward_pairs_per_sec_per_chip",
         "value": 2314.96, "batch": 16, "ms_per_step": 6.91,
         "tower": "llama3-8B-geometry w8"},
        # a post-audit row whose implied TFLOP/s exceeds the int8 device
        # peak — a hoisted/implausible reading flagging itself; skipped
        {"tag": "llama8b_hoisted", "ts": "2025-12-31T00:00:01Z",
         "metric": "llama8b_vault_forward_pairs_per_sec_per_chip",
         "value": 1500.0, "batch": 16, "ms_per_step": 10.7,
         "implied_tflops_per_sec": 980.0,
         "tower": "llama3-8B-geometry w8"},
        {"tag": "llama8b_w8_vs_w8a8", "ts": "2026-01-01T00:00:00Z",
         "metric": "llama8b_vault_forward_pairs_per_sec_per_chip",
         "value": 284.21, "batch": 16, "ms_per_step": 56.3,
         "implied_tflops_per_sec": 185.8,
         "tower": "llama3-8B-geometry w8"},
        # the comparison record (no `value`) — must be ignored
        {"tag": "llama8b_w8_vs_w8a8", "ts": "2026-01-01T00:00:01Z",
         "metric": "llama8b_w8a8_vs_w8", "speedup": 1.153, "batch": 16},
        # a faster row wins; its non-default impls must be disclosed
        {"tag": "llama8b_w8a8_b64", "ts": "2026-01-01T00:00:02Z",
         "metric": "llama8b_vault_forward_pairs_per_sec_per_chip",
         "value": 500.0, "batch": 64, "ms_per_step": 128.0,
         "implied_tflops_per_sec": 327.0, "mlp_impl": "pallas",
         "tower": "llama3-8B-geometry w8a8"},
        # an unrelated faster metric — ignored
        {"tag": "train", "ts": "2026-01-01T00:00:03Z",
         "metric": "vault_train_step_pairs_per_sec_per_chip",
         "value": 9999.0, "batch": 32},
    ]
    p = tmp_path / "r99_tpu_results.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    sys.path.insert(0, ROOT)
    import glob as glob_mod

    import bench
    monkeypatch.setattr(glob_mod, "glob", lambda pat: [str(p)])
    out = bench._recorded_llama_fields()
    assert out["llama8b_best_pairs_per_sec"] == 500.0
    assert out["llama8b_best_config"]["tower"] == "llama3-8B-geometry w8a8"
    assert out["llama8b_best_config"]["batch"] == 64
    assert out["llama8b_best_config"]["mlp_impl"] == "pallas"
    assert "attn_impl" not in out["llama8b_best_config"]  # default: absent
    assert "llama8b_w8a8_b64" in out["llama8b_best_source"]
