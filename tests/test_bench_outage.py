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
