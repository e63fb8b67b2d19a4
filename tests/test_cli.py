"""End-to-end CLI smoke tests: both experiment drivers run on synthetic data
with tiny geometry and produce the reference experiment-log layout."""

import os
import subprocess
import sys

import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_twitter(tmp_path):
    d = tmp_path / "twitter2015"
    imgs = tmp_path / "twitter2015_images"
    d.mkdir(); imgs.mkdir()
    rows = [(str(i), str(i % 3 - 1), f"im{i % 4}.jpg",
             f"tweet number {i} about $T$ stuff", f"target {i % 5}")
            for i in range(12)]
    for split in ("train", "dev", "test"):
        with open(d / f"{split}.tsv", "w") as f:
            f.write("index\t#1 Label\t#2 ImageID\t#3 String\t#3 String\n")
            for r in rows:
                f.write("\t".join(r) + "\n")
    for i in range(4):
        Image.new("RGB", (80, 60), (i * 40, 100, 150)).save(imgs / f"im{i}.jpg")
    Image.new("RGB", (80, 60), (0, 0, 0)).save(imgs / "17_06_4705.jpg")
    return str(d)


def _run(cmd, cwd=REPO, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    return subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_clsf_vault_cli(tmp_path):
    data_dir = _make_twitter(tmp_path)
    logs = str(tmp_path / "logs")
    res = _run([sys.executable, "experiments/clsf_vault.py", "Twitter201X",
                "--dir", data_dir, "--train_split", "train",
                "--dev_split", "dev", "--test_split", "test",
                "--bert_model_name_or_path", "bert-base-uncased",
                "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--eval_batch_size", "4",
                "--experiment_root", logs, "--add_placeholder_token"])
    assert res.returncode == 0, res.stderr[-3000:]
    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCTwitter201X"))
    assert len(run_dirs) == 1
    d = os.path.join(logs, "VaultTMSCTwitter201X", run_dirs[0])
    with open(os.path.join(d, "metrics.yml")) as f:
        metrics = yaml.safe_load(f)
    block = metrics["experiment_0"]
    assert "train_loss" in block and "test_eval_accuracy" in block
    assert os.path.exists(os.path.join(d, "aggregated_metrics.yml"))


def test_clsf_vault_entity_cache(tmp_path):
    import json

    data_dir = _make_twitter(tmp_path)
    logs = str(tmp_path / "logs")
    cache = tmp_path / "entities.json"
    cache.write_text(json.dumps({
        "target 0": ["Target_Zero", "a tweet about stuff"],
        "target 1": [None, None],
    }))
    res = _run([sys.executable, "experiments/clsf_vault.py", "Twitter201X",
                "--dir", data_dir, "--train_split", "train",
                "--bert_model_name_or_path", "bert-base-uncased",
                "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--experiment_root", logs,
                "--entity_cache", str(cache)])
    assert res.returncode == 0, res.stderr[-3000:]


def test_tmsc_tombert_cli(tmp_path):
    """TomBERT driver incl. the reference's flag surface: placeholder
    token, per-fetch preprocessing, entity cache, decode workers
    (reference experiments/tmsc_tombert.py:31-49)."""
    import json

    data_dir = _make_twitter(tmp_path)
    logs = str(tmp_path / "logs")
    cache = tmp_path / "entities.json"
    cache.write_text(json.dumps({
        "target 0": ["Target_Zero", "a tweet about stuff"],
        "target 1": [None, None],
    }))
    res = _run([sys.executable, "experiments/tmsc_tombert.py", "TomBERT",
                "--dir", data_dir, "--train_split", "train",
                "--dev_split", "dev",
                "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--eval_batch_size", "4",
                "--add_placeholder_token", "--preprocess_on_fetch",
                "--max_num_workers", "2", "--disable_tqdm",
                "--entity_cache", str(cache),
                "--experiment_root", logs])
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.listdir(os.path.join(logs, "TomBERTTMSC"))


def test_tmsc_tomvilt_cli(tmp_path):
    data_dir = _make_twitter(tmp_path)
    logs = str(tmp_path / "logs")
    res = _run([sys.executable, "experiments/tmsc_tombert.py", "TomViLT",
                "--dir", data_dir, "--train_split", "train",
                "--use_tweet_bert", "--debug_tiny", "--num_train_epochs", "1",
                "--vilt_dropout_prob", "0.1", "--mm_pooling", "first",
                "--add_placeholder_token",
                "--train_batch_size", "4", "--experiment_root", logs])
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.listdir(os.path.join(logs, "TomViLTTMSC"))


def _make_bloomberg(tmp_path, n=24):
    d = tmp_path / "bloomberg"
    (d / "Twitter_images").mkdir(parents=True)
    with open(d / "bloomberg-textimage.csv", "w") as f:
        f.write("tweet_id,tweet,other,text_is_represented\n")
        for i in range(n):
            f.write(f"{i},tweet number {i},x,{i % 2}\n")
    for i in range(n):
        Image.new("RGB", (60, 50), (i * 10 % 255, 40, 90)).save(
            d / "Twitter_images" / f"T{i}.jpg")
    return str(d)


def _make_mvsa(tmp_path, n=20):
    d = tmp_path / "MVSA_Single"
    (d / "data").mkdir(parents=True)
    kinds = ["positive", "neutral", "negative"]
    with open(d / "labelResultAll.txt", "w") as f:
        f.write("ID\ttext,image\n")
        for i in range(1, n + 1):
            k = kinds[i % 3]
            f.write(f"{i}\t{k},{k}\n")
    for i in range(1, n + 1):
        (d / "data" / f"{i}.txt").write_text(f"tweet {i}")
        Image.new("RGB", (50, 50), (i * 12 % 255, 70, 20)).save(
            d / "data" / f"{i}.jpg")
    return str(d)


def test_bloomberg_cli(tmp_path):
    root = _make_bloomberg(tmp_path)
    logs = str(tmp_path / "logs")
    res = _run([sys.executable, "experiments/clsf_vault.py", "Bloomberg",
                "--root_dir", root, "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--eval_batch_size", "4",
                "--dev_size", "4", "--test_size", "4",
                "--experiment_root", logs])
    assert res.returncode == 0, res.stderr[-3000:]
    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCBloomberg"))
    assert len(run_dirs) == 1


def test_mvsa_cli_preprocessed_and_freeze_lm(tmp_path):
    root = _make_mvsa(tmp_path)
    logs = str(tmp_path / "logs")
    res = _run([sys.executable, "experiments/clsf_vault.py", "MVSA",
                "--root_dir", root, "--preprocessed",
                "--train_split", "train", "dev", "--test_split", "test",
                "--bert_model_name_or_path", "bert-base-uncased",
                "--vilt_internal_dropout_prob", "0.1",  # the wired intent
                "--freeze_lm", "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--eval_batch_size", "4",
                "--experiment_root", logs])
    assert res.returncode == 0, res.stderr[-3000:]
    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCMVSA"))
    assert len(run_dirs) == 1
    # the recipe's merged train+dev drives the run-dir name, mirroring the
    # reference dataset name semantics (vault/vl_utils/dataset.py)
    assert "MVSA_Single(train;dev)" in run_dirs[0]


def test_full_recipe_rehearsal_mvsa(tmp_path):
    """Full-recipe rehearsal: scripts/test-results.sh's MVSA leg (2 reps,
    tiny geometry via EXTRA_FLAGS, bert variant only via VARIANTS) must
    produce the reference README's experiment-log layout end-to-end
    (README.md:162-219): metrics.yml experiment_{0,1} blocks,
    aggregated_metrics.yml mean+-std, params.yml, obj.pkl, plots/*.png."""
    parent = tmp_path / "mvsa_root"
    parent.mkdir()
    _make_mvsa(parent)
    logs = str(tmp_path / "logs")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["VARIANTS"] = "bert"
    env["EXTRA_FLAGS"] = (
        "--debug_tiny --num_train_epochs 1 --early_stopping_patience 0 "
        f"--train_batch_size 4 --eval_batch_size 4 --experiment_root {logs}")
    res = subprocess.run(
        ["bash", "scripts/test-results.sh", "-m", str(parent), "-r", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])

    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCMVSA"))
    assert len(run_dirs) == 1
    d = os.path.join(logs, "VaultTMSCMVSA", run_dirs[0])
    for fname in ("metrics.yml", "aggregated_metrics.yml", "params.yml",
                  "obj.pkl"):
        assert os.path.exists(os.path.join(d, fname)), fname
    with open(os.path.join(d, "metrics.yml")) as f:
        metrics = yaml.safe_load(f)
    assert "experiment_0" in metrics and "experiment_1" in metrics
    with open(os.path.join(d, "aggregated_metrics.yml")) as f:
        agg = yaml.safe_load(f)
    assert any("+-" in str(v) for v in agg[""].values())
    plots = os.listdir(os.path.join(d, "plots"))
    assert any(p.endswith(".png") for p in plots)


def test_clsf_vault_offline_entity_linking_e2e(tmp_path):
    """Offline entity-linking e2e (vault/entity_linking.py:93-148 contract
    without egress): synthetic wiki store -> CLI builds the JSON cache from
    the dataset's targets -> entity tokens join the tokenizer with max-pool
    embeddings -> the training step runs."""
    import json

    data_dir = _make_twitter(tmp_path)
    logs = str(tmp_path / "logs")
    store = tmp_path / "wiki_store.json"
    store.write_text(json.dumps({
        "aliases": {"target 0": [["Target_Zero", 0.9]],
                    "target 1": [["Target_One", 0.05]]},
        "descriptions": {"Target_Zero": "a tweet about stuff",
                         "Target_One": "another thing"},
    }))
    cache = tmp_path / "entities.json"  # does NOT exist yet
    res = _run([sys.executable, "experiments/clsf_vault.py", "Twitter201X",
                "--dir", data_dir, "--train_split", "train",
                "--bert_model_name_or_path", "bert-base-uncased",
                "--debug_tiny", "--num_train_epochs", "1",
                "--train_batch_size", "4", "--experiment_root", logs,
                "--entity_cache", str(cache), "--wiki_store", str(store),
                "--entity_threshold", "0.1"])
    assert res.returncode == 0, res.stderr[-3000:]
    built = json.loads(cache.read_text())
    assert built["target 0"] == ["Target_Zero", "a tweet about stuff"]
    assert built["target 1"] == ["Target_One", None]  # below threshold
    assert built["target 2"] == [None, None]          # not in store


def _script_env(logs):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["EXTRA_FLAGS"] = (
        "--debug_tiny --num_train_epochs 1 "
        f"--train_batch_size 4 --eval_batch_size 4 --experiment_root {logs}")
    return env


def test_toms_script_rehearsal(tmp_path):
    """scripts/toms.sh (TomVAuLT vs TomViLT recipe) end-to-end on synthetic
    twitter data with tiny geometry: both variant runs must log."""
    parent = tmp_path / "twitter_root"
    parent.mkdir()
    _make_twitter(parent)  # creates parent/twitter2015 (+images)
    logs = str(tmp_path / "logs")
    res = subprocess.run(
        ["bash", "scripts/toms.sh", "-t", str(parent), "-r", "1"],
        cwd=REPO, env=_script_env(logs), capture_output=True, text=True,
        timeout=900)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])
    run_dirs = os.listdir(os.path.join(logs, "TomViLTTMSC"))
    assert len(run_dirs) == 2  # --use_tweet_bert and plain ViLT variants


def test_clsf_vault_multihost_cli(tmp_path):
    """User-facing multi-host launch (README 'Multi-host (DCN)'): the SAME
    clsf_vault.py command on two processes with --coordinator_address /
    --num_processes / --process_id must train over one global 4-device mesh
    and write exactly ONE experiment log (process 0 only)."""
    import socket

    root = _make_mvsa(tmp_path)
    logs = str(tmp_path / "logs")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    cmd = [sys.executable, "experiments/clsf_vault.py", "MVSA",
           "--root_dir", root, "--preprocessed",
           "--train_split", "train", "--test_split", "test",
           "--debug_tiny", "--num_train_epochs", "1",
           "--train_batch_size", "4", "--eval_batch_size", "4",
           "--disable_tqdm", "--experiment_root", logs,
           "--coordinator_address", f"localhost:{port}",
           "--num_processes", "2"]
    outlogs = [open(tmp_path / f"cli{i}.log", "w+") for i in range(2)]
    procs = [subprocess.Popen(cmd + ["--process_id", str(i)], cwd=REPO,
                              env=env, stdout=outlogs[i],
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, f) in enumerate(zip(procs, outlogs)):
        f.seek(0)
        out = f.read()
        f.close()
        assert p.returncode == 0, f"process {i}:\n{out[-3000:]}"
    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCMVSA"))
    assert len(run_dirs) == 1  # one global run, written once (process 0)
    with open(os.path.join(logs, "VaultTMSCMVSA", run_dirs[0],
                           "metrics.yml")) as f:
        metrics = yaml.safe_load(f)
    assert metrics["experiment_0"]["train_loss"]  # the loop really ran


def test_frozen_lms_script_rehearsal(tmp_path):
    """scripts/frozen-lms.sh Bloomberg legs (bert + bertweet frozen-LM
    ablation) end-to-end on synthetic data."""
    root = _make_bloomberg(tmp_path)
    logs = str(tmp_path / "logs")
    env = _script_env(logs)
    # tiny geometry also needs tiny split sizes for the 24-row synthetic csv
    env["EXTRA_FLAGS"] += " --dev_size 4 --test_size 4"
    res = subprocess.run(
        ["bash", "scripts/frozen-lms.sh", "-b", root, "-r", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])
    run_dirs = os.listdir(os.path.join(logs, "VaultTMSCBloomberg"))
    assert len(run_dirs) == 2  # bert-base and bertweet variants


def test_tmsc_tombert_rejects_merge_to(tmp_path):
    """--merge_to must be rejected, not silently ignored: the TomBERT/
    TomViLT families have no ViLT patch-token path, so accepting the flag
    would let a user believe they trained with ToMe merging."""
    data_dir = _make_twitter(tmp_path)
    res = _run([sys.executable, "experiments/tmsc_tombert.py", "TomBERT",
                "--dir", data_dir, "--train_split", "train",
                "--merge_to", "87"], timeout=120)
    assert res.returncode != 0
    assert "--merge_to is not supported" in res.stderr
