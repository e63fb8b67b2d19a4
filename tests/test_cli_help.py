"""`--help` must render for every argparse CLI. Regression: argparse expands
help strings with `help % params`, so a bare '%' in help text (e.g. the
round-5 flip-rate figures "12.5-16.7%") parses as a printf spec and raises
TypeError — scripts/serve.py --help crashed this way until the figures were
escaped as '%%'. Fast (parse_args exits before any jax work)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIS = [
    "scripts/serve.py",
    "scripts/quantize_ckpt.py",
    "experiments/clsf_vault.py",
    "experiments/tmsc_tombert.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_help_renders(cli):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    res = subprocess.run([sys.executable, cli, "--help"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, (cli, res.stderr[-2000:])
    assert "usage" in res.stdout.lower(), (cli, res.stdout[:500])
