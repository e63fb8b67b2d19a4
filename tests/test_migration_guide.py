"""docs/MIGRATION.md cites tpu-vault symbols as `path/to/mod.py::symbol`;
this test imports every citation so the guide can't rot as code moves.
Bare-name mentions in prose aren't checked — only the :: form, which is
the load-bearing 'where do I find it now' column."""

import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUIDE = os.path.join(REPO, "docs", "MIGRATION.md")

CITES = sorted(set(re.findall(r"`([a-z_/.]+\.py)::([A-Za-z_][A-Za-z0-9_]*)`",
                              open(GUIDE).read())))


def test_guide_has_citations():
    assert len(CITES) >= 15  # the guide really was parsed


@pytest.mark.parametrize("path,symbol", CITES,
                         ids=[f"{p}::{s}" for p, s in CITES])
def test_cited_symbol_exists(path, symbol):
    mod_name = "vault_tpu." + path[:-3].replace("/", ".")
    mod = importlib.import_module(mod_name)
    assert hasattr(mod, symbol), f"{mod_name} lost {symbol}"


def test_cited_files_exist():
    """Prose also names bare files (bench.py, serve.py, scripts/*.sh);
    check every repo-relative path the guide mentions resolves."""
    text = open(GUIDE).read()
    for path in set(re.findall(
            r"`((?:docs|scripts|experiments|native|vault_tpu|tests)/"
            r"[A-Za-z0-9_/.-]+\.(?:py|sh|md|cpp))`", text)):
        assert os.path.exists(os.path.join(REPO, path)), path
