"""Installability (VERDICT r4 item 8) + CPU-keyed compile cache (item 7)."""

import os
import re

import pytest


def test_console_entry_points_declared_and_loadable():
    """pyproject declares the six CLI entry points; each resolves to a
    callable without repo-root sys.path tricks (requires `pip install -e .`,
    done in this image)."""
    from importlib.metadata import entry_points

    want = {
        "eop-train": "train",
        "eop-train-24p": "train_24p",
        "eop-eval": "eval",
        "eop-serve": "serve",
        "eop-demo-featuremap": "demo_featuremap",
        "eop-show-24p": "show_24p",
    }
    eps = {e.name: e for e in entry_points(group="console_scripts")}
    missing = set(want) - set(eps)
    if missing == set(want):
        pytest.skip("eop-tpu not pip-installed in this environment")
    assert not missing, f"missing entry points: {missing}"
    for name in want:
        fn = eps[name].load()
        assert callable(fn), name


def test_package_importable_without_repo_cwd(tmp_path):
    """`import eop_tpu` works from an arbitrary cwd (editable install)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c", "import eop_tpu; print(eop_tpu.__version__)"],
        cwd=tmp_path, capture_output=True, text=True,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    if r.returncode != 0 and "No module named" in r.stderr:
        pytest.skip("eop-tpu not pip-installed in this environment")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "0.1.0"


def test_cpu_cache_key_stable_and_applied():
    from eop_tpu.utils.setup_env import cpu_cache_key, enable_compile_cache

    k1, k2 = cpu_cache_key(), cpu_cache_key()
    assert k1 == k2
    assert re.fullmatch(r"[0-9a-f]{12}", k1)

    import jax

    before = jax.config.jax_compilation_cache_dir
    try:
        d = enable_compile_cache("/tmp/eop_cache_test", per_cpu=True)
        assert d == f"/tmp/eop_cache_test/cpu-{k1}"
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
