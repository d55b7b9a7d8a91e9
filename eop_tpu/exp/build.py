"""Exp loading by file path or by name.

Capability parity with `/root/reference/yolox/exp/build.py:10-42` (file-path
import of a module exposing ``Exp``, plus name resolution of "yolox-s" etc.
to `exps/default/*`).  Config modules load through
``importlib.util.spec_from_file_location`` — no ``sys.path`` mangling (the
reference prepends the config's directory and imports by bare module name,
which can shadow unrelated modules).
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path


def config_name(config_file: str) -> str:
    """Experiment name derived from a config file's stem
    (``.../yolox_s.py`` -> ``"yolox_s"``)."""
    return Path(config_file).stem


def _default_exp_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "exps" / "default"


def get_exp_by_file(exp_file: str):
    path = Path(exp_file).resolve()
    module_name = f"_eop_exp_{path.stem}"
    spec = importlib.util.spec_from_file_location(module_name, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load exp config from {exp_file!r}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    try:
        spec.loader.exec_module(module)
        exp_cls = module.Exp
    except Exception as e:
        raise ImportError(
            f"{exp_file} doesn't contain a class named 'Exp': {e}"
        )
    return exp_cls()


def get_exp_by_name(exp_name: str):
    stem = exp_name.replace("-", "_")  # "yolox-s" -> "yolox_s"
    path = _default_exp_dir() / f"{stem}.py"
    if not path.exists():
        raise ValueError(f"unknown exp name {exp_name!r} ({path})")
    return get_exp_by_file(os.fspath(path))


def get_exp(exp_file=None, exp_name=None):
    """Exp by file (priority) or by name (ref `get_exp:27-42`)."""
    assert exp_file is not None or exp_name is not None, (
        "plz provide exp file or exp name."
    )
    return (
        get_exp_by_file(exp_file)
        if exp_file is not None
        else get_exp_by_name(exp_name)
    )
