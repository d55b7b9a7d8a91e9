"""Exp loading by file path or by name.

Parity target: `/root/reference/yolox/exp/build.py:10-42` (file-path import
of a module exposing ``Exp``) and the name registry resolving "yolox-s"
etc. to `exps/default/*` (the reference routes through a meta-path finder,
`yolox/exp/default/__init__.py:11-28`; here a plain directory lookup).
"""

from __future__ import annotations

import importlib
import os
import sys


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))


def get_exp_by_file(exp_file: str):
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(exp_file)))
        module_name = os.path.basename(exp_file).split(".")[0]
        if module_name in sys.modules:
            current_exp = importlib.reload(sys.modules[module_name])
        else:
            current_exp = importlib.import_module(module_name)
        return current_exp.Exp()
    except Exception as e:
        raise ImportError(
            f"{exp_file} doesn't contain a class named 'Exp': {e}"
        )


def get_exp_by_name(exp_name: str):
    exp = exp_name.replace("-", "_")  # "yolox-s" -> "yolox_s"
    exp_path = os.path.join(_repo_root(), "exps", "default", exp + ".py")
    if not os.path.exists(exp_path):
        raise ValueError(f"unknown exp name {exp_name!r} ({exp_path})")
    return get_exp_by_file(exp_path)


def get_exp(exp_file=None, exp_name=None):
    """Exp by file (priority) or by name (ref `get_exp:27-42`)."""
    assert exp_file is not None or exp_name is not None, (
        "plz provide exp file or exp name."
    )
    if exp_file is not None:
        return get_exp_by_file(exp_file)
    return get_exp_by_name(exp_name)
