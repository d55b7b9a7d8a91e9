"""Import plumbing: ``eop_tpu.exp.default.yolox_s`` etc. resolve to the
repo-root `exps/default/*.py` files.

Parity target: the reference's meta-path finder
(`/root/reference/yolox/exp/default/__init__.py:11-28`) mapping
``yolox.exp.default.*`` onto ``exps/default/*``; a module ``__getattr__``
does the same job without a finder.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_EXPS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))),
    "exps", "default",
)


def __getattr__(name: str):
    path = os.path.join(_EXPS_DIR, name + ".py")
    if not os.path.exists(path):
        raise AttributeError(
            f"no default exp named {name!r} (looked in {_EXPS_DIR})"
        )
    full = f"{__name__}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
