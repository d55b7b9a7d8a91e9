"""CLI entry-point scripts.

Run in place (``python tools/train.py ...``) or, after ``pip install -e .``,
via the console scripts declared in ``pyproject.toml`` (``eop-train``,
``eop-train-24p``, ``eop-eval``, ``eop-serve``, ``eop-demo-featuremap``,
``eop-show-24p``) — the directory installs under the package name
``eop_tools``.
"""
