"""Logging setup: rank-0-only sinks + stdout/stderr capture.

Parity target: `/root/reference/yolox/utils/logger.py:27-96` (loguru-based;
loguru is not in this image, so this uses stdlib logging with the same
behavior: file + stderr sinks on rank 0 only, and a redirector that folds
third-party ``print`` output into the log stream).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s:%(lineno)d - %(message)s"

logger = logging.getLogger("eop_tpu")


class StreamToLogger:
    """File-like object redirecting writes into a logger (ref `:27-53`)."""

    def __init__(self, log: logging.Logger, level=logging.INFO):
        self.logger = log
        self.level = level
        self.linebuf = ""

    def write(self, buf):
        for line in filter(None, map(str.rstrip, buf.splitlines())):
            self.logger.log(self.level, line)

    def flush(self):
        pass

    def isatty(self):
        return False


def redirect_sys_output(log_level=logging.INFO):
    """Capture raw print output (e.g. eval tables) into the logger
    (ref `redirect_sys_output:56-60`)."""
    redirect = StreamToLogger(logger, log_level)
    sys.stderr = redirect
    sys.stdout = redirect


def setup_logger(save_dir=None, distributed_rank: int = 0,
                 filename: str = "log.txt", mode: str = "a",
                 redirect: bool = False):
    """Rank-0 file+stderr sinks (ref `setup_logger:63-96`).

    Non-zero ranks keep a WARNING-level stderr handler (the reference
    silences them entirely, but a host that crashes or diverges must not
    fail blind in multi-host runs)."""
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid double prints via the root logger
    logger.handlers.clear()
    if distributed_rank != 0:
        sh = logging.StreamHandler(sys.__stderr__)
        sh.setLevel(logging.WARNING)
        sh.setFormatter(logging.Formatter(
            f"[rank {distributed_rank}] " + _FORMAT
        ))
        logger.addHandler(sh)
    if distributed_rank == 0:
        sh = logging.StreamHandler(sys.__stderr__)
        sh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(sh)
        if save_dir:
            log_path = Path(save_dir) / filename
            log_path.parent.mkdir(parents=True, exist_ok=True)
            if mode == "o":
                log_path.unlink(missing_ok=True)
            fh = logging.FileHandler(log_path)
            fh.setFormatter(logging.Formatter(_FORMAT))
            logger.addHandler(fh)
    if redirect and distributed_rank == 0:
        redirect_sys_output()
    return logger


def catch(fn):
    """Decorator logging uncaught exceptions with traceback before
    re-raising (the reference decorates its mains with ``@logger.catch``,
    e.g. `yolox_24p/train_24p.py:203`)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            logger.exception("uncaught exception in %s", fn.__name__)
            raise

    return wrapper
