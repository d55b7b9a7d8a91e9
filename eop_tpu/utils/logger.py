"""Logging setup: rank-0-only sinks + stdout/stderr capture.

Parity target: `/root/reference/yolox/utils/logger.py:27-96` (loguru-based;
loguru is not in this image, so this uses stdlib logging with the same
behavior: file + stderr sinks on rank 0 only, and a redirector that folds
third-party ``print`` output into the log stream).
"""

from __future__ import annotations

import inspect
import logging
import os
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s:%(lineno)d - %(message)s"

logger = logging.getLogger("eop_tpu")


def get_caller_name(depth: int = 0):
    """Module name of the caller ``depth`` frames up (ref `:14-24`)."""
    frame = inspect.currentframe().f_back
    for _ in range(depth):
        if frame.f_back is None:
            break
        frame = frame.f_back
    return frame.f_globals.get("__name__", "?")


class StreamToLogger:
    """File-like object redirecting writes into a logger (ref `:27-53`)."""

    def __init__(self, log: logging.Logger, level=logging.INFO):
        self.logger = log
        self.level = level
        self.linebuf = ""

    def write(self, buf):
        for line in buf.rstrip().splitlines():
            self.logger.log(self.level, line.rstrip())

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
            os.makedirs(save_dir, exist_ok=True)
            save_file = os.path.join(save_dir, filename)
            if mode == "o" and os.path.exists(save_file):
                os.remove(save_file)
            fh = logging.FileHandler(save_file)
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
