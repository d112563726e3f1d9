"""Logging setup (reference surface: detectron2/utils/logger.py:39).

Colored console formatter, per-process log files (``log.txt.rank{k}`` when running
multi-process JAX), and log_first_n / log_every_n helpers.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
from collections import Counter

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


class _ColorFormatter(logging.Formatter):
    GREY = "\x1b[38;20m"
    YELLOW = "\x1b[33;20m"
    RED = "\x1b[31;20m"
    RESET = "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        if record.levelno == logging.WARNING:
            return self.YELLOW + "WARNING " + self.RESET + msg
        if record.levelno in (logging.ERROR, logging.CRITICAL):
            return self.RED + "ERROR " + self.RESET + msg
        return msg


@functools.lru_cache()
def setup_logger(output: str | None = None, *, name: str = "vnext_tpu",
                 process_rank: int = 0, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger

    fmt = "[%(asctime)s %(name)s]: %(message)s"
    datefmt = "%m/%d %H:%M:%S"

    if process_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(level)
        ch.setFormatter(_ColorFormatter(fmt, datefmt=datefmt))
        logger.addHandler(ch)

    if output is not None:
        filename = os.path.join(output, "log.txt")
        if process_rank > 0:
            filename = f"{filename}.rank{process_rank}"
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(level)
        fh.setFormatter(logging.Formatter(fmt, datefmt=datefmt))
        logger.addHandler(fh)
    return logger


def log_first_n(level: int, msg: str, n: int = 1, *, name: str = "vnext_tpu", key: str = "caller") -> None:
    caller_key = (msg if key == "message" else _find_caller(), msg if key == "caller" else "")
    _LOG_COUNTER[caller_key] += 1
    if _LOG_COUNTER[caller_key] <= n:
        logging.getLogger(name).log(level, msg)


def log_every_n(level: int, msg: str, n: int = 1, *, name: str = "vnext_tpu") -> None:
    caller_key = _find_caller()
    _LOG_COUNTER[caller_key] += 1
    if (_LOG_COUNTER[caller_key] - 1) % n == 0:
        logging.getLogger(name).log(level, msg)


def log_every_n_seconds(level: int, msg: str, n: int = 1, *, name: str = "vnext_tpu") -> None:
    caller_key = _find_caller()
    now = time.time()
    last = _LOG_TIMER.get(caller_key)
    if last is None or now - last >= n:
        logging.getLogger(name).log(level, msg)
        _LOG_TIMER[caller_key] = now


def _find_caller():
    frame = sys._getframe(2)
    while frame:
        code = frame.f_code
        if os.path.join("utils", "logger.") not in code.co_filename:
            return (code.co_filename, frame.f_lineno, code.co_name)
        frame = frame.f_back
    return ("unknown", 0, "unknown")
