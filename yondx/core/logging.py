"""Timestamped tee-to-file logging (reference `log`, utils/utils.py:85-98)."""
from __future__ import annotations

import os
import time
from typing import Optional

_DEFAULT_LOGFILE: Optional[str] = None


def set_logfile(path: Optional[str]) -> None:
    global _DEFAULT_LOGFILE
    _DEFAULT_LOGFILE = path
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


def log(msg: str, logfile: Optional[str] = None, notime: bool = False) -> None:
    """Print a timestamped line and append it to the active log file."""
    line = msg if notime else f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}"
    print(line, flush=True)
    path = logfile or _DEFAULT_LOGFILE
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(line + "\n")


def timestamp(points: list, idx: int) -> float:
    """Stage timer: record now at points[idx], return delta from idx-1.

    Mirrors the reference's %-breakdown UX in the train loop
    (trainer_AWGN.py:87-134).
    """
    points[idx] = time.time()
    return points[idx] - points[idx - 1]
