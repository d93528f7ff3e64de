"""Leveled stderr loggers (reference: src/util/ProgLog.h:40-70).

Default level is WARNING; each -v on a CLI raises the level by one.
"""

from __future__ import annotations

import sys
import time

ERROR, WARNING, INFO, DEBUG = 0, 1, 2, 3

_level = WARNING


def set_level(level: int):
    global _level
    _level = level


def get_level() -> int:
    return _level


def increase_level(n: int = 1):
    global _level
    _level += n


def _log(level: int, *msg):
    if _level >= level:
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        print(ts, *msg, file=sys.stderr, flush=True)


def error_log(*msg):
    _log(ERROR, *msg)


def warning_log(*msg):
    _log(WARNING, *msg)


def info_log(*msg):
    _log(INFO, *msg)


def debug_log(*msg):
    _log(DEBUG, *msg)
