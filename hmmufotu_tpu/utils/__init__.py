"""Host-side utilities: leveled logging, provenance headers, TSV IO.

reference: src/util/ProgLog.h:40-70 (leveled loggers), src/util/ProgEnv.h
(program info headers for outputs and DB files), src/util/TSVScanner.h
(header-aware TSV reader).
"""

from .log import (DEBUG, ERROR, INFO, WARNING, debug_log, error_log,
                  increase_level, info_log, set_level, warning_log)
from .prog import prog_string, write_prog_info
from .tsv import TSVReader

__all__ = [
    "ERROR", "WARNING", "INFO", "DEBUG",
    "error_log", "warning_log", "info_log", "debug_log",
    "set_level", "increase_level",
    "write_prog_info", "prog_string", "TSVReader",
]
