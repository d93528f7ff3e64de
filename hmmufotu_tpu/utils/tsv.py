"""Header-aware TSV reader (reference: src/util/TSVScanner.h:22-80).

Skips '#'-prefixed comment lines, uses the first non-comment line as the
header, and yields dict-like records.
"""

from __future__ import annotations

import os
from ..seq import open_maybe_compressed


class TSVRecord:
    __slots__ = ("_fields", "_index")

    def __init__(self, fields, index):
        self._fields = fields
        self._index = index

    def __getitem__(self, key):
        if isinstance(key, int):
            return self._fields[key]
        return self._fields[self._index[key]]

    def get(self, key, default=""):
        try:
            return self[key]
        except (KeyError, IndexError):
            return default


class TSVReader:
    def __init__(self, source):
        self._close = False
        if isinstance(source, (str, os.PathLike)):
            self.fh = open_maybe_compressed(os.fspath(source), "rt")
            self._close = True
        else:
            self.fh = source
        self.header: list[str] = []
        self._index: dict[str, int] = {}
        for line in self.fh:
            if line.startswith("#") or not line.strip():
                continue
            self.header = line.rstrip("\n").split("\t")
            self._index = {h: i for i, h in enumerate(self.header)}
            break

    def __iter__(self):
        for line in self.fh:
            if line.startswith("#") or not line.strip():
                continue
            yield TSVRecord(line.rstrip("\n").split("\t"), self._index)
        if self._close:
            self.fh.close()
