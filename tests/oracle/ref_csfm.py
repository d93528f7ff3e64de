"""Oracle seed locator: brute-force substring search over the MSA
concat string, replacing the production FM-index entirely.

Builds its own concatenated encoded text + concat->consensus map from
the raw MSA characters exactly like the reference's buildConcatSeq
(/root/reference/src/CSFMIndex.cpp:287-325), finds pattern occurrences
by direct scanning (no suffix array, no BWT, no rank structures), and
resolves the deterministic occurrence choice — the production
locate_one(rng=None) picks SA row `s`, i.e. the occurrence whose suffix
is lexicographically smallest — by literally comparing text suffixes.
CSLoc extraction transcribes extractCS (CSFMIndex.cpp:262-273).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# own DNA encode map (reference DNA.cpp:32-48: symbols ACGT,
# degenerates U->T, N->first expansion char A); gaps "-._"
_GAPS = set("-._")
_ENC1 = {"A": 1, "C": 2, "G": 3, "T": 4, "U": 4, "N": 1}


@dataclass
class OracleCSLoc:
    start: int     # 1-based consensus start
    end: int       # 1-based consensus end
    CS: str        # gapped consensus-coordinate string

    def is_valid(self) -> bool:
        """Literal CSLoc::isValid (CSLoc.h:36-38)."""
        return (self.start > 0 and self.start < self.end
                and len(self.CS) > self.end - self.start)


class RefLocator:
    def __init__(self, msa):
        """Build concat text + concat2CS from msa.chars (raw bytes)."""
        N, L = msa.chars.shape
        concat = bytearray()
        concat2cs: list[int] = []
        for i in range(N):
            row = msa.chars[i].tobytes().decode("latin-1")
            for j, c in enumerate(row):
                cu = c.upper()
                if cu in _GAPS or c in _GAPS:
                    continue
                concat.append(_ENC1.get(cu, 0))
                concat2cs.append(j + 1)
            concat.append(0)             # separator after each seq
            concat2cs.append(0)
        concat.append(0)                 # null terminal
        concat2cs.append(0)
        self.text = bytes(concat)
        self.concat2cs = concat2cs
        self.gap_ch = "-"

    def _encode_pattern(self, pattern: str) -> bytes | None:
        out = bytearray()
        for c in pattern.upper():
            k = _ENC1.get(c, 0 if c not in _GAPS else 255)
            out.append(k)
        return bytes(out)

    def locate_one(self, pattern: str) -> OracleCSLoc | None:
        """First-in-suffix-order occurrence of the pattern, or None."""
        if not pattern:
            return None
        pat = self._encode_pattern(pattern)
        # collect every occurrence position
        occ = []
        pos = self.text.find(pat)
        while pos != -1:
            occ.append(pos)
            pos = self.text.find(pat, pos + 1)
        if not occ:
            return None
        # production locate_one(rng=None) = SA interval start = the
        # occurrence whose suffix is lexicographically smallest
        start = min(occ, key=lambda p: self.text[p:])
        return self._extract_cs(start, pattern)

    def _extract_cs(self, start: int, pattern: str) -> OracleCSLoc:
        """Literal extractCS (CSFMIndex.cpp:262-273)."""
        c2 = self.concat2cs
        plen = len(pattern)
        cs: list[str] = []
        for i in range(start, start + plen):
            if i > start and c2[i] - c2[i - 1] > 1:
                cs.append(self.gap_ch * (c2[i] - c2[i - 1] - 1))
            cs.append(pattern[i - start])
        return OracleCSLoc(c2[start], c2[start + plen - 1], "".join(cs))
