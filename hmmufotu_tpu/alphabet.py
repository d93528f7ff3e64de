"""Degenerate nucleotide alphabets with vectorized numpy encode/decode.

Semantics follow the reference DegenAlphabet/DNA/IUPACNucl classes
(reference: src/DegenAlphabet.h:43-175, src/DNA.cpp:32-48,
src/IUPACNucl.cpp): encode maps a character to 0..size-1, GAP_BASE (-2)
for gap characters "-._", or INVALID_BASE (-1) otherwise.  Degenerate
symbols encode to the code of the *first* symbol of their expansion
(e.g. DNA 'N' -> 'A' -> 0, 'U' -> 'T' -> 3).

Unlike the reference's per-char virtual calls, encoding here is a single
numpy table lookup over uint8 buffers, suitable for feeding whole read
batches to the device.
"""

from __future__ import annotations

import numpy as np

GAP_BASE = -2
INVALID_BASE = -1
DEFAULT_GAP = "-._"


class DegenAlphabet:
    """A degenerate alphabet with O(1) vectorized encode/decode tables."""

    def __init__(self, name: str, symbols: str, degen_map: dict[str, str],
                 gap: str = DEFAULT_GAP, alias: str | None = None,
                 complements: dict[str, str] | None = None):
        self.name = name
        self.alias = alias if alias is not None else name
        self.symbols = symbols
        self.degen_map = dict(degen_map)
        self.gap = gap
        self.gap_char = gap[0]

        # encode table over all 256 byte values
        tab = np.full(256, INVALID_BASE, dtype=np.int8)
        for i, s in enumerate(symbols):
            tab[ord(s)] = i
        for syn, expansion in degen_map.items():
            tab[ord(syn)] = tab[ord(expansion[0])]
        for g in gap:
            tab[ord(g)] = GAP_BASE
        self._enc = tab

        # decode table: code -> char
        self._dec = np.frombuffer(symbols.encode(), dtype=np.uint8).copy()

        # complement table (char level), identity by default
        ctab = np.arange(256, dtype=np.uint8)
        if complements:
            for a, b in complements.items():
                ctab[ord(a)] = ord(b)
                ctab[ord(a.lower())] = ord(b.lower())
        self._compl = ctab
        self.has_complement = complements is not None

        # "symbol or synonym" membership (isSymbol in the reference means
        # encode(c) >= 0, i.e. symbols *and* degenerate synonyms)
        self._is_symbol = tab >= 0

    # --- scalar helpers -------------------------------------------------
    @property
    def size(self) -> int:
        return len(self.symbols)

    def encode_char(self, c: str) -> int:
        return int(self._enc[ord(c)])

    def decode_code(self, b: int) -> str:
        if b == GAP_BASE:
            return self.gap_char
        return chr(self._dec[b])

    def is_gap_char(self, c: str) -> bool:
        return self._enc[ord(c)] == GAP_BASE

    def is_symbol_char(self, c: str) -> bool:
        return bool(self._is_symbol[ord(c)])

    # --- vectorized API -------------------------------------------------
    def encode(self, s) -> np.ndarray:
        """Encode a str / bytes / uint8 array to int8 codes."""
        buf = _as_u8(s)
        return self._enc[buf]

    def encode_upper(self, s) -> np.ndarray:
        """Encode after uppercasing ASCII letters (MSA semantics,
        reference: src/MSA.cpp:236 ::toupper before encode)."""
        buf = _as_u8(s)
        up = np.where((buf >= 97) & (buf <= 122), buf - 32, buf)
        return self._enc[up]

    def decode(self, codes: np.ndarray) -> str:
        """Decode int8 codes to a string (gaps -> gap_char)."""
        codes = np.asarray(codes)
        out = np.full(codes.shape, ord(self.gap_char), dtype=np.uint8)
        valid = codes >= 0
        out[valid] = self._dec[codes[valid]]
        return out.tobytes().decode()

    def is_symbol(self, s) -> np.ndarray:
        return self._is_symbol[_as_u8(s)]

    def is_gap(self, s) -> np.ndarray:
        return self._enc[_as_u8(s)] == GAP_BASE

    def complement(self, s) -> bytes:
        buf = _as_u8(s)
        return self._compl[buf].tobytes()

    def revcom(self, s) -> str:
        buf = _as_u8(s)
        return self._compl[buf][::-1].tobytes().decode()

    def __eq__(self, other):
        return isinstance(other, DegenAlphabet) and self.name == other.name

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"DegenAlphabet({self.name})"


def _as_u8(s) -> np.ndarray:
    if isinstance(s, str):
        return np.frombuffer(s.encode(), dtype=np.uint8)
    if isinstance(s, (bytes, bytearray)):
        return np.frombuffer(bytes(s), dtype=np.uint8)
    a = np.asarray(s)
    if a.dtype != np.uint8:
        a = a.astype(np.uint8)
    return a


# --- concrete alphabets -------------------------------------------------
_DNA_COMPL = {"A": "T", "T": "A", "C": "G", "G": "C", "U": "A", "N": "N"}

DNA = DegenAlphabet(
    "DNA", "ACGT", {"U": "T", "N": "ACGT"}, alias="DNA",
    complements=_DNA_COMPL,
)

# IUPAC nucleotide degenerate codes (reference: src/IUPACNucl.cpp)
_IUPAC_DEGEN = {
    "U": "T", "M": "AC", "R": "AG", "W": "AT", "S": "CG", "Y": "CT",
    "K": "GT", "V": "ACG", "H": "ACT", "D": "AGT", "B": "CGT", "N": "ACGT",
}
_IUPAC_COMPL = {
    "A": "T", "T": "A", "C": "G", "G": "C", "U": "A", "M": "K", "K": "M",
    "R": "Y", "Y": "R", "W": "W", "S": "S", "V": "B", "B": "V", "H": "D",
    "D": "H", "N": "N",
}

IUPACNucl = DegenAlphabet(
    "IUPACNucl", "ACGT", _IUPAC_DEGEN, alias="DNA", complements=_IUPAC_COMPL,
)

# IUPAC amino acids (reference: src/IUPACAmino.{h,cpp} — registered in
# the factory, AlphabetFactory.cpp:39, though no reference binary's
# pipeline uses it; completeness parity).  No complement (amino acids
# have none — IUPACAmino::hasComplement returns false).
IUPACAmino = DegenAlphabet(
    "IUPACAmino", "ACDEFGHIKLMNPQRSTVWY",
    {"B": "DN", "X": "ACDEFGHIKLMNPQRSTVWY", "Z": "EQ"},
    alias="AMINO",
)

_BY_NAME = {"DNA": DNA, "dna": DNA, "IUPACNucl": IUPACNucl,
            "rna": IUPACNucl,
            "protein": IUPACAmino, "IUPACAmino": IUPACAmino}


def get_alphabet(name: str) -> DegenAlphabet:
    """AlphabetFactory equivalent (reference AlphabetFactory.cpp:41-49:
    dna/rna/IUPACNucl -> nucleotide, protein/IUPACAmino -> amino)."""
    try:
        return _BY_NAME[name]
    except KeyError:
        raise ValueError(f"unknown alphabet: {name}")


def iupac_match_matrix() -> np.ndarray:
    """[256, 4] bool: does character c (IUPAC) match base b?

    Used by primer annealing (reference DegenAlphabet::isMatch,
    src/DegenAlphabet.cpp).
    """
    m = np.zeros((256, 4), dtype=bool)
    for i, s in enumerate("ACGT"):
        m[ord(s), i] = True
        m[ord(s.lower()), i] = True
    for syn, exp in _IUPAC_DEGEN.items():
        for ch in exp:
            m[ord(syn), "ACGT".index(ch)] = True
            m[ord(syn.lower()), "ACGT".index(ch)] = True
    return m
