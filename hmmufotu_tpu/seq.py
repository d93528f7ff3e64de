"""Primary sequences and streaming FASTA/FASTQ IO.

reference: src/PrimarySeq.h:49 (seq + id/desc/qual, revcom, trunc, subseq),
src/SeqIO.h:45-185 (streaming reader/writer with gzip support),
src/SeqUtils.cpp:103-110 (file format guessing).
"""

from __future__ import annotations

import bz2
import gzip
import io
import os
from dataclasses import dataclass, field

import numpy as np

from .alphabet import DNA, DegenAlphabet

FASTA_EXTS = (".fasta", ".fas", ".fa", ".fna")
FASTQ_EXTS = (".fastq", ".fq")


@dataclass
class PrimarySeq:
    """A raw sequence with id/description and optional quality string."""

    id: str = ""
    seq: str = ""
    desc: str = ""
    qual: str = ""
    abc: DegenAlphabet = field(default=DNA, repr=False)

    def __len__(self):
        return len(self.seq)

    def length(self):
        return len(self.seq)

    def revcom(self) -> "PrimarySeq":
        return PrimarySeq(self.id, self.abc.revcom(self.seq), self.desc,
                          self.qual[::-1], self.abc)

    def subseq(self, start: int, n: int) -> str:
        return self.seq[start:start + n]

    def trunc(self, start: int, n: int) -> "PrimarySeq":
        q = self.qual[start:start + n] if self.qual else ""
        return PrimarySeq(self.id, self.seq[start:start + n], self.desc, q,
                          self.abc)

    def remove_gaps(self) -> "PrimarySeq":
        gaps = set(self.abc.gap)
        return PrimarySeq(self.id,
                          "".join(c for c in self.seq if c not in gaps),
                          self.desc, self.qual, self.abc)

    def encoded(self) -> np.ndarray:
        """int8 codes (uppercased first, invalid -> -1, gap -> -2)."""
        return self.abc.encode_upper(self.seq)


def guess_seq_format(path: str) -> str:
    """Guess 'fasta'/'fastq' from the (decompression-stripped) extension."""
    p = path
    for z in (".gz", ".bz2"):
        if p.endswith(z):
            p = p[: -len(z)]
    ext = os.path.splitext(p)[1].lower()
    if ext in FASTA_EXTS:
        return "fasta"
    if ext in FASTQ_EXTS:
        return "fastq"
    return ""


def open_maybe_compressed(path: str, mode: str = "rt"):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    if path.endswith(".bz2"):
        return bz2.open(path, mode)
    return open(path, mode)


def read_seqs(source, fmt: str = "", abc: DegenAlphabet = DNA):
    """Stream PrimarySeq records from a path or text stream.

    Equivalent of SeqIO::hasNext()/nextSeq() (reference: src/SeqIO.cpp:75-130).
    """
    close = False
    if isinstance(source, (str, os.PathLike)):
        path = os.fspath(source)
        if not fmt:
            fmt = guess_seq_format(path)
        fh = open_maybe_compressed(path, "rt")
        close = True
    else:
        fh = source
    if fmt not in ("fasta", "fastq"):
        raise ValueError(f"unsupported sequence format {fmt!r}")
    try:
        if fmt == "fasta":
            yield from _read_fasta(fh, abc)
        else:
            yield from _read_fastq(fh, abc)
    finally:
        if close:
            fh.close()


def _split_header(line: str):
    parts = line.split(None, 1)
    sid = parts[0] if parts else ""
    desc = parts[1].rstrip("\n") if len(parts) > 1 else ""
    return sid, desc


def _read_fasta(fh, abc):
    sid = desc = None
    chunks: list[str] = []
    for line in fh:
        if line.startswith(">"):
            if sid is not None:
                yield PrimarySeq(sid, "".join(chunks), desc, "", abc)
            sid, desc = _split_header(line[1:])
            chunks = []
        elif sid is not None:
            chunks.append(line.strip())
    if sid is not None:
        yield PrimarySeq(sid, "".join(chunks), desc, "", abc)


def _read_fastq(fh, abc):
    while True:
        h = fh.readline()
        if not h:
            return
        h = h.strip()
        if not h:
            continue
        if not h.startswith("@"):
            raise ValueError(f"malformed FASTQ header: {h!r}")
        sid, desc = _split_header(h[1:])
        seq = fh.readline().strip()
        plus = fh.readline()
        if not plus.startswith("+"):
            raise ValueError("malformed FASTQ record (missing '+')")
        qual = fh.readline().strip()
        yield PrimarySeq(sid, seq, desc, qual, abc)


class SeqWriter:
    """Streaming FASTA/FASTQ writer (reference SeqIO::writeSeq)."""

    def __init__(self, dest, fmt: str = "fasta"):
        self._close = False
        if isinstance(dest, (str, os.PathLike)):
            self.fh = open_maybe_compressed(os.fspath(dest), "wt")
            self._close = True
        else:
            self.fh = dest
        if fmt not in ("fasta", "fastq"):
            raise ValueError(f"unsupported sequence format {fmt!r}")
        self.fmt = fmt

    def write(self, rec: PrimarySeq):
        if self.fmt == "fasta":
            hdr = f">{rec.id}"
            if rec.desc:
                hdr += f" {rec.desc}"
            self.fh.write(hdr + "\n")
            self.fh.write(rec.seq + "\n")
        else:
            hdr = f"@{rec.id}"
            if rec.desc:
                hdr += f" {rec.desc}"
            qual = rec.qual if rec.qual else "I" * len(rec.seq)
            self.fh.write(f"{hdr}\n{rec.seq}\n+\n{qual}\n")

    def close(self):
        if self._close:
            self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
