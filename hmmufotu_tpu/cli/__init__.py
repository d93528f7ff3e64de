"""Command-line tools mirroring the reference's 13 binaries.

reference: src/hmmufotu*.cpp (src/Makefile.am:63-78).  Each tool is a
python module with a main(argv) entry; `python -m hmmufotu_tpu.cli.X`.
"""

import logging
import sys

PROG_NAME = "hmmufotu-tpu"
PROG_VERSION = "v0.1.0"


def setup_logging(verbose: int = 0):
    level = (logging.WARNING if verbose <= 0
             else logging.INFO if verbose == 1 else logging.DEBUG)
    logging.basicConfig(
        level=level, stream=sys.stderr,
        format="%(asctime)s %(levelname)s: %(message)s")


def prog_header(argv) -> str:
    """Provenance header lines embedded in text outputs (reference
    writeProgInfo + command echo, hmmufotu.cpp:590-592)."""
    return (f"# {PROG_NAME} {PROG_VERSION}\n"
            f"# command: {' '.join(argv)}\n")
