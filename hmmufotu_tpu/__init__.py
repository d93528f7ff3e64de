"""HmmUFOtu-TPU: a TPU-native 16S/amplicon taxonomic-assignment engine.

A from-scratch reimplementation of the capabilities of Grice-Lab/HmmUFOtu
(CSFM-index seeded banded profile-HMM alignment + SEP phylogenetic placement),
designed TPU-first: JAX/XLA/Pallas for the compute path (batched banded
Viterbi DP, vectorized Felsenstein pruning, vmapped SEP placement), and a
host-side runtime (FM-index, IO, tree flattening) in Python/numpy + C++.

Reference behavior parity targets are cited throughout as
``reference: <file>:<line>`` pointing into the upstream C++ code base.
"""

__version__ = "0.1.0"
PROG_NAME = "HmmUFOtu-TPU"

from . import constants  # noqa: F401
