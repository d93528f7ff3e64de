"""Global constants shared across the framework.

reference: src/HmmUFOtuConst.h (file suffixes), src/PhyloTreeUnrooted.cpp:68-71
(numeric scaling / convergence constants).
"""

import math

inf = math.inf
nan = math.nan

# database file suffixes; we use our own npz-based container plus the
# HMMER3/f text profile (kept text for interop, same as the reference)
MSA_FILE_SUFFIX = ".msa"
CSFM_FILE_SUFFIX = ".csfm"
HMM_FILE_SUFFIX = ".hmm"
PHYLOTREE_FILE_SUFFIX = ".ptu"
# suffix for the single-file TPU database container
TPU_DB_SUFFIX = ".tpudb.npz"

GZIP_FILE_SUFFIX = ".gz"
BZIP2_FILE_SUFFIX = ".bz2"

# numeric scaling for log-likelihood accumulation, reference uses
# DBL_MIN_EXP / 2 (= -510.5); we keep the f64 value for host math and a
# float32-appropriate value for device math (FLT_MIN_EXP / 2 = -62.5)
MIN_LOGLIK_EXP_F64 = -1021.0 / 2.0
MIN_LOGLIK_EXP_F32 = -125.0 / 2.0

INVALID_LOGLIK = 1.0       # flag for un-evaluated loglik entries
LOGLIK_REL_EPS = 1e-6
BRANCH_EPS = 1e-5          # branch-length convergence (reference :71)
MAX_ITER_BRANCH = 100      # max Felsenstein fixed-point iterations

# infV stands for -inf log-likelihood (reference HmmUFOtuDef.h)
infV = -math.inf
