"""Database container: the 4-artifact DB tying all layers together.

reference: the <db>.msa/.csfm/.hmm/.ptu files sharing a prefix
(src/HmmUFOtuConst.h suffix constants; loaded in src/hmmufotu.cpp:
445-494).  File formats here are npz containers (MSA/CSFM/PTU) plus
the HMMER3/f text profile; every npz embeds a format string checked on
load (the ProgInfo header equivalent, util/ProgEnv.cpp:18-57).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from .hmm import ProfileHMM
from .index import CSFMIndex
from .msa import MSA
from .phylo import PTUnrooted

MSA_SUFFIX = ".msa.npz"
CSFM_SUFFIX = ".csfm.npz"
HMM_SUFFIX = ".hmm"
PTU_SUFFIX = ".ptu.npz"


@dataclass
class Database:
    msa: MSA
    csfm: CSFMIndex
    hmm: ProfileHMM
    ptu: PTUnrooted

    @classmethod
    def load(cls, prefix: str) -> "Database":
        for suf in (MSA_SUFFIX, CSFM_SUFFIX, HMM_SUFFIX, PTU_SUFFIX):
            if not os.path.exists(prefix + suf):
                raise FileNotFoundError(
                    f"database file '{prefix + suf}' not found")
        msa = MSA.load(prefix + MSA_SUFFIX)
        csfm = CSFMIndex.load(prefix + CSFM_SUFFIX)
        hmm = ProfileHMM.from_hmmer_file(prefix + HMM_SUFFIX)
        ptu = PTUnrooted.load(prefix + PTU_SUFFIX)
        return cls(msa, csfm, hmm, ptu)

    def save(self, prefix: str):
        self.msa.save(prefix + MSA_SUFFIX)
        self.csfm.save(prefix + CSFM_SUFFIX)
        self.hmm.to_hmmer_file(prefix + HMM_SUFFIX)
        self.ptu.save(prefix + PTU_SUFFIX)
