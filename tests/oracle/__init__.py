"""Independent f64 parity oracle.

Test-only sequential numpy transcriptions of the reference
(Grice-Lab/HmmUFOtu) algorithms, sharing NO code with the production
package (hmmufotu_tpu).  The oracle consumes only trained model DATA
(HMM parameter tables, tree messages, substitution-model parameters,
the MSA) and re-implements every algorithm on the read path literally
from the reference sources:

- banded/full Viterbi DP, traceback, global alignment
  (/root/reference/src/BandedHMMP7.cpp:640-1186)
- FM-index seed location by brute-force string search + suffix
  lexicographic order (equivalent oracle for CSFMIndex.cpp:43-273)
- SEP placement: getSeed/estimateSeq/filterPlacements/placeSeq/
  calcQValues (/root/reference/src/HmmUFOtu_main.cpp:127-216,
  PhyloTreeUnrooted.cpp:721-954)
- substitution models' closed-form P(v)
  (/root/reference/src/{JC69,K80,F81,HKY85,TN93,GTR}.h)
"""

from .ref_model import RefModel
from .ref_hmm import RefHmm, oracle_align_seq
from .ref_csfm import RefLocator
from .ref_phylo import (oracle_get_seed, oracle_estimate_seq,
                        oracle_filter_placements, oracle_place_seq,
                        oracle_calc_q_values, oracle_assign_read)
