"""Sanity re-measure of the DP kernel time (micro2 reported 1.5 ms,
micro1 94 ms — one of them is lying).  Forces a fresh device download
and checksums the result each iteration."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 1024


def main():
    import jax
    from bench import ensure_db, simulate_reads, DB_PREFIX
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu import pipeline as pl
    from hmmufotu_tpu.hmm.pallas_viterbi import \
        viterbi_pallas_traced_split

    ensure_db()
    db = Database.load(DB_PREFIX)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    hmm.set_sequence_mode(NGCL)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    rng = np.random.default_rng(0)
    reads = simulate_reads(tree, rng, BATCH)
    vpaths = pl.batch_find_seed_vpaths(hmm, csfm, reads, mode=NGCL,
                                       rng=rng)
    handle = aligner.dispatch_batch(reads, vpaths)
    (_, _, _, n_rows, codes, lengths, regions, _,
     score, mi, mj, choices) = handle
    jax.block_until_ready(score)

    for it in range(6):
        t0 = time.time()
        s, comb = viterbi_pallas_traced_split(
            aligner.dh, codes, lengths, regions, n_rows)
        jax.block_until_ready((s, comb))
        t1 = time.time()
        s_h = np.asarray(s)
        comb_h = np.asarray(comb)
        t2 = time.time()
        print(f"iter{it}: kernel {t1 - t0:.4f}s download "
              f"{t2 - t1:.4f}s finite {np.isfinite(s_h).mean():.3f} "
              f"comb_sum {int(comb_h.sum()) & 0xFFFFFFFF:08x}",
              flush=True)


if __name__ == "__main__":
    main()
