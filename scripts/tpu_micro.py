"""Micro-timing of the two device hot kernels on the real chip.

Times, separately and with block_until_ready:
  * the fused banded-Viterbi Pallas kernel (viterbi_pallas_traced)
    and its combined result download
  * the full device placement (place_batch_device) at several
    placement windows W (the SEP kernel's work is proportional to the
    padded window width)

so BASELINE.md's roofline can attribute the device second between the
DP and SEP stages, and quantify what a narrower window would buy.

Run on the chip (one TPU process at a time!):
    python scripts/tpu_micro.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench", "jaxcache"))

BATCH = 1024


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    from bench import ensure_db, simulate_reads, DB_PREFIX
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu import pipeline as pl
    from hmmufotu_tpu.pipeline import _aln_windows
    from hmmufotu_tpu.phylo.placement import DevicePlacer

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
    alns = aligner.finalize_batch(handle)

    # ---- DP kernel alone -------------------------------------------------
    from hmmufotu_tpu.hmm.pallas_viterbi import viterbi_pallas_traced
    dh = aligner.dh
    print(f"DP inputs: B={codes.shape[0]} n_rows={n_rows} K={hmm.K}",
          file=sys.stderr)

    def run_dp():
        s, comb = viterbi_pallas_traced(dh, codes, lengths, regions,
                                        n_rows)
        jax.block_until_ready((s, comb))

    run_dp()
    t_dp = timed(run_dp)
    print(f"dp_kernel_s {t_dp:.4f}", flush=True)

    # download alone (comb is [B, 8+TPS] int32)
    s, comb = viterbi_pallas_traced(dh, codes, lengths, regions, n_rows)
    jax.block_until_ready((s, comb))
    t_dl = timed(lambda: (np.asarray(s), np.asarray(comb)))
    print(f"dp_download_s {t_dl:.4f} comb_shape {tuple(comb.shape)}",
          flush=True)

    # ---- placement at several windows ------------------------------------
    for W in (512, 384, 256):
        placer = DevicePlacer(tree, window=W)
        seqs, starts, ends, valid = _aln_windows(tree, placer, alns)
        if W == 512:
            spans = (ends - starts + 1)[valid]
            print(f"aln spans: med={np.median(spans):.0f} "
                  f"p99={np.percentile(spans, 99):.0f} "
                  f"max={spans.max()}", file=sys.stderr)

        def run_place():
            placer.place_batch_win(seqs, starts, ends,
                                   summary_only=True)

        run_place()
        t = timed(run_place)
        print(f"place_W{W}_s {t:.4f}", flush=True)


if __name__ == "__main__":
    main()
