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

    # ---- DP kernel alone (banded split path) -----------------------------
    from hmmufotu_tpu.hmm.pallas_viterbi import (
        viterbi_pallas_traced, viterbi_pallas_traced_split)
    dh = aligner.dh
    print(f"DP inputs: B={codes.shape[0]} n_rows={n_rows} K={hmm.K}",
          file=sys.stderr)

    def run_dp_split():
        s, comb = viterbi_pallas_traced_split(dh, codes, lengths,
                                              regions, n_rows)
        jax.block_until_ready((s, comb))

    run_dp_split()
    t_dp = timed(run_dp_split)
    print(f"dp_split_kernel_s {t_dp:.4f}", flush=True)

    def run_dp_full():
        s, comb = viterbi_pallas_traced(
            dh, jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(regions), n_rows)
        jax.block_until_ready((s, comb))

    import jax.numpy as jnp
    run_dp_full()
    t_dpf = timed(run_dp_full)
    print(f"dp_full_kernel_s {t_dpf:.4f}", flush=True)

    # fresh download each time (a jax.Array caches its host copy, so
    # re-fetching the same array measures nothing)
    def run_dp_dl():
        s, comb = viterbi_pallas_traced_split(dh, codes, lengths,
                                              regions, n_rows)
        np.asarray(comb)

    t_dl = timed(run_dp_dl) - t_dp
    print(f"dp_download_s {max(t_dl, 0.0):.4f}", flush=True)

    # ---- placement: estimate kernel vs XLA estimate ----------------------
    for est in (True, False):
        placer = DevicePlacer(tree, window=512, est_kernel=est)
        seqs, starts, ends, valid = _aln_windows(tree, placer, alns)

        def run_place():
            placer.place_batch_win(seqs, starts, ends,
                                   summary_only=True)

        run_place()
        t = timed(run_place)
        print(f"place_estk{int(est)}_s {t:.4f}", flush=True)


if __name__ == "__main__":
    main()
