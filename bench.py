"""End-of-round benchmark: taxonomy-assignment throughput (reads/s).

Measures the full hot path — banded device Viterbi alignment + SEP
placement + Q values — on the bundled 70_otus fixture DB with
simulated 250 bp reads, on whatever accelerator jax selects (the real
TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline divides by a MEASURED reference throughput: the reference
hmmufotu built from source (scripts/ref_build) runs these same reads
on this same DB at 46 reads/s/thread with perfect 2-thread scaling,
i.e. 736 reads/s at 16 threads (BASELINE.md "Measured CPU baseline").
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench")
# persistent XLA compile cache: the axon-tunnel compile of the DP scan
# and the placement while-loops takes minutes; cache makes reruns start
# in seconds (must be set before jax initializes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(CACHE, "jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
FIXTURES = os.path.join(REPO, "tests", "fixtures")
DB_PREFIX = os.path.join(CACHE, "70_otus")
N_READS = 8192
BATCH = 2048
# MEASURED: the reference hmmufotu built from source on this host
# (scripts/ref_build/build_reference.sh) runs the same 4096 simulated
# reads on the same 70_otus GTR DB at 46 reads/s/thread with perfect
# 2-thread scaling (BASELINE.md "Measured CPU baseline") -> 16-thread
# figure 46 x 16 = 736.  Replaces the round-1 1000 reads/s estimate.
BASELINE_READS_PER_S = 736.0


def ensure_db():
    from hmmufotu_tpu.cli.build import main as build_main
    if os.path.exists(DB_PREFIX + ".ptu.npz"):
        return
    os.makedirs(CACHE, exist_ok=True)
    rc = build_main([
        os.path.join(FIXTURES, "70_otus.fasta"),
        os.path.join(FIXTURES, "70_otus.tree"),
        "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
        "-n", DB_PREFIX, "-s", "GTR",
    ])
    assert rc == 0


def simulate_reads(tree, rng, n):
    """Quick in-memory read sim (mutated leaf windows, 250 bp)."""
    leaves = [u for u in range(tree.num_nodes)
              if tree.is_leaf(u) and tree.msa_id[u] >= 0]
    reads = []
    while len(reads) < n:
        u = int(rng.choice(leaves))
        codes = tree.seqs[u]
        pos = np.nonzero(codes >= 0)[0]
        if len(pos) < 260:
            continue
        st = int(rng.integers(0, len(pos) - 255))
        piece = codes[pos[st:st + 250]].copy()
        mut = rng.random(len(piece)) < 0.02
        piece[mut] = rng.integers(0, 4, int(mut.sum()))
        reads.append("".join("ACGT"[c] for c in piece))
    return reads


def main():
    t_setup = time.time()
    ensure_db()
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu import pipeline as pl

    from hmmufotu_tpu.phylo.placement import DevicePlacer

    db = Database.load(DB_PREFIX)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    hmm.set_sequence_mode(NGCL)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    placer = DevicePlacer(tree, window=512)
    rng = np.random.default_rng(0)
    reads = simulate_reads(tree, rng, N_READS)

    verbose = bool(os.environ.get("BENCH_VERBOSE"))
    if verbose:
        os.environ["HMMUFOTU_TIMING"] = "1"
    stage_t = {"seed": 0.0, "viterbi": 0.0, "albuild": 0.0,
               "place": 0.0}

    def assign_batch(batch):
        if verbose:
            t0 = time.time()
            vpaths = pl.batch_find_seed_vpaths(aligner.hmm, csfm, batch,
                                               mode=NGCL, rng=rng)
            t1 = time.time()
            alns = aligner.align_batch(batch, vpaths)
            t2 = time.time()
            best = pl.assign_batch_device(tree, placer, alns)
            t3 = time.time()
            stage_t["seed"] += t1 - t0
            stage_t["viterbi"] += t2 - t1
            stage_t["place"] += t3 - t2
        else:
            alns = pl.align_reads(aligner, csfm, batch, mode=NGCL, rng=rng)
            best = pl.assign_batch_device(tree, placer, alns)
        return sum(b is not None for b in best)

    # warmup with a FULL-SIZE batch: jit specializes on batch shape,
    # so a smaller warmup would leak compile time into the timed loop
    print("bench: compiling (first-run jit can take minutes on the "
          "axon tunnel)...", file=sys.stderr, flush=True)
    assign_batch(reads[:BATCH])
    print("bench: compiled; timing...", file=sys.stderr, flush=True)
    if verbose:
        for k in stage_t:
            stage_t[k] = 0.0
        from hmmufotu_tpu.hmm.viterbi import TIMING
        TIMING.clear()

    # BENCH_PROFILE=<dir>: capture a jax profiler trace of the first
    # timed pass (inspect with tensorboard or xprof; SURVEY §5 aux
    # tracing subsystem)
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)

    # MEDIAN of three timed passes: the remote device tunnel adds
    # +-15-25% run-to-run interference that has nothing to do with
    # the framework under test; a median makes round-over-round
    # comparisons meaningful where a max rewards a lucky draw
    passes = []
    for _ in range(3):
        t0 = time.time()
        n_done = 0
        if verbose:
            for lo in range(0, len(reads), BATCH):
                n_done += assign_batch(reads[lo:lo + BATCH])
        else:
            # double-buffered stream: device DP of batch k+1 overlaps
            # the host stages of batch k
            for alns, best in pl.assign_stream(
                    aligner, csfm, tree, placer, reads, BATCH,
                    mode=NGCL, rng=rng):
                n_done += sum(b is not None for b in best)
        dt = time.time() - t0
        passes.append(n_done / dt)
        if profile_dir:
            import jax
            jax.profiler.stop_trace()
            profile_dir = None
            print(f"bench: profiler trace written", file=sys.stderr)
    rps = float(np.median(passes))
    if verbose:
        print(f"pass throughputs: min={min(passes):.1f} "
              f"median={rps:.1f} max={max(passes):.1f}",
              file=sys.stderr)

    if verbose:
        print("stage times:", {k: round(v, 2)
                               for k, v in stage_t.items()},
              file=sys.stderr)
        from hmmufotu_tpu.hmm.viterbi import TIMING
        print("align sub-stages:", {k: round(v, 2)
                                    for k, v in TIMING.items()},
              file=sys.stderr)
    print(json.dumps({
        "metric": "assign_throughput",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
