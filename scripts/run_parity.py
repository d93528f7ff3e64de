#!/usr/bin/env python
"""Large-scale oracle parity sweep (VERDICT round-1 items #1 and #7).

Runs >=1000 simulated reads per configuration through BOTH the
production stack and the independent f64 oracle (tests/oracle/) and
reports:

- alignment-string / coordinate parity counts,
- assignment category (branch + taxon) parity counts,
- the banded-vs-full DP deviation statistics (how often the band
  misses the full-DP optimum and whether categories change).

Usage:
    env -u PALLAS_AXON_POOL_IPS -u _JAX_PLATFORMS_PINNED \
        JAX_PLATFORMS=cpu python scripts/run_parity.py [-n N] [--fast]

Results are summarized to stdout; paste into PARITY.md.
"""

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402


def run_sweep(model, dgamma, n_reads, seed, paired, tag):
    from test_oracle_parity import (ParityHarness, build_db, sim_reads)
    from hmmufotu_tpu.alphabet import DNA
    from hmmufotu_tpu.hmm import GLOBAL, NGCL
    import pathlib

    tmp = pathlib.Path(tempfile.mkdtemp(prefix=f"parity_{tag}_"))
    prefix = build_db(tmp, model, dgamma)
    mode = GLOBAL if paired else NGCL
    h = ParityHarness(prefix, mode)
    stats = dict(tag=tag, n=n_reads, aln_mismatch=0, cat_mismatch=0,
                 score_mismatch=0, band_fallback=0, details=[])

    t0 = time.time()
    if paired:
        fwd, rev = sim_reads(prefix, tmp, n_reads, seed, paired=True)
        rev_rc = [DNA.revcom(r) for r in rev]
        alns = h.prod_align(fwd)
        rev_alns = h.prod_align(rev_rc)
        merged = []
        for a, b in zip(alns, rev_alns):
            if a.cs_start <= b.cs_start and a.cs_end <= b.cs_end:
                a.merge(b)
            merged.append(a)
        places = h.prod_place_device(merged)
        for r in range(n_reads):
            o_aln = h.oracle_align(fwd[r])
            o_rev = h.oracle_align(rev_rc[r])
            if o_aln.cs_start <= o_rev.cs_start \
                    and o_aln.cs_end <= o_rev.cs_end:
                o_aln.merge(o_rev)
            if o_aln.align != merged[r].align:
                stats["aln_mismatch"] += 1
                stats["details"].append((r, "align"))
                continue
            if places[r] is None:
                continue
            o_best = h.oracle_place(o_aln)
            anno = h.db.ptu.anno
            if anno[o_best.a_node] != anno[places[r].a_node] or \
                    (o_best.c_node, o_best.p_node) != \
                    (places[r].c_node, places[r].p_node):
                stats["cat_mismatch"] += 1
                stats["details"].append(
                    (r, f"cat {o_best.c_node}->{o_best.p_node} vs "
                        f"{places[r].c_node}->{places[r].p_node}"))
            if r % 50 == 49:
                print(f"  [{tag}] {r + 1}/{n_reads} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    else:
        reads = sim_reads(prefix, tmp, n_reads, seed)
        alns = h.prod_align(reads)
        places = h.prod_place_device(alns)
        for r, read in enumerate(reads):
            mism = h.compare_read(read, alns[r], places[r])
            if mism:
                key = "aln_mismatch" if any(
                    "align" in m or "aln." in m or "cost" in m
                    for m in mism) else (
                    "cat_mismatch" if any(
                        "taxon" in m or "branch" in m for m in mism)
                    else "score_mismatch")
                stats[key] += 1
                stats["details"].append((r, mism))
            if r % 50 == 49:
                print(f"  [{tag}] {r + 1}/{n_reads} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    stats["secs"] = time.time() - t0
    return stats


def run_band_deviation(n_reads, seed):
    """Quantify the reference's OWN banded-vs-full deviation (the band
    is a heuristic; this measures how often it changes scores or
    categories, VERDICT item #7) using the oracle only."""
    from test_oracle_parity import ParityHarness, build_db, sim_reads
    from oracle.ref_hmm import OracleVScores
    import pathlib

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="parity_band_"))
    prefix = build_db(tmp, "GTR", False)
    from hmmufotu_tpu.hmm import NGCL
    h = ParityHarness(prefix, NGCL)
    reads = sim_reads(prefix, tmp, n_reads, seed)
    import hmmufotu_tpu.pipeline as pl
    from oracle.ref_hmm import OracleVPath

    n_diff_cost = 0
    n_diff_aln = 0
    n_diff_cat = 0
    n_banded = 0
    max_cost_gap = 0.0
    t0 = time.time()
    for r, read in enumerate(reads):
        vps = pl.batch_find_seed_vpaths(h.aligner.hmm, h.db.csfm,
                                        [read], mode=NGCL, rng=None)[0]
        if not vps:
            continue
        n_banded += 1
        ovp = [OracleVPath(v.start, v.end, v.from_, v.to, v.n_ins,
                           v.n_del) for v in vps]
        enc = h.ref_hmm.encode(read)
        vsb = OracleVScores(h.ref_hmm.K, len(read))
        h.ref_hmm.calc_viterbi_scores_banded(enc, vsb, ovp)
        vtb = h.ref_hmm.build_viterbi_trace(vsb)
        if vtb.min_score == math.inf:
            continue
        vsf = OracleVScores(h.ref_hmm.K, len(read))
        h.ref_hmm.calc_viterbi_scores_full(enc, vsf)
        vtf = h.ref_hmm.build_viterbi_trace(vsf)
        gap = vtb.min_score - vtf.min_score
        if gap > 1e-9:
            n_diff_cost += 1
            max_cost_gap = max(max_cost_gap, gap)
            ab = h.ref_hmm.build_global_align(read, vsb, vtb)
            af = h.ref_hmm.build_global_align(read, vsf, vtf)
            if ab.align != af.align:
                n_diff_aln += 1
                bb = h.oracle_place(ab)
                bf = h.oracle_place(af)
                anno = h.db.ptu.anno
                if anno[bb.a_node] != anno[bf.a_node]:
                    n_diff_cat += 1
        if r % 20 == 19:
            print(f"  [band] {r + 1}/{n_reads} ({time.time() - t0:.0f}s)",
                  flush=True)
    return dict(n=n_reads, n_banded=n_banded, n_diff_cost=n_diff_cost,
                n_diff_aln=n_diff_aln, n_diff_cat=n_diff_cat,
                max_cost_gap=max_cost_gap, secs=time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1000,
                    help="reads per configuration")
    ap.add_argument("--band-n", type=int, default=200,
                    help="reads for the band-deviation sweep")
    ap.add_argument("--fast", action="store_true",
                    help="50 reads per config (smoke)")
    args = ap.parse_args()
    n = 50 if args.fast else args.n
    bn = 50 if args.fast else args.band_n

    results = []
    for model, dg, paired, tag, seed in [
            ("JC69", False, False, "JC69-SE", 101),
            ("GTR", True, False, "GTR-dG4-SE", 102),
            ("GTR", True, True, "GTR-dG4-PE", 103)]:
        print(f"== {tag}: {n} reads ==", flush=True)
        results.append(run_sweep(model, dg, n, seed, paired, tag))

    print(f"== band deviation: {bn} reads ==", flush=True)
    band = run_band_deviation(bn, 104)

    print("\n===== PARITY SUMMARY =====")
    for s in results:
        print(f"{s['tag']}: n={s['n']} aln_mismatch={s['aln_mismatch']} "
              f"cat_mismatch={s['cat_mismatch']} "
              f"score_mismatch={s['score_mismatch']} "
              f"({s['secs']:.0f}s)")
        for d in s["details"][:10]:
            print(f"   {d}")
    print(f"band-deviation: banded={band['n_banded']}/{band['n']} "
          f"cost_diff={band['n_diff_cost']} aln_diff={band['n_diff_aln']} "
          f"cat_diff={band['n_diff_cat']} "
          f"max_cost_gap={band['max_cost_gap']:.4f} "
          f"({band['secs']:.0f}s)")


if __name__ == "__main__":
    main()
