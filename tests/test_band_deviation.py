"""Pinned banded-vs-full DP deviation envelope (VERDICT r3 item #7).

The reference's band is a heuristic: banded Viterbi may score above
the full-DP optimum (and the band's region-overlap B-entry semantics
are a documented deviation, hmm/viterbi.py docstring).  The round-3
200-read sweep recorded: 15/139 banded reads with a cost gap, max gap
22.9, 15 alignment changes, 0 category changes (PARITY.md).  This test
pins that envelope on a small fixed read set so any drift in the
kernel's banding semantics (geometry, truncation, B-entry) fails
loudly.  Both paths run through the f64 ORACLE — the production
kernels are tied to the oracle elsewhere (test_oracle_parity), so this
isolates the band geometry itself.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from oracle.ref_hmm import OracleVPath, OracleVScores  # noqa: E402


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    from test_oracle_parity import ParityHarness, build_db, sim_reads
    from hmmufotu_tpu.hmm import NGCL
    tmp = tmp_path_factory.mktemp("band")
    prefix = build_db(tmp, "GTR", False)
    h = ParityHarness(prefix, NGCL)
    reads = sim_reads(prefix, tmp, 24, 123)
    return h, reads


def test_band_deviation_envelope(harness):
    import hmmufotu_tpu.pipeline as pl
    from hmmufotu_tpu.hmm import NGCL
    h, reads = harness

    n_banded = n_diff_cost = n_diff_cat = 0
    max_gap = 0.0
    for read in reads:
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
        # the band must never BEAT the full DP (it searches a subset;
        # a negative gap would mean the full path lost a transition)
        assert gap >= -1e-9, f"banded beat full by {-gap}"
        if gap > 1e-9:
            n_diff_cost += 1
            max_gap = max(max_gap, gap)
            ab = h.ref_hmm.build_global_align(read, vsb, vtb)
            af = h.ref_hmm.build_global_align(read, vsf, vtf)
            if ab.align != af.align:
                bb = h.oracle_place(ab)
                bf = h.oracle_place(af)
                anno = h.db.ptu.anno
                if anno[bb.a_node] != anno[bf.a_node]:
                    n_diff_cat += 1

    assert n_banded >= 10, f"only {n_banded}/24 reads banded"
    # recorded 200-read envelope: 15/139 gapped, max 22.9, 0 category
    # changes — allow margin but fail on drift
    assert n_diff_cost <= 6, f"{n_diff_cost}/{n_banded} cost gaps"
    assert max_gap <= 25.0, f"max banded-vs-full gap {max_gap:.1f}"
    assert n_diff_cat == 0, f"{n_diff_cat} category changes"
