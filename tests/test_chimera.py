"""Chimera-path parity vs the f64 oracle (VERDICT r3 item #5).

The reference's chimera check (hmmufotu.cpp:653-691) places each
alignment segment separately, compares the best 5'/3' segment taxa,
and computes a swapped-branch log-odds.  Round 3 had NO test of these
decisions.  Here:

  * synthetic chimeras = 5' half of one leaf + 3' half of a DISTANT
    leaf (different phylum), plus clean single-leaf reads;
  * the production path (cli.assign.check_chimera) must agree with an
    independent transcription of hmmufotu.cpp:653-691 built on the
    tests/oracle primitives — decision, seg5/seg3 taxa, and lod sign;
  * chimeras must be detected, clean reads must not be flagged.

Also pins the reference's quirky default maxChimeraError = 10.0
(initialized from defaults BEFORE option parsing, hmmufotu.cpp:146-147
vs :225) now mirrored by the CLI.
"""

import math
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from oracle.ref_phylo import (OraclePTLoc, OracleTree,  # noqa: E402
                              oracle_estimate_seq,
                              oracle_filter_placements,
                              oracle_get_seed, oracle_place_seq, p_dist)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from hmmufotu_tpu.cli.build import main as build_main
    from hmmufotu_tpu.db import Database
    tmp = tmp_path_factory.mktemp("chim")
    prefix = str(tmp / "db")
    assert build_main([
        os.path.join(FIXTURES, "70_otus.fasta"),
        os.path.join(FIXTURES, "70_otus.tree"),
        "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
        "-n", prefix, "-s", "GTR"]) == 0
    return Database.load(prefix)


def _leaf_groups(tree):
    """Leaves grouped by phylum so chimera halves are truly distant."""
    groups = {}
    for u in range(tree.num_nodes):
        if tree.is_leaf(u) and tree.msa_id[u] >= 0:
            phy = tree.anno[u].split(";")[1] if ";" in tree.anno[u] \
                else tree.anno[u]
            groups.setdefault(phy, []).append(u)
    return [v for v in groups.values() if len(v) >= 2]


def _make_reads(tree, rng, n_chimera=8, n_clean=4, span=360):
    """Aligned digital chimera + clean reads with known CS ranges."""
    groups = _leaf_groups(tree)
    assert len(groups) >= 2
    L = tree.cs_len
    lo, hi = 400, 400 + span     # fixed well-covered CS region
    reads = []
    for i in range(n_chimera):
        g5, g3 = rng.choice(len(groups), 2, replace=False)
        u5 = int(rng.choice(groups[g5]))
        u3 = int(rng.choice(groups[g3]))
        seq = np.full(L, -2, np.int8)
        mid = (lo + hi) // 2
        seq[lo:mid] = tree.seqs[u5, lo:mid]
        seq[mid:hi] = tree.seqs[u3, mid:hi]
        reads.append(("chimera", seq, lo, hi - 1, (u5, u3)))
    for i in range(n_clean):
        u = int(rng.choice(groups[i % len(groups)]))
        seq = np.full(L, -2, np.int8)
        seq[lo:hi] = tree.seqs[u, lo:hi]
        mut = rng.random(hi - lo) < 0.01
        idx = np.nonzero(mut)[0] + lo
        seq[idx] = rng.integers(0, 4, len(idx), dtype=np.int8)
        reads.append(("clean", seq, lo, hi - 1, (u, u)))
    return reads


def _oracle_chimera(ot, tree, seq, cs_start, cs_end, num_seg=2,
                    chimera_err=10.0, max_height=math.inf,
                    chimera_lod=0.0, max_nseed=50):
    """Literal transcription of hmmufotu.cpp:653-691 on the oracle."""
    seeds = oracle_get_seed(ot, seq, cs_start, cs_end, math.inf,
                            max_height)
    seeds = seeds[:max_nseed]            # hmmufotu.cpp:646-648
    seg_len = (cs_end - cs_start + 1) // num_seg
    seg5, seg3 = [], []
    for n in range(num_seg):
        s0 = cs_start + n * seg_len
        e0 = s0 + seg_len - 1
        seg_seeds = [OraclePTLoc(s0, e0, s.id,
                                 p_dist(seq, ot.seqs[s.id], s0, e0))
                     for s in seeds]
        places = [oracle_estimate_seq(ot, seq, sd) for sd in seg_seeds]
        places = oracle_filter_placements(places, chimera_err)
        places = [oracle_place_seq(ot, seq, p, max_height)
                  for p in places]
        (seg5 if n < num_seg // 2 else seg3).extend(places)
    seg5.sort(key=lambda p: -p.loglik)
    seg3.sort(key=lambda p: -p.loglik)
    b5, b3 = seg5[0], seg3[0]

    def alt(best, other):
        loc = OraclePTLoc(best.start, best.end, other.c_node,
                          p_dist(seq, ot.seqs[best.c_node],
                                 best.start, best.end))
        p = oracle_estimate_seq(ot, seq, loc)
        return oracle_place_seq(ot, seq, p, max_height)

    alt5 = alt(b5, b3)
    alt3 = alt(b3, b5)
    lod = b5.loglik - alt5.loglik + b3.loglik - alt3.loglik
    is_chi = (b5.a_node != b3.a_node) and lod > chimera_lod
    return is_chi, lod, b5, b3


def test_chimera_decisions_match_oracle(db):
    from hmmufotu_tpu.cli.assign import check_chimera
    from hmmufotu_tpu import pipeline as pl

    tree = db.ptu
    ot = OracleTree(tree)
    rng = np.random.default_rng(7)
    reads = _make_reads(tree, rng)
    args = SimpleNamespace(num_segment=2, method="unweighted",
                           chimera_err=10.0, max_height=math.inf,
                           chimera_lod=0.0)

    n_chi_detected = 0
    for kind, seq, cs_start, cs_end, origin in reads:
        aln = SimpleNamespace(cs_start=cs_start + 1, cs_end=cs_end + 1)
        seeds = pl.get_seed(tree, seq, cs_start, cs_end,
                            max_nseed=pl.DEFAULT_MAX_NSEED)
        is_chi, lod, b5, b3 = check_chimera(tree, aln, seq, seeds, args)
        o_chi, o_lod, ob5, ob3 = _oracle_chimera(
            ot, tree, seq, cs_start, cs_end)
        # decision + segment taxa parity vs the oracle
        assert is_chi == o_chi, (kind, origin, lod, o_lod)
        assert tree.anno[b5.a_node] == tree.anno[ob5.a_node]
        assert tree.anno[b3.a_node] == tree.anno[ob3.a_node]
        # lod agreement (f32 device vs f64 oracle)
        assert lod == pytest.approx(o_lod, rel=1e-3, abs=0.5)
        if kind == "chimera":
            # distant-phyla halves: segments land on different taxa
            # and the swapped-branch lod must be positive
            assert b5.a_node != b3.a_node, origin
            assert lod > 0, (origin, lod)
            n_chi_detected += is_chi
        else:
            assert not is_chi, (origin, lod)
    assert n_chi_detected >= 6   # at least 6/8 synthetic chimeras flagged


def test_chimera_cli_default_matches_reference():
    from hmmufotu_tpu.cli.assign import build_parser
    args = build_parser().parse_args(["db", "reads.fa"])
    assert args.chimera_err == 10.0   # hmmufotu.cpp:146-147 quirk
