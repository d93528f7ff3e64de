"""Independent-oracle parity tests (VERDICT round-1 item #1).

The oracle (tests/oracle/) transcribes the reference algorithms in
sequential f64 numpy, sharing no code with hmmufotu_tpu.  These tests
run BOTH stacks end to end on simulated reads and demand:

- byte-identical gapped alignment strings + coordinates (the TSV
  alignment columns),
- identical assignment categories (branch id pair + taxon annotation),
- score agreement within a small f64 tolerance (documented float-
  summation-order differences only).

CI runs a bounded read count; scripts/run_parity.py runs the >=1000
read sweeps recorded in PARITY.md.
"""

import math
import os

import numpy as np
import pytest

from hmmufotu_tpu import pipeline as pl
from hmmufotu_tpu.alphabet import DNA
from hmmufotu_tpu.db import Database
from hmmufotu_tpu.hmm import NGCL, GLOBAL, ViterbiAligner

from oracle import RefHmm, RefLocator, oracle_align_seq
from oracle.ref_phylo import OracleTree, oracle_assign_read

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def build_db(tmpdir, model="JC69", dgamma=False) -> str:
    prefix = str(tmpdir / f"70_otus_{model}{'_dG' if dgamma else ''}")
    from hmmufotu_tpu.cli.build import main as build_main
    args = [os.path.join(FIXTURES, "70_otus.fasta"),
            os.path.join(FIXTURES, "70_otus.tree"),
            "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
            "-n", prefix, "-s", model]
    if dgamma:
        args.append("-V")
    assert build_main(args) == 0
    return prefix


def sim_reads(db_prefix, tmpdir, n, seed, paired=False):
    from hmmufotu_tpu.cli.sim import main as sim_main
    fwd = str(tmpdir / f"sim_{seed}.fasta")
    args = [db_prefix, fwd, "-N", str(n), "-S", str(seed),
            "--mean-size", "300", "--sd-size", "30"]
    rev = None
    if paired:
        rev = str(tmpdir / f"sim_{seed}_R2.fasta")
        args += ["-m", rev]
    assert sim_main(args) == 0
    from hmmufotu_tpu.seq import read_seqs
    fwd_reads = [r.seq for r in read_seqs(fwd)]
    if not paired:
        return fwd_reads
    rev_reads = [r.seq for r in read_seqs(rev)]
    return fwd_reads, rev_reads


class ParityHarness:
    """Both stacks over one DB."""

    def __init__(self, db_prefix: str, mode: str):
        self.db = Database.load(db_prefix)
        self.mode = mode
        hmm = self.db.hmm
        hmm.set_sequence_mode(mode)
        self.ref_hmm = RefHmm.from_production(hmm)  # pre-retract copy
        hmm.wing_retract()
        self.aligner = ViterbiAligner(hmm)
        self.locator = RefLocator(self.db.msa)
        self.otree = OracleTree(self.db.ptu)
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        self.placer = DevicePlacer(self.db.ptu)

    # ---- production paths -------------------------------------------
    def prod_align(self, reads):
        return pl.align_reads(self.aligner, self.db.csfm, reads,
                              mode=self.mode, rng=None)

    def prod_place_host(self, aln):
        seq = pl.aln_to_digital(self.db.ptu, aln)
        return pl.assign_read(self.db.ptu, aln, seq)

    def prod_place_device(self, alns):
        return pl.assign_batch_device(self.db.ptu, self.placer, alns)

    # ---- oracle paths ------------------------------------------------
    def oracle_align(self, read):
        return oracle_align_seq(self.ref_hmm, self.locator, read,
                                mode=self.mode)

    def oracle_place(self, aln):
        best, _ = self.oracle_place_all(aln)
        return best

    def oracle_place_all(self, aln):
        seq = DNA.encode_upper(aln.align)
        return oracle_assign_read(self.otree, seq,
                                  aln.cs_start - 1, aln.cs_end - 1)

    def compare_read(self, read, prod_aln, prod_place):
        """Return a list of mismatch strings (empty = parity)."""
        mism = []
        o_aln = self.oracle_align(read)
        if o_aln.align != prod_aln.align:
            ndiff = sum(1 for a, b in zip(o_aln.align, prod_aln.align)
                        if a != b)
            mism.append(f"align str differs at {ndiff} positions")
        for f in ("seq_start", "seq_end", "hmm_start", "hmm_end",
                  "cs_start", "cs_end"):
            if getattr(o_aln, f) != getattr(prod_aln, f):
                mism.append(f"aln.{f}: oracle {getattr(o_aln, f)} "
                            f"prod {getattr(prod_aln, f)}")
        # the production DP runs in f32 on device; the oracle is f64 —
        # costs agree to f32 rounding, alignments byte-identically
        if not (math.isclose(o_aln.cost, prod_aln.cost,
                             rel_tol=1e-4, abs_tol=5e-3)):
            mism.append(f"cost: oracle {o_aln.cost} prod {prod_aln.cost}")
        if mism:
            return mism  # placement comparison needs matching alignment
        o_best, o_places = self.oracle_place_all(o_aln)
        anno = self.db.ptu.anno
        if prod_place is None:
            mism.append("prod placement missing")
            return mism
        o_tax = anno[o_best.a_node]
        p_tax = anno[prod_place.a_node]
        if o_tax != p_tax:
            mism.append(f"taxon: oracle {o_tax!r} prod {p_tax!r}")
        if (o_best.c_node, o_best.p_node) != (prod_place.c_node,
                                              prod_place.p_node):
            # same taxon on a different branch is acceptable ONLY when
            # the production branch appears among the oracle candidates
            # at an equivalent posterior (an f32-vs-f64 knife-edge tie)
            tie = any(p.c_node == prod_place.c_node
                      and p.p_node == prod_place.p_node
                      and abs(p.q_place - o_best.q_place) < 0.05
                      for p in o_places)
            if not (tie and o_tax == p_tax):
                mism.append(
                    f"branch: oracle {o_best.c_node}->{o_best.p_node} "
                    f"prod {prod_place.c_node}->{prod_place.p_node}")
        if not math.isclose(o_best.loglik, prod_place.loglik,
                            rel_tol=1e-6, abs_tol=1e-4):
            mism.append(f"loglik: oracle {o_best.loglik} "
                        f"prod {prod_place.loglik}")
        return mism


def run_config(tmpdir, model, dgamma, n_reads, seed, paired=False):
    prefix = build_db(tmpdir, model, dgamma)
    mode = GLOBAL if paired else NGCL
    h = ParityHarness(prefix, mode)
    failures = []
    if paired:
        fwd, rev = sim_reads(prefix, tmpdir, n_reads, seed, paired=True)
        rev_rc = [DNA.revcom(r) for r in rev]
        alns = h.prod_align(fwd)
        rev_alns = h.prod_align(rev_rc)
        merged = []
        for a, b in zip(alns, rev_alns):
            if a.cs_start <= b.cs_start and a.cs_end <= b.cs_end:
                a.merge(b)
            merged.append(a)
        places = h.prod_place_device(merged)
        for r, read in enumerate(fwd):
            o_aln = h.oracle_align(read)
            o_rev = h.oracle_align(rev_rc[r])
            if o_aln.cs_start <= o_rev.cs_start \
                    and o_aln.cs_end <= o_rev.cs_end:
                o_aln.merge(o_rev)
            mism = []
            if o_aln.align != merged[r].align:
                mism.append("merged align differs")
            if (o_aln.cs_start != merged[r].cs_start
                    or o_aln.cs_end != merged[r].cs_end):
                mism.append("merged cs bounds differ")
            if not mism and places[r] is not None:
                o_best = h.oracle_place(o_aln)
                anno = h.db.ptu.anno
                if anno[o_best.a_node] != anno[places[r].a_node]:
                    mism.append(
                        f"taxon: {anno[o_best.a_node]!r} vs "
                        f"{anno[places[r].a_node]!r}")
            if mism:
                failures.append((r, mism))
    else:
        reads = sim_reads(prefix, tmpdir, n_reads, seed)
        alns = h.prod_align(reads)
        places = h.prod_place_device(alns)
        for r, read in enumerate(reads):
            mism = h.compare_read(read, alns[r], places[r])
            if mism:
                failures.append((r, mism))
    return failures


class TestOracleParity:
    def test_jc69_se(self, tmp_path):
        failures = run_config(tmp_path, "JC69", False, 20, seed=11)
        assert not failures, failures

    def test_gtr_dg4_se(self, tmp_path):
        failures = run_config(tmp_path, "GTR", True, 20, seed=12)
        assert not failures, failures

    def test_gtr_dg4_pe(self, tmp_path):
        failures = run_config(tmp_path, "GTR", True, 10, seed=13,
                              paired=True)
        assert not failures, failures

    def test_host_path_matches_oracle(self, tmp_path):
        """The host (non-device) production placement path also agrees
        with the oracle."""
        prefix = build_db(tmp_path, "JC69", False)
        h = ParityHarness(prefix, NGCL)
        reads = sim_reads(prefix, tmp_path, 6, seed=21)
        alns = h.prod_align(reads)
        anno = h.db.ptu.anno
        for r, read in enumerate(reads):
            place = h.prod_place_host(alns[r])
            o_best = h.oracle_place(self_aln := h.oracle_align(read))
            assert self_aln.align == alns[r].align
            assert anno[o_best.a_node] == anno[place.a_node], r
            assert (o_best.c_node, o_best.p_node) == \
                (place.c_node, place.p_node), r
