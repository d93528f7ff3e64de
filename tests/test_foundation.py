"""Tests for alphabets, sequence IO, MSA statistics, and math helpers."""

import io
import math
import os

import numpy as np
import pytest

from hmmufotu_tpu.alphabet import DNA, GAP_BASE, INVALID_BASE, IUPACNucl
from hmmufotu_tpu.mathx import (DirichletDensity, DirichletMixture, HmmPrior,
                                add_scaled, p2q, q2p, relative_entropy,
                                root_bisection)
from hmmufotu_tpu.msa import MSA
from hmmufotu_tpu.seq import PrimarySeq, SeqWriter, read_seqs


class TestAlphabet:
    def test_encode_basic(self):
        codes = DNA.encode("ACGT")
        assert list(codes) == [0, 1, 2, 3]

    def test_encode_degenerate(self):
        # reference: N -> first expansion symbol A -> 0, U -> T -> 3
        assert DNA.encode_char("N") == 0
        assert DNA.encode_char("U") == 3

    def test_encode_gap_invalid(self):
        assert list(DNA.encode("-._")) == [GAP_BASE] * 3
        assert DNA.encode_char("X") == INVALID_BASE
        # lowercase is invalid unless uppercased first
        assert DNA.encode_char("a") == INVALID_BASE
        assert DNA.encode_upper("acgt").tolist() == [0, 1, 2, 3]

    def test_revcom(self):
        assert DNA.revcom("ACGTN") == "NACGT"
        assert IUPACNucl.revcom("ACGTRYN") == "NRYACGT"

    def test_decode(self):
        assert DNA.decode(np.array([0, 1, GAP_BASE, 3], dtype=np.int8)) == "AC-T"

    def test_amino(self):
        # reference IUPACAmino.{h,cpp}: 20 symbols, degen B/X/Z to the
        # first expansion symbol, no complement; factory names
        # 'protein'/'IUPACAmino' (AlphabetFactory.cpp:45-46)
        from hmmufotu_tpu.alphabet import IUPACAmino, get_alphabet
        assert get_alphabet("protein") is IUPACAmino
        assert get_alphabet("IUPACAmino") is IUPACAmino
        assert IUPACAmino.size == 20
        assert list(IUPACAmino.encode("ACDW")) == [0, 1, 2, 18]
        assert IUPACAmino.encode_char("B") == IUPACAmino.encode_char("D")
        assert IUPACAmino.encode_char("X") == IUPACAmino.encode_char("A")
        assert IUPACAmino.encode_char("Z") == IUPACAmino.encode_char("E")
        assert IUPACAmino.encode_char("-") == GAP_BASE
        assert IUPACAmino.decode(IUPACAmino.encode("MKWVTFISLLF")) == "MKWVTFISLLF"


class TestSeqIO:
    def test_fasta_roundtrip(self, tmp_path):
        recs = [PrimarySeq("s1", "ACGT", "desc one"),
                PrimarySeq("s2", "GGTTAA", "")]
        p = tmp_path / "x.fasta"
        with SeqWriter(str(p)) as w:
            for r in recs:
                w.write(r)
        back = list(read_seqs(str(p)))
        assert [r.id for r in back] == ["s1", "s2"]
        assert back[0].desc == "desc one"
        assert back[1].seq == "GGTTAA"

    def test_fastq(self, tmp_path):
        p = tmp_path / "x.fq"
        p.write_text("@r1 d\nACGT\n+\nIIII\n@r2\nGG\n+\n##\n")
        back = list(read_seqs(str(p)))
        assert back[0].qual == "IIII"
        assert back[1].seq == "GG"

    def test_gzip(self, tmp_path):
        import gzip
        p = tmp_path / "x.fasta.gz"
        with gzip.open(p, "wt") as fh:
            fh.write(">a\nACGT\n")
        assert list(read_seqs(str(p)))[0].seq == "ACGT"

    def test_revcom_seq(self):
        s = PrimarySeq("r", "AACGT", qual="ABCDE")
        rc = s.revcom()
        assert rc.seq == "ACGTT"
        assert rc.qual == "EDCBA"


class TestMSA:
    @pytest.fixture(scope="class")
    def msa(self, fixtures_dir):
        m = MSA.load_fasta(os.path.join(fixtures_dir, "70_otus.fasta"),
                           name="70_otus")
        m.prune()
        return m

    def test_shape(self, msa):
        assert msa.num_seq == 125
        assert 0 < msa.cs_len < 7682

    def test_weights_normalized(self, msa):
        # reference MSA.cpp:277: weights sum to numSeq
        assert msa.seq_weight.sum() == pytest.approx(msa.num_seq)
        assert (msa.seq_weight > 0).all()

    def test_counts_consistent(self, msa):
        # every column retained after prune has at least one residue
        assert (msa.res_count.sum(axis=0) > 0).all()
        # raw counts + gaps + invalids = numSeq per column
        total = msa.res_count.sum(axis=0) + msa.gap_count
        assert (total <= msa.num_seq).all()

    def test_fracs(self, msa):
        assert 0 <= msa.sym_wfrac(0) <= 1
        sw = msa.sym_wfrac()
        assert sw.shape == (msa.cs_len,)

    def test_save_load(self, msa, tmp_path):
        p = str(tmp_path / "m.npz")
        msa.save(p)
        back = MSA.load(p)
        assert back.num_seq == msa.num_seq
        assert back.get_cs() == msa.get_cs()
        np.testing.assert_allclose(back.seq_weight, msa.seq_weight)


class TestMath:
    def test_add_scaled(self):
        a, b = -1000.0, -1001.0
        expect = math.log(math.exp(-1000 + 1000) + math.exp(-1001 + 1000)) - 0 + -1000
        assert add_scaled(a, b) == pytest.approx(-1000 + math.log(1 + math.exp(-1)))
        assert add_scaled(-math.inf, -5.0) == pytest.approx(-5.0)

    def test_p2q_q2p(self):
        assert p2q(0.01) == pytest.approx(20.0)
        assert q2p(30.0) == pytest.approx(0.001)

    def test_relative_entropy(self):
        p = np.array([1, 0, 0, 0.0])
        q = np.full(4, 0.25)
        assert relative_entropy(p, q) == pytest.approx(2.0)  # 2 bits

    def test_root_bisection(self):
        root = root_bisection(lambda x: x * x - 2, 0, 2)
        assert root == pytest.approx(math.sqrt(2), abs=1e-8)
        assert math.isnan(root_bisection(lambda x: x * x + 1, -1, 1))


class TestDirichlet:
    def test_prior_load(self, fixtures_dir):
        pri = HmmPrior.load(os.path.join(fixtures_dir, "gg_97_otus.dm"))
        assert pri.dmME.k == 4 and pri.dmME.L == 5
        assert pri.dmME.q.sum() == pytest.approx(1.0, abs=1e-6)
        assert pri.dmMT.k == 3 and pri.dmIT.k == 2 and pri.dmDT.k == 2

    def test_prior_roundtrip(self, fixtures_dir, tmp_path):
        pri = HmmPrior.load(os.path.join(fixtures_dir, "gg_97_otus.dm"))
        p = str(tmp_path / "x.dm")
        pri.save(p)
        back = HmmPrior.load(p)
        np.testing.assert_allclose(back.dmME.alpha, pri.dmME.alpha)
        np.testing.assert_allclose(back.dmME.q, pri.dmME.q)
        np.testing.assert_allclose(back.dmDT.alpha, pri.dmDT.alpha)

    def test_density_mean_post_p(self):
        dd = DirichletDensity(alpha=[1.0, 1.0, 1.0, 1.0])
        post = dd.mean_post_p(np.array([6.0, 0, 0, 0]))
        np.testing.assert_allclose(post, [0.7, 0.1, 0.1, 0.1])
        # batched equals per-column
        data = np.random.default_rng(0).random((4, 7))
        batched = dd.mean_post_p(data)
        for t in range(7):
            np.testing.assert_allclose(batched[:, t], dd.mean_post_p(data[:, t]))

    def test_mixture_mean_post_p_batched(self, fixtures_dir):
        pri = HmmPrior.load(os.path.join(fixtures_dir, "gg_97_otus.dm"))
        data = np.random.default_rng(1).random((4, 5)) * 10
        batched = pri.dmME.mean_post_p(data)
        for t in range(5):
            np.testing.assert_allclose(
                batched[:, t], pri.dmME.mean_post_p(data[:, t]), rtol=1e-12)
        np.testing.assert_allclose(batched.sum(axis=0), 1.0)

    def test_density_training(self):
        # train on samples from a known Dirichlet; alpha should be recovered
        rng = np.random.default_rng(42)
        true_alpha = np.array([5.0, 2.0, 1.0, 0.5])
        freqs = rng.dirichlet(true_alpha, size=300).T * 100  # counts
        dd = DirichletDensity(k=4)
        c = dd.train_ml(freqs, max_iter=2000)
        assert np.isfinite(c)
        est = dd.alpha / dd.alpha.sum()
        np.testing.assert_allclose(est, true_alpha / true_alpha.sum(), atol=0.05)
