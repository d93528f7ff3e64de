"""Smoke + output-validity tests for the training and anneal CLIs
(reference hmmufotu-train-{dm,sm,hmm}.cpp, hmmufotu-anneal.cpp) —
the four tools the rest of the suite doesn't already drive."""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
MSA_F = os.path.join(FIX, "70_otus.fasta")
TREE_F = os.path.join(FIX, "70_otus.tree")


def test_train_hmm(tmp_path):
    from hmmufotu_tpu.cli.train_hmm import main
    from hmmufotu_tpu.hmm.profile import ProfileHMM
    out = str(tmp_path / "t.hmm")
    assert main([MSA_F, "-o", out]) == 0
    hmm = ProfileHMM.from_hmmer_file(out)
    assert hmm.K > 100
    # emissions are probabilities: each match column sums to 1
    np.testing.assert_allclose(hmm.E_M[:, 1:].sum(axis=0), 1.0,
                               rtol=1e-3)


def test_train_sm(tmp_path):
    from hmmufotu_tpu.cli.train_sm import main
    from hmmufotu_tpu.phylo.models import load_model
    out = str(tmp_path / "t.sm")
    assert main([MSA_F, TREE_F, "-o", out, "-s", "GTR"]) == 0
    m = load_model(out)
    assert m.name == "GTR"
    np.testing.assert_allclose(m.pi.sum(), 1.0, rtol=1e-6)
    # trained rate matrix rows sum to ~0 and it is normalized by
    # -trace(Q) = 1 — the reference's GTR convention (scale's default
    # pi=ones, GTR.cpp:131; see models.GTR._set_q_from_params)
    np.testing.assert_allclose(m.Q.sum(axis=1), 0.0, atol=1e-8)
    np.testing.assert_allclose(-np.trace(m.Q), 1.0, rtol=1e-6)


def test_train_dm(tmp_path):
    from hmmufotu_tpu.cli.train_dm import main
    from hmmufotu_tpu.mathx.dirichlet import HmmPrior
    # a small alignment slice keeps the mixture EM quick (the full
    # fixture takes ~10 min; this is a smoke test, not a trainer)
    small = tmp_path / "small.fasta"
    seqs, cur = [], None
    for line in open(MSA_F):
        if line.startswith(">"):
            if len(seqs) >= 20:
                break
            cur = [line.strip()]
            seqs.append(cur)
        else:
            cur.append(line.strip())
    small.write_text("\n".join(
        s[0] + "\n" + "".join(s[1:])[:400] for s in seqs) + "\n")
    out = str(tmp_path / "t.dm")
    assert main([str(small), "-o", out, "-n", "1", "-S", "0"]) == 0
    prior = HmmPrior.load(out)
    assert prior.dmME.alpha.shape[0] == 4
    assert (prior.dmME.alpha > 0).all()
    assert prior.dmIT.alpha.shape[0] == 2


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from hmmufotu_tpu.cli.build import main as build_main
    prefix = str(tmp_path_factory.mktemp("anneal") / "db")
    assert build_main([MSA_F, TREE_F, "-n", prefix, "-s", "JC69"]) == 0
    return prefix


def test_anneal(db, tmp_path):
    from hmmufotu_tpu.cli.anneal import main
    primers = tmp_path / "primers.fasta"
    # 515F / 806R-style primers with IUPAC degeneracies
    primers.write_text(">515F\nGTGYCAGCMGCCGCGGTAA\n"
                       ">806R\nGGACTACNVGGGTWTCTAAT\n")
    out = str(tmp_path / "anneal.tsv")
    assert main([db, str(primers), "-o", out]) == 0
    rows = [ln for ln in open(out)
            if not ln.startswith("#") and ln.strip()]
    # header + one row per primer/strand evaluated
    assert len(rows) >= 2
