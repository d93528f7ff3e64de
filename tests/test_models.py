"""Tests for DNA substitution models, discrete gamma, and Newick IO."""

import math
import os

import numpy as np
import pytest

from hmmufotu_tpu.phylo import (GTR, DiscreteGammaModel, create_model,
                                load_model, parse_newick, save_model,
                                write_newick)

MODELS = ["JC69", "K80", "F81", "HKY85", "TN93", "GTR"]


@pytest.fixture(scope="module", params=MODELS)
def model(request, fixtures_dir):
    return load_model(os.path.join(fixtures_dir,
                                   f"gg_97_otus_{request.param}.sm"))


class TestSubModels:
    def test_pr_is_stochastic(self, model):
        for v in (0.0, 0.01, 0.3, 2.0):
            P = model.Pr(v)
            np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-12)
            assert (P >= 0).all()

    def test_pr_identity_at_zero(self, model):
        np.testing.assert_allclose(model.Pr(0.0), np.eye(4), atol=1e-12)

    def test_detailed_balance(self, model):
        # time reversibility: pi_i P_ij(v) == pi_j P_ji(v)
        P = model.Pr(0.37)
        flux = model.pi[:, None] * P
        np.testing.assert_allclose(flux, flux.T, atol=1e-12)

    def test_stationary(self, model):
        # pi P(v) = pi
        P = model.Pr(1.3)
        np.testing.assert_allclose(model.pi @ P, model.pi, atol=1e-10)

    def test_chapman_kolmogorov(self, model):
        # P(a) P(b) = P(a+b)
        np.testing.assert_allclose(model.Pr(0.2) @ model.Pr(0.3),
                                   model.Pr(0.5), atol=1e-10)

    def test_batched_matches_scalar(self, model):
        vs = np.array([0.0, 0.05, 0.5, 1.7])
        Pb = model.Pr_batch(vs)
        assert Pb.shape == (4, 4, 4)
        for i, v in enumerate(vs):
            np.testing.assert_allclose(Pb[i], model.Pr(float(v)), atol=1e-14)

    def test_sm_roundtrip(self, model, tmp_path):
        p = str(tmp_path / "m.sm")
        save_model(model, p)
        back = load_model(p)
        np.testing.assert_allclose(back.pi, model.pi)
        np.testing.assert_allclose(back.Pr(0.1), model.Pr(0.1), atol=1e-12)

    def test_jax_tracing(self, model):
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda v: model.Pr_batch(v))
        out = np.asarray(f(jnp.array([0.1, 0.2])))
        # TPU default matmul runs bf16 passes; accept 1e-3 there, 1e-5 on cpu
        atol = 1e-5 if jax.devices()[0].platform == "cpu" else 2e-3
        np.testing.assert_allclose(out[0], model.Pr(0.1), atol=atol)


class TestGTRSpecifics:
    def test_reference_trace_scaling(self, fixtures_dir):
        gtr = load_model(os.path.join(fixtures_dir, "gg_97_otus_GTR.sm"))
        # the reference's GTR::setQfromParams normalizes Q by -trace(Q)
        # (scale's default pi=ones, DNASubModel.h:154 + GTR.cpp:131) —
        # NOT the pi-weighted unit-substitution rate; the shipped gg_97
        # DB's branch lengths are in that convention
        assert float(np.trace(gtr.Q)) == pytest.approx(-1.0)
        assert np.allclose(gtr.Q.sum(axis=1), 0.0, atol=1e-12)

    def test_training_recovers_params(self):
        rng = np.random.default_rng(3)
        true = load_model(os.path.join(os.path.dirname(__file__), "fixtures",
                                       "gg_97_otus_GTR.sm"))
        # simulate transition counts from P(v) at several branch lengths
        Pv = []
        for v in (0.05, 0.1, 0.2):
            P = true.Pr(v) * true.pi[:, None]
            Pv.append(P * 1e6)
        model = GTR()
        model.train(Pv, true.pi * 100)
        np.testing.assert_allclose(model.pi, true.pi, atol=1e-8)
        np.testing.assert_allclose(model.Q, true.Q, atol=0.05)


class TestDiscreteGamma:
    def test_rates_monotone_sum_one(self):
        # reference rates sum to 1 (DiscreteGammaModel.cpp:47-55)
        for alpha in (0.2, 0.5, 1.0, 5.0):
            dg = DiscreteGammaModel(alpha, 4)
            assert dg.r.sum() == pytest.approx(1.0, abs=1e-9)
            assert (np.diff(dg.r) > 0).all()
            assert dg.b[0] == 0 and math.isinf(dg.b[-1])

    def test_shape_moment(self):
        rng = np.random.default_rng(0)
        x = rng.gamma(2.0, 1.0, size=20000)
        # mutation counts: overdispersed Poisson; reference formula
        counts = rng.poisson(x * 5)
        est = DiscreteGammaModel.estimate_shape_moment(counts)
        assert 1.0 < est < 4.0


class TestNewick:
    def test_parse_fixture(self, fixtures_dir):
        t = parse_newick(open(os.path.join(fixtures_dir, "70_otus.tree")).read())
        assert t.num_nodes() == 249
        leaves = [n for n in t if n.is_leaf()]
        assert len(leaves) == 125

    def test_quoted_labels(self):
        t = parse_newick("(('a b':1,c):0.5,'it''s':2);")
        names = sorted(n.name for n in t if n.is_leaf())
        assert names == ["a b", "c", "it's"]

    def test_roundtrip(self, fixtures_dir):
        text = open(os.path.join(fixtures_dir, "70_otus.tree")).read()
        t = parse_newick(text)
        t2 = parse_newick(write_newick(t))
        pairs = [(a.name, a.length) for a in t]
        pairs2 = [(a.name, a.length) for a in t2]
        for (n1, l1), (n2, l2) in zip(pairs, pairs2):
            assert n1 == n2
            assert l1 == pytest.approx(l2, rel=1e-5)
