"""Mid-scale smoke: a synthetic 400-leaf DB through build + device
assignment.

The bundled 70_otus fixture has 125 rows; reference deployments run
against trees three orders larger (gg_97).  This test builds a
synthetic 400-leaf / ~800-node DB (bucketed union-window seed, larger
message tensors, deeper taxonomy) end to end and checks that batched
device placement recovers the generating clade for mutated leaf
reads.
"""

import os

import numpy as np
import pytest


def _simulate_tree(rng, n_leaves, length):
    """Random binary tree + JC-evolved ungapped alignment rows."""
    # start from a random root sequence, split lineages recursively
    names = []
    seqs = {}
    newick_parts = {}

    def evolve(seq, bl):
        out = seq.copy()
        mut = rng.random(len(seq)) < bl
        out[mut] = rng.integers(0, 4, int(mut.sum()))
        return out

    next_id = [0]

    def grow(seq, n):
        if n == 1:
            name = f"L{next_id[0]}"
            next_id[0] += 1
            names.append(name)
            seqs[name] = seq
            return name, f"{name}"
        nl = rng.integers(1, n)
        bl1 = float(rng.uniform(0.01, 0.08))
        bl2 = float(rng.uniform(0.01, 0.08))
        n1, s1 = grow(evolve(seq, bl1), int(nl))
        n2, s2 = grow(evolve(seq, bl2), int(n - nl))
        return n1, f"({s1}:{bl1:.4f},{s2}:{bl2:.4f})"

    root = rng.integers(0, 4, length)
    _, nwk = grow(root, n_leaves)
    return names, seqs, nwk + ";"


@pytest.fixture(scope="module")
def scale_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("scale")
    rng = np.random.default_rng(42)
    n_leaves, length = 400, 1200
    names, seqs, nwk = _simulate_tree(rng, n_leaves, length)
    with open(d / "msa.fasta", "w") as fh:
        for n in names:
            s = "".join("ACGT"[c] for c in seqs[n])
            fh.write(f">{n}\n{s}\n")
    with open(d / "tree.nwk", "w") as fh:
        fh.write(nwk)
    # two-level taxonomy split by tree order (left/right halves)
    with open(d / "tax.txt", "w") as fh:
        half = len(names) // 2
        for i, n in enumerate(names):
            phy = "p__Left" if i < half else "p__Right"
            fh.write(f"{n}\tk__Bacteria;{phy}\n")
    from hmmufotu_tpu.cli.build import main as build_main
    prefix = str(d / "db")
    assert build_main([str(d / "msa.fasta"), str(d / "tree.nwk"),
                       "-a", str(d / "tax.txt"), "-n", prefix,
                       "-s", "JC69"]) == 0
    return prefix, names, seqs


def test_scale_build_and_assign(scale_db):
    prefix, names, seqs = scale_db
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu.phylo.placement import DevicePlacer
    from hmmufotu_tpu import pipeline as pl

    db = Database.load(prefix)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    assert tree.num_nodes >= 2 * 400 - 1
    hmm.set_sequence_mode(NGCL)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    placer = DevicePlacer(tree, window=512)

    rng = np.random.default_rng(7)
    B = 24
    reads, want_tax = [], []
    # node names get replaced by annotations at build time; recover
    # the leaf <-> input-row mapping through the MSA row index
    msa_names = list(db.msa.names)
    leaf_ids = {msa_names[tree.msa_id[u]]: u
                for u in range(tree.num_nodes)
                if tree.is_leaf(u) and tree.msa_id[u] >= 0}
    for _ in range(B):
        name = names[int(rng.integers(0, len(names)))]
        codes = seqs[name]
        st = int(rng.integers(0, len(codes) - 260))
        piece = codes[st:st + 250].copy()
        mut = rng.random(len(piece)) < 0.01
        piece[mut] = rng.integers(0, 4, int(mut.sum()))
        reads.append("".join("ACGT"[c] for c in piece))
        want_tax.append(tree.anno[leaf_ids[name]])

    alns = pl.align_reads(aligner, csfm, reads, mode=NGCL, rng=rng)
    best = pl.assign_batch_device(tree, placer, alns)
    placed = [b for b in best if b is not None]
    assert len(placed) >= B - 2
    # the generating phylum (Left/Right clade) must be recovered for
    # the overwhelming majority of low-noise self reads
    n_ok = sum(
        1 for b, w in zip(best, want_tax)
        if b is not None and tree.anno[b.a_node].split(";p__")[-1]
        in w)
    assert n_ok >= int(0.8 * len(placed)), (n_ok, len(placed))
