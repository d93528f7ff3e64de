"""Host-side performance regression guards.

Round-2 shipped a 34x seed-stage slowdown that nothing in the suite
could catch (VERDICT r2 Weak #7).  These budgets are deliberately
loose (~10x headroom on a 2024 CPU) so they only trip on algorithmic
regressions (e.g. an accidental O(n) scan inside the per-LF-step rank),
never on machine noise.
"""

import time

import numpy as np
import pytest

from hmmufotu_tpu.index.csfm import CSFMIndex, suffix_array
from hmmufotu_tpu.msa import MSA

FIXTURE = "tests/fixtures/70_otus.fasta"


@pytest.fixture(scope="module")
def idx():
    msa = MSA.load_fasta(FIXTURE)
    msa.prune()
    return CSFMIndex.build(msa), msa


def _seed_kmers(msa, n=631, k=20, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        r = int(rng.integers(msa.num_seq))
        row = "".join(chr(c) for c in msa.chars[r].view(np.uint8)
                      if chr(c) not in "-._").upper()
        p = int(rng.integers(max(len(row) - k, 1)))
        out.append(row[p:p + k])
    return out


def test_seed_stage_budget(idx):
    """631 20-mer seed lookups must stay well under the round-1 dense
    path's ~5 ms (the compact path measures ~3 ms; round 2's regression
    was 172 ms)."""
    index, msa = idx
    pats = _seed_kmers(msa)
    index.batch_locate_one(pats, rng=np.random.default_rng(1))  # warmup
    best = min(
        _timed(lambda: index.batch_locate_one(
            pats, rng=np.random.default_rng(1)))
        for _ in range(3))
    assert best < 0.050, f"seed stage took {best * 1e3:.1f} ms (>50 ms)"


def test_rank_is_o1_per_query(idx):
    """rank cost must not scale with position within the text: the
    round-2 bug was a 128-wide tail scan per query."""
    index, _ = idx
    n = index.bwt_len
    lo = np.zeros(4096, dtype=np.int64)
    hi = np.full(4096, n - 1, dtype=np.int64)
    b = np.ones(4096, dtype=np.int64)
    index._rank(b, lo), index._rank(b, hi)  # warmup
    t_lo = min(_timed(lambda: index._rank(b, lo)) for _ in range(5))
    t_hi = min(_timed(lambda: index._rank(b, hi)) for _ in range(5))
    assert t_hi < 10 * max(t_lo, 1e-6)


def test_index_compactness_synthetic_scale():
    """Rank structures must stay <= 1 B/char, full index (incl. the
    inherent 1 B/char sampled SA) <= 2.5 B/char, at a scale where
    constant overheads vanish (reference: ~0.5 B/char RRR/WT +
    1 B/char sampled SA, CSFMIndex.cpp:338-364)."""
    rng = np.random.default_rng(7)
    concat = rng.integers(1, 5, size=2_000_000).astype(np.int8)
    concat[rng.integers(0, len(concat), 2000)] = 0
    concat[-1] = 0
    sa = suffix_array(concat)
    idx = CSFMIndex()
    idx.concat_len = len(concat) - 1
    idx.bwt = np.where(sa == 0, 0, concat[sa - 1]).astype(np.int8)
    mask = sa % 4 == 0
    idx.sampled_rows = np.nonzero(mask)[0]
    idx.sampled_vals = sa[mask].astype(np.uint32)
    n = idx.bwt_len
    rank_bytes = idx.bwt_bits.nbytes + idx.occ_ckpt.nbytes
    total = (rank_bytes + idx.sa_mark.nbytes + idx.sa_rank.nbytes
             + idx.sampled_vals.nbytes)
    assert rank_bytes / n <= 1.0, f"rank structs {rank_bytes / n:.2f} B/char"
    assert total / n <= 2.5, f"index structs {total / n:.2f} B/char"
    # and the compact rank agrees with brute force at this scale
    bwt = idx.bwt
    pos = rng.integers(0, n, 64)
    for b in range(5):
        got = idx._rank(np.full(64, b), pos)
        want = np.cumsum(bwt == b)[pos]
        assert (got == want).all()


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_tree_mp_merge_budget():
    """merge_mp_candidates at gg_97-scale batch shape (B=2048, C=50,
    8 shards) must stay far below the ~1 s/batch device placement it
    merges for — the round-3 per-read/per-lane python loops would
    serialize the whole capacity mode (VERDICT r3 Weak #4)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from scale_eval import synth_tree
    from hmmufotu_tpu import pipeline as pl

    tree = synth_tree(256, 64, seed=3)
    tree.anno = [f"g{u % 37}" for u in range(tree.num_nodes)]
    rng = np.random.default_rng(0)
    B, C, S = 2048, 50, 8
    CS = C * S
    N = tree.num_nodes
    union = {
        "cand": rng.integers(1, N, (B, CS)),
        "c_dist": rng.random((B, CS), np.float32),
        "est_loglik": -rng.random((B, CS), np.float32) * 30,
        "loglik": -1000 - rng.random((B, CS), np.float32) * 30,
        "ratio": rng.random((B, CS), np.float32),
        "wnr": rng.random((B, CS), np.float32) * 0.1,
        "w0": rng.random((B, CS), np.float32) * 0.2 + 0.01,
        "live": (rng.random((B, CS)) < 0.8).astype(np.float32),
    }
    valid = np.ones(B, bool)
    starts = np.zeros(B, np.int64)
    ends = np.full(B, 63, np.int64)
    t = _timed(lambda: pl.merge_mp_candidates(
        tree, union, valid, starts, ends, C=C))
    assert t < 3.0, f"tree-MP merge took {t:.2f}s for B={B}"
