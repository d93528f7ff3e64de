"""End-to-end pipeline + OTU + CLI tests.

Mirrors the reference's shell-pipeline smoke tests
(reference test/sim-run-SE-t.sh / sim-run-PE-t.sh: sim -> assign ->
sum -> subset/norm/merge closed loop) plus device-vs-host placement
agreement, with the simulator as the accuracy oracle (SURVEY.md §4).
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from hmmufotu_tpu.otu import OTUTable

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def db_prefix(tmp_path_factory):
    """Build the 70_otus DB once for the module."""
    d = tmp_path_factory.mktemp("db")
    prefix = str(d / "70_otus")
    from hmmufotu_tpu.cli.build import main as build_main
    rc = build_main([
        os.path.join(FIXTURES, "70_otus.fasta"),
        os.path.join(FIXTURES, "70_otus.tree"),
        "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
        "-n", prefix, "-s", "GTR",
    ])
    assert rc == 0
    return prefix


@pytest.fixture(scope="module")
def sim_reads(db_prefix, tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    out = str(d / "sim_SE.fasta")
    from hmmufotu_tpu.cli.sim import main as sim_main
    rc = sim_main([db_prefix, out, "-N", "30", "-S", "0",
                   "--mean-size", "300", "--sd-size", "20"])
    assert rc == 0
    return out


@pytest.fixture(scope="module")
def assignment(db_prefix, sim_reads, tmp_path_factory):
    d = tmp_path_factory.mktemp("assign")
    out = str(d / "assign.tsv")
    from hmmufotu_tpu.cli.assign import main as assign_main
    rc = assign_main([db_prefix, sim_reads, "-o", out, "-S", "0"])
    assert rc == 0
    return out


class TestClosedLoop:
    def test_assignment_accuracy(self, assignment):
        """Simulated reads must be placed on (or next to) the true
        branch — the simulator is the accuracy oracle."""
        hits = total = 0
        for line in open(assignment):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            m = re.search(r"branchID=(\d+)->(\d+)", f[1])
            total += 1
            tb = {m.group(1), m.group(2)}
            pb = set(f[10].split("->")) if "->" in f[10] else set()
            hits += bool(tb & pb)
        assert total == 30
        assert hits >= int(0.85 * total)

    def test_sum(self, db_prefix, assignment, tmp_path):
        from hmmufotu_tpu.cli.sum import main as sum_main
        table = str(tmp_path / "otu.tsv")
        cs = str(tmp_path / "otus.fasta")
        tree = str(tmp_path / "otus.tree")
        rc = sum_main([db_prefix, assignment, "-o", table, "-c", cs,
                       "-t", tree])
        assert rc == 0
        tab = OTUTable.load_table(table)
        assert tab.num_otus > 0 and tab.num_samples == 1
        assert tab.metric.sum() <= 30
        assert open(cs).read().startswith(">OTU_")
        newick = open(tree).read()
        assert newick.endswith(";") \
            and newick.count("(") == newick.count(")")

    def test_subset_norm_merge(self, db_prefix, assignment, tmp_path):
        from hmmufotu_tpu.cli.sum import main as sum_main
        from hmmufotu_tpu.cli.subset import main as subset_main
        from hmmufotu_tpu.cli.norm import main as norm_main
        from hmmufotu_tpu.cli.merge import main as merge_main
        table = str(tmp_path / "otu.tsv")
        assert sum_main([db_prefix, assignment, "-o", table]) == 0
        sub = str(tmp_path / "sub.tsv")
        assert subset_main([table, sub, "-n", "5", "-S", "0"]) == 0
        t = OTUTable.load_table(sub)
        assert t.metric.sum(axis=0).max() <= 5
        norm = str(tmp_path / "norm.tsv")
        assert norm_main([table, norm, "-Z", "1"]) == 0
        t = OTUTable.load_table(norm)
        np.testing.assert_allclose(t.metric.sum(axis=0), 1.0,
                                   rtol=1e-4)  # %g text roundtrip
        merged = str(tmp_path / "merged.tsv")
        assert merge_main([table, sub, "-o", merged]) == 0
        t0 = OTUTable.load_table(table)
        tm = OTUTable.load_table(merged)
        assert tm.metric.sum() == pytest.approx(
            t0.metric.sum() + OTUTable.load_table(sub).metric.sum())

    def test_jplace(self, db_prefix, assignment, tmp_path):
        from hmmufotu_tpu.cli.jplace import main as jplace_main
        out = str(tmp_path / "out.jplace")
        assert jplace_main([db_prefix, assignment, "-o", out]) == 0
        doc = json.load(open(out))
        assert doc["version"] == 3
        assert doc["fields"][0] == "edge_num"
        assert len(doc["placements"]) == 30
        assert "{" in doc["tree"]
        for p in doc["placements"]:
            row = p["p"][0]
            assert len(row) == 6
            assert row[1] < 0  # likelihood negative

    def test_inspect(self, db_prefix, capsys):
        from hmmufotu_tpu.cli.inspect import main as inspect_main
        assert inspect_main([db_prefix]) == 0
        out = capsys.readouterr().out
        assert "tree log-likelihood" in out


class TestDevicePlacement:
    def test_device_matches_host(self, db_prefix):
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        from hmmufotu_tpu import pipeline as pl
        tree = Database.load(db_prefix).ptu
        rng = np.random.default_rng(1)
        leaves = [u for u in range(tree.num_nodes)
                  if tree.is_leaf(u) and tree.msa_id[u] >= 0]
        B = 8
        seqs = np.full((B, tree.cs_len), -2, dtype=np.int8)
        starts = np.zeros(B, np.int32)
        ends = np.zeros(B, np.int32)
        for r in range(B):
            u = int(rng.choice(leaves))
            codes = tree.seqs[u]
            pos = np.nonzero(codes >= 0)[0]
            st = int(rng.integers(0, max(1, len(pos) - 210)))
            w = pos[st:st + 200]
            piece = codes[w].copy()
            mut = rng.random(len(piece)) < 0.02
            piece[mut] = rng.integers(0, 4, int(mut.sum()))
            seqs[r, w] = piece
            starts[r], ends[r] = w[0], w[-1]
        placer = DevicePlacer(tree, window=384)
        out = placer.place_batch(seqs, starts, ends)
        for r in range(B):
            dev_best = out["cand"][r][out["loglik"][r].argmax()]
            locs = pl.get_seed(tree, seqs[r], int(starts[r]),
                               int(ends[r]))
            places = pl.estimate_seq(tree, seqs[r], locs)
            places = pl.filter_placements(places)
            places = pl.place_seq(tree, seqs[r], places)
            places.sort(key=lambda p: -p.loglik)
            assert dev_best == places[0].c_node
            # loglik agreement within f32 tolerance
            assert out["loglik"][r].max() == pytest.approx(
                places[0].loglik, rel=1e-3, abs=0.5)

    def test_fused_sep_kernel_matches_xla(self, db_prefix):
        """The single-kernel Pallas 3-branch optimization
        (phylo/pallas_place.py, interpret mode on CPU) must agree
        with the XLA while_loop path lane for lane."""
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        tree = Database.load(db_prefix).ptu
        rng = np.random.default_rng(3)
        leaves = [u for u in range(tree.num_nodes)
                  if tree.is_leaf(u) and tree.msa_id[u] >= 0]
        B = 4
        seqs = np.full((B, tree.cs_len), -2, dtype=np.int8)
        starts = np.zeros(B, np.int32)
        ends = np.zeros(B, np.int32)
        for r in range(B):
            u = int(rng.choice(leaves))
            codes = tree.seqs[u]
            pos = np.nonzero(codes >= 0)[0]
            st = int(rng.integers(0, max(1, len(pos) - 210)))
            w = pos[st:st + 200]
            piece = codes[w].copy()
            mut = rng.random(len(piece)) < 0.02
            piece[mut] = rng.integers(0, 4, int(mut.sum()))
            seqs[r, w] = piece
            starts[r], ends[r] = w[0], w[-1]
        px = DevicePlacer(tree, window=256, max_nseed=20,
                          sep_pallas=False, fp_pallas=False)
        pk = DevicePlacer(tree, window=256, max_nseed=20,
                          sep_pallas=True)
        ox = px.place_batch(seqs, starts, ends)
        ok = pk.place_batch(seqs, starts, ends)
        np.testing.assert_array_equal(ox["cand"], ok["cand"])
        live = ox["live"]
        np.testing.assert_allclose(ox["ratio"][live], ok["ratio"][live],
                                   atol=2e-3)
        np.testing.assert_allclose(ox["wnr"][live], ok["wnr"][live],
                                   atol=2e-3)
        np.testing.assert_allclose(ox["loglik"][live],
                                   ok["loglik"][live],
                                   rtol=1e-4, atol=0.5)
        # best-placement summaries pick the same nodes
        np.testing.assert_array_equal(ox["summary"][:, :3],
                                      ok["summary"][:, :3])


class TestWindowResidentPlacer:
    """Single-chip capacity mode: site-window-resident message tensors
    (DeviceTree.from_tree site_window) must reproduce the full-length
    placer exactly — the window covers every read, so every gathered
    quantity is identical."""

    def _reads(self, tree, B=8, seed=5):
        rng = np.random.default_rng(seed)
        leaves = [u for u in range(tree.num_nodes)
                  if tree.is_leaf(u) and tree.msa_id[u] >= 0]
        seqs = np.full((B, tree.cs_len), -2, dtype=np.int8)
        starts = np.zeros(B, np.int32)
        ends = np.zeros(B, np.int32)
        for r in range(B):
            u = int(rng.choice(leaves))
            codes = tree.seqs[u]
            pos = np.nonzero(codes >= 0)[0]
            st = int(rng.integers(0, max(1, len(pos) - 210)))
            w = pos[st:st + 200]
            piece = codes[w].copy()
            mut = rng.random(len(piece)) < 0.02
            piece[mut] = rng.integers(0, 4, int(mut.sum()))
            seqs[r, w] = piece
            starts[r], ends[r] = w[0], w[-1]
        return seqs, starts, ends

    def test_matches_full(self, db_prefix):
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        tree = Database.load(db_prefix).ptu
        seqs, starts, ends = self._reads(tree)
        full = DevicePlacer(tree, window=384)
        # resident window = the run's union span, like the scale path
        s0, Ws = full.union_window(starts)
        win = DevicePlacer(tree, window=384, site_window=(s0, Ws))
        assert win.dt.msg_up.shape[2] == min(Ws, tree.cs_len - s0)
        assert win.dt.seq1h is not None
        of = full.place_batch(seqs, starts, ends)
        ow = win.place_batch(seqs, starts, ends)
        np.testing.assert_array_equal(of["cand"], ow["cand"])
        np.testing.assert_array_equal(of["c_dist"], ow["c_dist"])
        live = of["live"]
        np.testing.assert_allclose(of["loglik"][live],
                                   ow["loglik"][live],
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(of["summary"][:, :3],
                                      ow["summary"][:, :3])

    def test_out_of_window_rejected(self, db_prefix):
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.phylo.placement import (DevicePlacer,
                                                  OutOfWindowError)
        tree = Database.load(db_prefix).ptu
        seqs, starts, ends = self._reads(tree, B=4)
        win = DevicePlacer(tree, window=384,
                           site_window=(int(starts.min()), 384))
        bad = starts.copy()
        bad[2] = 0 if starts.min() > 0 else tree.cs_len - 200
        with pytest.raises(OutOfWindowError) as ei:
            win.place_batch(seqs, bad, ends)
        assert 2 in ei.value.rows

    def test_bf16_messages(self, db_prefix):
        """bf16 message storage (the gg_97 HBM plan) keeps the same
        candidate selection; logliks agree to bf16 tolerance."""
        import jax.numpy as jnp
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        tree = Database.load(db_prefix).ptu
        seqs, starts, ends = self._reads(tree, B=6, seed=9)
        full = DevicePlacer(tree, window=384)
        s0, Ws = full.union_window(starts)
        win = DevicePlacer(tree, window=384, site_window=(s0, Ws),
                           msg_dtype=jnp.bfloat16)
        of = full.place_batch(seqs, starts, ends)
        ow = win.place_batch(seqs, starts, ends)
        # seed p-dist doesn't touch messages, so the candidate SET is
        # identical; the grid ORDER is est-loglik-ranked (take_c
        # compaction) and est near-ties may flip under bf16 message
        # quantization — compare per-read sorted sets
        np.testing.assert_array_equal(np.sort(of["cand"], axis=1),
                                      np.sort(ow["cand"], axis=1))
        # align win's slots to full's candidate ids before comparing
        # per-candidate logliks
        for b in range(len(seqs)):
            perm = np.argsort(ow["cand"][b])[
                np.searchsorted(np.sort(ow["cand"][b]), of["cand"][b])]
            live = of["live"][b]
            np.testing.assert_allclose(of["loglik"][b][live],
                                       ow["loglik"][b][perm][live],
                                       rtol=5e-3, atol=3.0)


class TestResidentWindowInvalidRow:
    """A batch containing an unalignable read must not crash a
    resident-window run whose window starts past column 0: the invalid
    row keeps starts=0 from _aln_windows, which would trip
    dispatch_win's window check unless neutralized (round-5 advisor
    high finding)."""

    def test_invalid_row_offset_window(self, db_prefix):
        from hmmufotu_tpu import pipeline as pl
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.hmm.profile import HmmAlignment
        from hmmufotu_tpu.hmm.viterbi import ViterbiAligner
        from hmmufotu_tpu.phylo.placement import DevicePlacer
        from hmmufotu_tpu.alphabet import get_alphabet
        db = Database.load(db_prefix)
        tree, abc = db.ptu, get_alphabet("dna")
        aligner = ViterbiAligner(db.hmm)
        rng = np.random.default_rng(11)
        leaves = [u for u in range(tree.num_nodes)
                  if tree.is_leaf(u) and tree.msa_id[u] >= 0]
        reads = []
        for _ in range(4):
            codes = tree.seqs[int(rng.choice(leaves))]
            pos = np.nonzero(codes >= 0)[0]
            # bias toward the tail so aligned starts land past col 128
            w = pos[len(pos) // 2:len(pos) // 2 + 180]
            reads.append(abc.decode(codes[w]))
        alns = pl.align_reads(aligner, db.csfm, reads)
        assert all(a.is_valid() for a in alns)
        # one unalignable read: align_batch yields a default-invalid
        # HmmAlignment for reads the DP rejects
        alns.append(HmmAlignment())
        starts = np.array([a.cs_start - 1 for a in alns[:-1]])
        s0 = max(128, int(starts.min()) - int(starts.min()) % 128)
        Ws = min(tree.cs_len - s0, 512)
        placer = DevicePlacer(tree, window=384, site_window=(s0, Ws))
        handle = pl.dispatch_place_batch(tree, placer, alns)
        results = pl.collect_place_batch(handle)
        assert results[-1] is None          # invalid row: no placement
        assert sum(p is not None for p in results[:-1]) >= 3


class TestResidentWindowCLI:
    """assign --resident-window: the single-chip capacity mode must
    reproduce default output (full window = byte-identical; small
    window = same taxa via the exact host fallback for out-of-window
    reads)."""

    def test_cli_resident_window(self, db_prefix, tmp_path):
        from hmmufotu_tpu.cli.assign import main as assign_main
        from hmmufotu_tpu.cli.sim import main as sim_main
        from hmmufotu_tpu.db import Database
        reads = str(tmp_path / "r.fa")
        assert sim_main([db_prefix, reads, "-N", "24", "-S", "3",
                         "--mean-size", "250", "--sd-size", "10"]) == 0
        base = str(tmp_path / "base.tsv")
        assert assign_main([db_prefix, reads, "-o", base]) == 0
        L = Database.load(db_prefix).ptu.cs_len

        def rows(p):
            return [ln for ln in open(p)
                    if not ln.startswith("#")
                    and not ln.startswith("id\t")]

        full = str(tmp_path / "full.tsv")
        assert assign_main([db_prefix, reads, "-o", full,
                            "--resident-window", str(L)]) == 0
        assert rows(base) == rows(full)     # byte-identical

        small = str(tmp_path / "small.tsv")
        assert assign_main([db_prefix, reads, "-o", small,
                            "--resident-window", "512"]) == 0
        taxa = lambda rws: [r.split("\t")[13] for r in rws]
        assert taxa(rows(base)) == taxa(rows(small))


class TestOTUTable:
    def test_roundtrip_and_ops(self, tmp_path):
        t = OTUTable()
        t.add_sample("s1")
        t.add_sample("s2")
        t.add_otu("OTU_1", "k__A", np.array([3.0, 1.0]))
        t.add_otu("OTU_2", "k__B", np.array([0.0, 5.0]))
        p = str(tmp_path / "t.tsv")
        t.save_table(p)
        back = OTUTable.load_table(p)
        assert back.samples == ["s1", "s2"]
        np.testing.assert_allclose(back.metric, t.metric)
        assert back.get_taxon("OTU_2") == "k__B"
        # merge aligns names
        t2 = OTUTable()
        t2.add_sample("s2")
        t2.add_otu("OTU_2", "k__B", np.array([2.0]))
        t2.add_otu("OTU_3", "k__C", np.array([1.0]))
        t += t2
        assert t.num_otus == 3
        assert t.metric[t.otus.index("OTU_2"),
                        t.samples.index("s2")] == 7.0

    def test_rarefaction(self):
        rng = np.random.default_rng(0)
        t = OTUTable()
        t.add_sample("s")
        for i in range(5):
            t.add_otu(f"O{i}", "t", np.array([20.0]))
        t.subset_uniform(50, rng)
        assert t.metric.sum() == 50
        t2 = OTUTable()
        t2.add_sample("s")
        for i in range(5):
            t2.add_otu(f"O{i}", "t", np.array([20.0]))
        t2.subset_multinom(50, rng)
        assert t2.metric.sum() == 50


class TestPairedEnd:
    def test_pe_closed_loop(self, db_prefix, tmp_path):
        """PE sim -> assign with mate merge (reference
        test/sim-run-PE-t.sh)."""
        from hmmufotu_tpu.cli.sim import main as sim_main
        from hmmufotu_tpu.cli.assign import main as assign_main
        fwd = str(tmp_path / "pe_1.fasta")
        rev = str(tmp_path / "pe_2.fasta")
        out = str(tmp_path / "assign_pe.tsv")
        assert sim_main([db_prefix, fwd, "-m", rev, "-N", "15",
                         "-S", "7", "--mean-size", "400",
                         "--sd-size", "20", "-l", "150"]) == 0
        assert assign_main([db_prefix, fwd, rev, "-o", out,
                            "-S", "0"]) == 0
        hits = total = 0
        for line in open(out):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            m = re.search(r"branchID=(\d+)->(\d+)", f[1])
            total += 1
            tb = {m.group(1), m.group(2)}
            pb = set(f[10].split("->")) if "->" in f[10] else set()
            hits += bool(tb & pb)
        assert total >= 10  # some reads may be flagged chimera
        assert hits >= int(0.7 * total)


class TestPseudoTree:
    def test_add_pseudo_leaf(self, db_prefix):
        from hmmufotu_tpu.db import Database
        tree = Database.load(db_prefix).ptu
        internal = [u for u in range(tree.num_nodes)
                    if not tree.is_leaf(u) and tree.parent[u] >= 0][:3]
        n0 = tree.num_nodes
        added = tree.add_pseudo_leaf(set(internal))
        assert added == 6
        assert tree.num_nodes == n0 + 6
        for u in internal:
            # the OTU id now names a 0-length leaf
            assert tree.is_leaf(u)
            assert tree.brlen[u] == 0
            r = int(tree.parent[u])
            assert r >= n0
            # r holds the old branch and sits where u did
            assert len(tree.children_of(r)) == 2
        s = tree.to_newick()
        assert s.count("(") == s.count(")")


class TestDeterminism:
    def test_assign_deterministic(self, db_prefix, sim_reads, tmp_path):
        """Two runs with the same seed must produce byte-identical
        assignments (the reference's -S reproducibility contract)."""
        from hmmufotu_tpu.cli.assign import main as assign_main
        out1 = str(tmp_path / "a1.tsv")
        out2 = str(tmp_path / "a2.tsv")
        assert assign_main([db_prefix, sim_reads, "-o", out1,
                            "-S", "11"]) == 0
        assert assign_main([db_prefix, sim_reads, "-o", out2,
                            "-S", "11"]) == 0
        body1 = [l for l in open(out1) if not l.startswith("#")]
        body2 = [l for l in open(out2) if not l.startswith("#")]
        assert body1 == body2

    def test_sim_deterministic(self, db_prefix, tmp_path):
        from hmmufotu_tpu.cli.sim import main as sim_main
        o1 = str(tmp_path / "s1.fasta")
        o2 = str(tmp_path / "s2.fasta")
        assert sim_main([db_prefix, o1, "-N", "10", "-S", "3"]) == 0
        assert sim_main([db_prefix, o2, "-N", "10", "-S", "3"]) == 0
        assert open(o1).read() == open(o2).read()


class TestResume:
    def test_assign_resume_appends(self, db_prefix, sim_reads,
                                   tmp_path):
        from hmmufotu_tpu.cli.assign import main as assign_main
        full = str(tmp_path / "full.tsv")
        part = str(tmp_path / "part.tsv")
        assert assign_main([db_prefix, sim_reads, "-o", full,
                            "-S", "5"]) == 0
        # build a partial output: first 10 body rows only
        lines = open(full).readlines()
        head = [l for l in lines if l.startswith("#")
                or l.startswith("id\t")]
        body = [l for l in lines if l not in head]
        with open(part, "w") as fh:
            fh.writelines(head + body[:10])
        assert assign_main([db_prefix, sim_reads, "-o", part,
                            "-S", "5", "--resume"]) == 0
        got = sorted(l.split("\t")[0] for l in open(part)
                     if not l.startswith("#")
                     and not l.startswith("id\t"))
        want = sorted(l.split("\t")[0] for l in body)
        assert got == want


class TestDGammaPE:
    """BASELINE config #2: GTR + discrete-Gamma-4 DB, paired-end
    reads, jplace output."""

    @pytest.fixture(scope="class")
    def dg_db(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("dgdb")
        prefix = str(d / "70_otus_dg")
        from hmmufotu_tpu.cli.build import main as build_main
        rc = build_main([
            os.path.join(FIXTURES, "70_otus.fasta"),
            os.path.join(FIXTURES, "70_otus.tree"),
            "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
            "-n", prefix, "-s", "GTR", "-V", "-k", "4",
        ])
        assert rc == 0
        return prefix

    def test_dg_model_saved(self, dg_db):
        from hmmufotu_tpu.db import Database
        tree = Database.load(dg_db).ptu
        assert tree.dg is not None
        assert tree.dg.k == 4
        assert tree.dg.alpha > 0

    def test_pe_assign_jplace(self, dg_db, tmp_path):
        from hmmufotu_tpu.cli.sim import main as sim_main
        from hmmufotu_tpu.cli.assign import main as assign_main
        from hmmufotu_tpu.cli.jplace import main as jplace_main
        fwd = str(tmp_path / "pe_1.fasta")
        rev = str(tmp_path / "pe_2.fasta")
        out = str(tmp_path / "a.tsv")
        jp = str(tmp_path / "a.jplace")
        assert sim_main([dg_db, fwd, "-m", rev, "-N", "12", "-S", "2",
                         "--mean-size", "400", "--sd-size", "20",
                         "-l", "150"]) == 0
        assert assign_main([dg_db, fwd, rev, "-o", out,
                            "-S", "0"]) == 0
        assert jplace_main([dg_db, out, "-o", jp, "--sm"]) == 0
        doc = json.load(open(jp))
        assert doc["metadata"]["substitution_model"] == "GTR"
        assert doc["metadata"]["among_site_rate_variation"] \
            == "Discrete Gamma model"
        assert len(doc["placements"]) >= 8
        # accuracy vs sim truth
        hits = total = 0
        for line in open(out):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            m = re.search(r"branchID=(\d+)->(\d+)", f[1])
            if f[10] == "NULL":
                continue
            total += 1
            hits += bool({m.group(1), m.group(2)}
                         & set(f[10].split("->")))
        assert total >= 8
        assert hits >= int(0.7 * total)


class TestChimera:
    def test_chimera_detection(self, db_prefix, tmp_path):
        """A synthetic chimera (5' of one distant taxon + 3' of
        another) should be flagged; clean reads should not."""
        from hmmufotu_tpu.db import Database
        from hmmufotu_tpu.cli.assign import main as assign_main
        tree = Database.load(db_prefix).ptu
        rng = np.random.default_rng(4)
        leaves = [u for u in range(tree.num_nodes)
                  if tree.is_leaf(u) and tree.msa_id[u] >= 0]
        # pick two distant leaves (different kingdoms if possible)
        arch = [u for u in leaves if tree.anno[u].startswith("k__Arch")]
        bact = [u for u in leaves if tree.anno[u].startswith("k__Bact")]
        u5, u3 = arch[0], bact[0]

        def ungapped(u, lo, n):
            codes = tree.seqs[u]
            pos = np.nonzero(codes >= 0)[0]
            return "".join("ACGT"[c] for c in codes[pos[lo:lo + n]])

        # a contiguous chimera: the 3' half continues at the SAME
        # ungapped offset in the other taxon, so one banded alignment
        # covers the junction (a disjoint-region construction lets the
        # aligner clamp to one half, after which both segments
        # legitimately agree and no chimera exists to detect)
        chimera = ungapped(u5, 10, 120) + ungapped(u3, 130, 120)
        clean = ungapped(u3, 400, 240)
        reads = str(tmp_path / "chim.fasta")
        with open(reads, "w") as fh:
            fh.write(f">chimera\n{chimera}\n>clean\n{clean}\n")
        out = str(tmp_path / "chim.tsv")
        chi = str(tmp_path / "chim_only.tsv")
        assert assign_main([db_prefix, reads, "-o", out, "-C",
                            "--chimera-out", chi, "-S", "0",
                            "-s", "1"]) == 0
        body = {l.split("\t")[0]: l for l in open(out)
                if not l.startswith("#") and not l.startswith("id\t")}
        chim_rows = {l.split("\t")[0] for l in open(chi)
                     if not l.startswith("#")
                     and not l.startswith("id\t")}
        # the clean read must be assigned in the main output
        assert "clean" in body
        assert body["clean"].split("\t")[10] != "NULL"
        # the chimera must be flagged (diverted to the chimera output)
        assert "chimera" in chim_rows
        assert "chimera" not in body


class TestGoldenCategories:
    def test_assignments_match_golden(self, tmp_path):
        """Category parity vs the ORACLE-generated golden: the
        production CLI (deterministic seed selection, no -S) must
        recover the branch and taxon the independent f64 oracle
        (tests/oracle/) assigns per read
        (tests/golden_assign_categories.tsv, written by
        scripts/regen_goldens.py)."""
        from hmmufotu_tpu.cli.build import main as build_main
        from hmmufotu_tpu.cli.sim import main as sim_main
        from hmmufotu_tpu.cli.assign import main as assign_main
        db = str(tmp_path / "gdb")
        reads = str(tmp_path / "r.fasta")
        out = str(tmp_path / "a.tsv")
        assert build_main([
            os.path.join(FIXTURES, "70_otus.fasta"),
            os.path.join(FIXTURES, "70_otus.tree"),
            "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
            "-n", db, "-s", "GTR"]) == 0
        assert sim_main([db, reads, "-N", "40", "-S", "0",
                         "--mean-size", "300", "--sd-size", "20"]) == 0
        assert assign_main([db, reads, "-o", out]) == 0
        got = {}
        for line in open(out):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            got[f[0]] = (f[10], f[12])
        gpath = os.path.join(os.path.dirname(__file__),
                             "golden_assign_categories.tsv")
        n = 0
        for line in open(gpath):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            rid, taxon, ties = f[0], f[2], f[3].split(",")
            assert rid in got, rid
            g_branch, g_taxon = got[rid]
            assert g_taxon == taxon, (rid, g_taxon, taxon)
            # branch must be the oracle's pick or a tie-equivalent
            assert g_branch in ties, (rid, g_branch, ties)
            n += 1
        assert n == 40 and len(got) == 40

    def test_pe_jplace_matches_golden(self, tmp_path):
        """GTR+dG4 paired-end jplace parity vs the ORACLE-generated
        golden (tests/golden_jplace_pe.tsv): edge ids must match
        exactly; lengths/likelihoods within f32-device tolerance."""
        import json
        from hmmufotu_tpu.cli.build import main as build_main
        from hmmufotu_tpu.cli.sim import main as sim_main
        from hmmufotu_tpu.cli.assign import main as assign_main
        from hmmufotu_tpu.cli.jplace import main as jplace_main
        db = str(tmp_path / "gdb")
        r1 = str(tmp_path / "r1.fasta")
        r2 = str(tmp_path / "r2.fasta")
        tsv = str(tmp_path / "a.tsv")
        jp = str(tmp_path / "a.jplace")
        assert build_main([
            os.path.join(FIXTURES, "70_otus.fasta"),
            os.path.join(FIXTURES, "70_otus.tree"),
            "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
            "-n", db, "-s", "GTR", "-V"]) == 0
        assert sim_main([db, r1, "-m", r2, "-N", "20", "-S", "5",
                         "--mean-size", "300", "--sd-size", "20"]) == 0
        assert assign_main([db, r1, r2, "-o", tsv]) == 0
        assert jplace_main([db, tsv, "-o", jp]) == 0
        doc = json.load(open(jp))
        fields = doc["fields"]
        i_edge = fields.index("edge_num")
        i_like = fields.index("likelihood")
        i_dist = fields.index("distal_length")
        i_pend = fields.index("pendant_length")
        got = {}
        for pl_row in doc["placements"]:
            name = pl_row.get("n", pl_row.get("nm"))[0]
            if isinstance(name, list):
                name = name[0]
            p = pl_row["p"][0]
            got[name] = (p[i_edge], p[i_like], p[i_dist], p[i_pend])
        gpath = os.path.join(os.path.dirname(__file__),
                             "golden_jplace_pe.tsv")
        n_checked = 0
        for line in open(gpath):
            if line.startswith("#") or line.startswith("id\t"):
                continue
            f = line.rstrip("\n").split("\t")
            name, edge = f[0], int(f[1])
            like, dist, pend = float(f[3]), float(f[4]), float(f[5])
            assert name in got, name
            g = got[name]
            assert g[0] == edge, (name, g[0], edge)
            # the assignment TSV prints loglik with %g (6 significant
            # digits) before jplace conversion — tolerance covers that
            assert abs(g[1] - like) <= max(0.05, 1e-5 * abs(like)), name
            assert abs(g[2] - dist) <= 1e-4, name
            assert abs(g[3] - pend) <= 1e-4, name
            n_checked += 1
        assert n_checked == 20
