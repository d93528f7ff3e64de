#!/usr/bin/env python
"""Regenerate the golden parity files FROM THE ORACLE.

The golden values come from tests/oracle/ — the independent f64
transcription of the reference algorithms — NOT from the production
stack, so the golden tests in tests/test_pipeline.py check production
against an independent implementation rather than against themselves.

Outputs:
- tests/golden_assign_categories.tsv   (GTR DB, 40 SE reads, seed 0)
- tests/golden_jplace_pe.tsv           (GTR+dG4 DB, 20 PE reads, seed 5)

Run:
    env -u PALLAS_AXON_POOL_IPS -u _JAX_PLATFORMS_PINNED \
        JAX_PLATFORMS=cpu python scripts/regen_goldens.py
"""

import os
import sys
import tempfile
import pathlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def regen_se_categories(out_path):
    from test_oracle_parity import ParityHarness, build_db
    from hmmufotu_tpu.hmm import NGCL
    from hmmufotu_tpu.cli.sim import main as sim_main
    from hmmufotu_tpu.seq import read_seqs

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="golden_se_"))
    prefix = build_db(tmp, "GTR", False)
    fasta = str(tmp / "sim.fasta")
    assert sim_main([prefix, fasta, "-N", "40", "-S", "0",
                     "--mean-size", "300", "--sd-size", "20"]) == 0
    reads = list(read_seqs(fasta))
    h = ParityHarness(prefix, NGCL)
    anno = h.db.ptu.anno
    rows = []
    for r in reads:
        aln = h.oracle_align(r.seq)
        best, places = h.oracle_place_all(aln)
        # tie-equivalent branches: same taxon, posterior within a
        # knife-edge of the top (f32 device vs f64 oracle can resolve
        # exact posterior ties either way)
        ties = sorted({f"{p.c_node}->{p.p_node}" for p in places
                       if abs(p.q_place - best.q_place) < 0.05
                       and anno[p.a_node] == anno[best.a_node]})
        rows.append((r.id, f"{best.c_node}->{best.p_node}",
                     str(best.a_node), ",".join(ties)))
    with open(out_path, "w") as fh:
        fh.write("# ORACLE-GENERATED golden (scripts/regen_goldens.py): "
                 "GTR 70_otus DB, sim -N 40 -S 0, oracle alignment + "
                 "oracle SEP placement (tests/oracle/, independent f64 "
                 "transcription of the reference algorithms).  "
                 "tie_branches = candidates whose posterior ties the "
                 "best within 0.05 qPlace at the same taxon.\n")
        fh.write("id\tbranch_id\ttaxon_id\ttie_branches\n")
        for row in rows:
            fh.write("\t".join(row) + "\n")
    print(f"wrote {out_path} ({len(rows)} rows)")


def regen_pe_jplace(out_path):
    from test_oracle_parity import ParityHarness, build_db
    from hmmufotu_tpu.hmm import GLOBAL
    from hmmufotu_tpu.alphabet import DNA
    from hmmufotu_tpu.cli.sim import main as sim_main
    from hmmufotu_tpu.seq import read_seqs

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="golden_pe_"))
    prefix = build_db(tmp, "GTR", True)
    fwd_f = str(tmp / "sim_R1.fasta")
    rev_f = str(tmp / "sim_R2.fasta")
    assert sim_main([prefix, fwd_f, "-m", rev_f, "-N", "20", "-S", "5",
                     "--mean-size", "300", "--sd-size", "20"]) == 0
    fwd = list(read_seqs(fwd_f))
    rev = list(read_seqs(rev_f))
    h = ParityHarness(prefix, GLOBAL)
    rows = []
    for fr, rr in zip(fwd, rev):
        aln = h.oracle_align(fr.seq)
        raln = h.oracle_align(DNA.revcom(rr.seq))
        if aln.cs_start <= raln.cs_start and aln.cs_end <= raln.cs_end:
            aln.merge(raln)
        best = h.oracle_place(aln)
        # jplace fields (reference JPlace ctor, HmmUFOtu_main.cpp:241-247)
        edge_len = best.wuv
        distal = edge_len * best.ratio
        proximal = edge_len * (1 - best.ratio)
        anno_dist = best.get_anno_dist()
        pendant = (anno_dist - distal) if best.ratio <= 0.5 \
            else (anno_dist - proximal)
        lwr = 1.0 if best.q_place >= 250 else 10 ** (-best.q_place / 10)
        rows.append((fr.id, str(best.c_node), str(best.a_node),
                     f"{best.loglik:.3f}", f"{distal:.6f}",
                     f"{pendant:.6f}", f"{1 - lwr:.6f}"))
    with open(out_path, "w") as fh:
        fh.write("# ORACLE-GENERATED golden (scripts/regen_goldens.py): "
                 "GTR+dG4 70_otus DB, PE sim -N 20 -S 5, oracle "
                 "alignment+merge + oracle SEP placement; jplace fields "
                 "per reference JPlace (HmmUFOtu_main.cpp:241-247)\n")
        fh.write("id\tedge_num\ttaxon_id\tlikelihood\tdistal_length\t"
                 "pendant_length\tone_minus_lwr\n")
        for row in rows:
            fh.write("\t".join(row) + "\n")
    print(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    tests = os.path.join(REPO, "tests")
    regen_se_categories(os.path.join(tests,
                                     "golden_assign_categories.tsv"))
    regen_pe_jplace(os.path.join(tests, "golden_jplace_pe.tsv"))
