#!/usr/bin/env python
"""Reference-BINARY golden parity (VERDICT round-4 item #2).

Every parity number before round 5 was against tests/oracle/ — this
framework's own f64 transcription of the reference math.  This script
closes the loop against the ACTUAL reference binary built from its
unmodified sources (scripts/ref_build): one framework-built database
is serialized both ways (npz for cli/assign, the reference's 4-file
binary layout for the reference hmmufotu), the same simulated reads
run through both, and the TSVs are compared category-for-category
(taxon annotation + branch id), mirroring BASELINE.json configs #1
(70_otus JC69 no-dGamma, SE reads) and #2 (GTR+dGamma4, PE reads,
jplace).

Node ids are directly comparable because save_reference_ptu preserves
the framework's node numbering, so the reference binary reports
branch/taxon ids in the SAME id space (reference
PhyloTreeUnrooted.cpp StreamPtr round-trip keeps ids).

Usage:
    env -u PALLAS_AXON_POOL_IPS -u _JAX_PLATFORMS_PINNED \
        JAX_PLATFORMS=cpu python scripts/ref_parity.py [-n N]

Prints a summary to stdout (paste into PARITY.md) and exits non-zero
only on harness failure, not on mismatches (mismatches are triaged by
hand like the oracle sweep).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

FIXTURES = os.path.join(REPO, "tests", "fixtures")
REF_DIR = os.path.join(REPO, "scripts", "ref_build", "build")


def parse_tsv(path):
    """id -> dict of column values for one hmmufotu-format TSV."""
    rows = {}
    header = None
    for ln in open(path):
        if ln.startswith("#"):
            continue
        parts = ln.rstrip("\n").split("\t")
        if header is None:
            header = parts
            continue
        d = dict(zip(header, parts))
        rows[d["id"]] = d
    return rows


def compare(ref_rows, fw_rows, tag, report):
    """Category-for-category comparison of two assignment TSVs."""
    ids = sorted(set(ref_rows) | set(fw_rows))
    st = dict(tag=tag, n=len(ids), only_ref=0, only_fw=0,
              aln_mismatch=0, branch_mismatch=0, taxon_mismatch=0,
              loglik_close=0)
    for rid in ids:
        r, f = ref_rows.get(rid), fw_rows.get(rid)
        if r is None or f is None:
            # one side refused to place (no seed / filtered): count
            st["only_ref" if f is None else "only_fw"] += 1
            side = "ref" if f is None else "fw"
            report.append((tag, rid, f"placed only by {side}"))
            continue
        if r.get("alignment") != f.get("alignment"):
            st["aln_mismatch"] += 1
            report.append((tag, rid,
                           f"aln ref cs[{r['CS_start']},{r['CS_end']}]"
                           f" cost {r['cost']} vs fw "
                           f"cs[{f['CS_start']},{f['CS_end']}] cost "
                           f"{f['cost']}"))
        if r.get("branch_id") != f.get("branch_id"):
            st["branch_mismatch"] += 1
            report.append((tag, rid,
                           f"branch ref {r['branch_id']} "
                           f"(ll {r['loglik']}, Q {r.get('Q_placement')})"
                           f" vs fw {f['branch_id']} (ll {f['loglik']},"
                           f" Q {f.get('Q_placement')})"))
        if r.get("taxon_anno") != f.get("taxon_anno"):
            st["taxon_mismatch"] += 1
            report.append((tag, rid,
                           f"taxon ref '{r['taxon_anno']}' vs fw "
                           f"'{f['taxon_anno']}'"))
        try:
            if abs(float(r["loglik"]) - float(f["loglik"])) < 1.0:
                st["loglik_close"] += 1
        except (KeyError, ValueError):
            pass
    return st


def jplace_fields(path):
    """Load a jplace file -> {read_name: placement row dict}."""
    doc = json.load(open(path))
    fields = doc["fields"]
    out = {}
    for p in doc["placements"]:
        names = p.get("nm") or p.get("n")
        row = p["p"][0]
        for nm in names:
            if isinstance(nm, list):  # nm entries are [name, mult]
                nm = nm[0]
            out[nm] = dict(zip(fields, row))
    return out, fields


def compare_jplace(ref_path, fw_path, report):
    ref, rf = jplace_fields(ref_path)
    fw, ff = jplace_fields(fw_path)
    st = dict(tag="jplace", n=len(set(ref) | set(fw)),
              field_order_equal=(rf == ff), edge_mismatch=0,
              only_ref=0, only_fw=0, like_close=0)
    for nm in sorted(set(ref) | set(fw)):
        r, f = ref.get(nm), fw.get(nm)
        if r is None or f is None:
            st["only_ref" if f is None else "only_fw"] += 1
            continue
        if int(r["edge_num"]) != int(f["edge_num"]):
            st["edge_mismatch"] += 1
            report.append(("jplace", nm,
                           f"edge ref {r['edge_num']} vs fw "
                           f"{f['edge_num']}"))
        if abs(r["likelihood"] - f["likelihood"]) < 1.0:
            st["like_close"] += 1
    return st


def run(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        print("FAILED:", " ".join(cmd), file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        sys.exit(1)
    return r


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=500,
                    help="reads per configuration")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)

    ref_bin = os.path.join(REF_DIR, "hmmufotu")
    if not os.path.exists(ref_bin):
        print("reference binary missing; run "
              "scripts/ref_build/build_reference.sh", file=sys.stderr)
        return 1

    from hmmufotu_tpu.cli.build import main as build_main
    from hmmufotu_tpu.cli.sim import main as sim_main
    from hmmufotu_tpu.cli.assign import main as assign_main
    from hmmufotu_tpu.cli.jplace import main as jplace_main
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.io.reference_format import save_reference_db

    wd = args.workdir or tempfile.mkdtemp(prefix="ref_parity_")
    os.makedirs(wd, exist_ok=True)
    report = []
    summaries = []

    configs = [
        ("jc69_se", ["-s", "JC69"], False),
        ("gtr_dg4_pe", ["-s", "GTR", "-V"], True),
    ]
    for tag, build_flags, paired in configs:
        prefix = os.path.join(wd, tag)
        if not os.path.exists(prefix + ".ptu.npz"):
            rc = build_main([
                os.path.join(FIXTURES, "70_otus.fasta"),
                os.path.join(FIXTURES, "70_otus.tree"),
                "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
                "-n", prefix] + build_flags)
            assert rc == 0
            # one build, two serializations
            save_reference_db(Database.load(prefix), prefix)

        reads = os.path.join(wd, f"{tag}_reads.fa")
        mates = os.path.join(wd, f"{tag}_mates.fa")
        sim_args = [prefix, reads, "-N", str(args.n),
                    "-S", str(args.seed), "--mean-size", "300",
                    "--sd-size", "20"]
        if paired:
            sim_args += ["-m", mates, "-l", "150"]
        assert sim_main(sim_args) == 0

        ref_out = os.path.join(wd, f"{tag}_ref.tsv")
        fw_out = os.path.join(wd, f"{tag}_fw.tsv")
        ref_cmd = [ref_bin, prefix, reads]
        fw_cmd = [prefix, reads]
        if paired:
            ref_cmd.append(mates)
            fw_cmd.append(mates)
        # -s 1: reads are first-strand by construction; skips the
        # strand autodetect (which is itself seed-order dependent)
        run(ref_cmd + ["-o", ref_out, "-s", "1", "-S", "1", "-p", "2"])
        # two framework runs: default (true-loglik posterior ranking,
        # the reference's documented intent) and --ref-rank (emulating
        # the binary's effective estimate-stage ordering after its
        # placeSeq loglik bug — see PARITY.md)
        assert assign_main(fw_cmd + ["-o", fw_out, "-s", "1",
                                     "-S", "1"]) == 0
        summaries.append(compare(parse_tsv(ref_out),
                                 parse_tsv(fw_out), tag, report))
        fw_rr = os.path.join(wd, f"{tag}_fw_refrank.tsv")
        assert assign_main(fw_cmd + ["-o", fw_rr, "-s", "1",
                                     "-S", "1", "--ref-rank"]) == 0
        summaries.append(compare(parse_tsv(ref_out),
                                 parse_tsv(fw_rr),
                                 tag + "+refrank", report))

        if paired:
            # jplace parity: reference converter (built with the json
            # shim) vs cli/jplace, each on ITS OWN assignment TSV —
            # the framework side uses the --ref-rank TSV so the edge
            # comparison isolates the jplace conversion rather than
            # re-measuring the ranking difference
            ref_jp = os.path.join(REF_DIR, "hmmufotu-jplace")
            if os.path.exists(ref_jp):
                rj = os.path.join(wd, f"{tag}_ref.jplace")
                fj = os.path.join(wd, f"{tag}_fw.jplace")
                run([ref_jp, prefix, ref_out, "-o", rj])
                assert jplace_main([prefix, fw_rr, "-o", fj]) == 0
                summaries.append(compare_jplace(rj, fj, report))

    print("\n== reference-binary parity summary ==")
    for st in summaries:
        print(json.dumps(st))
    if report:
        print(f"\n== {len(report)} mismatch details ==")
        for tag, rid, msg in report[:200]:
            print(f"[{tag}] {rid}: {msg}")
    print(f"\nworkdir: {wd}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
