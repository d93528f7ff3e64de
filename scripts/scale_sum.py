"""Config #5 shape smoke: multi-sample OTU aggregation at >=100k
reads/sample (VERDICT round-4 stretch item #9).

The OTU aggregation path (assign TSV -> per-sample `sum` -> cross-
sample `merge`; reference hmmufotu-sum.cpp:347-419 + hmmufotu-merge)
had only toy-size coverage.  This harness runs it at the config-#5
shape: 3 samples x N reads each.  Assignment rows are amplified from
a REAL fixture assign run (the aggregation path consumes TSVs; the
assign stage's own scale is measured by scale_e2e.py on the chip), so
the sum/merge code sees realistic category mixes, Q values, and
alignment strings at full row count.

Usage:
    JAX_PLATFORMS=cpu python scripts/scale_sum.py [--reads 100000]
"""

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100000)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--base-reads", type=int, default=1000)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args(argv)

    from hmmufotu_tpu.cli.build import main as build_main
    from hmmufotu_tpu.cli.sim import main as sim_main
    from hmmufotu_tpu.cli.assign import main as assign_main
    from hmmufotu_tpu.cli.sum import main as sum_main
    from hmmufotu_tpu.cli.merge import main as merge_main

    wd = args.workdir or tempfile.mkdtemp(prefix="scale_sum_")
    os.makedirs(wd, exist_ok=True)
    res = {"samples": args.samples, "reads_per_sample": args.reads}

    prefix = os.path.join(wd, "db")
    if not os.path.exists(prefix + ".ptu.npz"):
        assert build_main([
            os.path.join(FIXTURES, "70_otus.fasta"),
            os.path.join(FIXTURES, "70_otus.tree"),
            "-a", os.path.join(FIXTURES, "70_otus_taxonomy.txt"),
            "-n", prefix, "-s", "GTR", "-V"]) == 0

    # one real assign run provides the row pool
    reads_fa = os.path.join(wd, "base.fa")
    base_tsv = os.path.join(wd, "base.tsv")
    t0 = time.perf_counter()
    assert sim_main([prefix, reads_fa, "-N", str(args.base_reads),
                     "-S", "1"]) == 0
    assert assign_main([prefix, reads_fa, "-o", base_tsv,
                        "-S", "1", "-s", "1"]) == 0
    res["t_base_assign_s"] = round(time.perf_counter() - t0, 1)

    header = []
    pool = []
    for ln in open(base_tsv):
        if ln.startswith("#"):
            header.append(ln)
        elif ln.startswith("id\t"):
            header.append(ln)
        else:
            pool.append(ln)
    res["pool_rows"] = len(pool)

    # amplify: each sample samples rows with replacement and renames
    # ids (unique per sample), preserving all category/Q columns
    rng = np.random.default_rng(0)
    tsvs = []
    t0 = time.perf_counter()
    for s in range(args.samples):
        p = os.path.join(wd, f"sample{s}.tsv")
        tsvs.append(p)
        idx = rng.integers(0, len(pool), args.reads)
        with open(p, "w") as fh:
            fh.writelines(header)
            for r, i in enumerate(idx):
                parts = pool[i].split("\t", 1)
                fh.write(f"s{s}_r{r}\t{parts[1]}")
    res["t_amplify_s"] = round(time.perf_counter() - t0, 1)

    # per-sample sum (OTU table + read list + consensus seqs + tree)
    t0 = time.perf_counter()
    tables = []
    for s, p in enumerate(tsvs):
        out = os.path.join(wd, f"otu{s}.tsv")
        tables.append(out)
        assert sum_main([prefix, p, "-o", out,
                         "-l", os.path.join(wd, f"rl{s}.tsv"),
                         "-c", os.path.join(wd, f"cs{s}.fasta"),
                         "-t", os.path.join(wd, f"tree{s}.nwk")]) == 0
    res["t_sum_s"] = round(time.perf_counter() - t0, 1)

    # cross-sample merge (+ merged OTU tree)
    t0 = time.perf_counter()
    merged = os.path.join(wd, "merged.tsv")
    assert merge_main(tables + ["-o", merged, "-db", prefix,
                                "-t", os.path.join(wd, "merged.nwk")]) == 0
    res["t_merge_s"] = round(time.perf_counter() - t0, 1)

    # validate: merged counts == total reads
    total = 0.0
    n_otus = 0
    with open(merged) as fh:
        hdr = None
        for ln in fh:
            if ln.startswith("#"):
                continue
            parts = ln.rstrip("\n").split("\t")
            if hdr is None:
                hdr = parts
                continue
            n_otus += 1
            total += sum(float(x) for x in parts[1:-1])
    res["merged_otus"] = n_otus
    res["merged_total_reads"] = int(total)
    expect = args.samples * args.reads
    res["rows_expected"] = expect
    res["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    print(json.dumps(res))
    # unassigned reads are excluded by sum, so total <= expect but
    # must account for every ASSIGNED row
    return 0 if 0 < total <= expect else 1


if __name__ == "__main__":
    sys.exit(main())
