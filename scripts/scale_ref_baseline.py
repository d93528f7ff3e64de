"""MEASURED reference-binary baseline at gg_97 DB scale.

Round 3's ">=10x at reference scale" argument rested on a derived
150-450 reads/s estimate for 16-thread reference hmmufotu on a
150k-node DB.  This script measures it: build the same synthetic
gg_97-shape database scale_assign.py uses, WRITE it in the reference's
own 4-file binary layout (io/reference_format — full-scale .ptu
round-trip was validated in round 3), and time the shim-built
reference binary (scripts/ref_build) assigning simulated reads from
it.  Per-read cost is isolated from the ~7 min 58 GB DB load by
differencing two run sizes.

Usage (needs ~90 GB RAM, ~65 GB disk, ~40 min):
    python scripts/scale_ref_baseline.py --leaves 75000 --length 6000
Smoke:
    python scripts/scale_ref_baseline.py --leaves 500 --length 1200 \
        --reads-small 4 --reads-large 32
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_eval import synth_tree  # noqa: E402
from scale_assign import simulate_window_reads  # noqa: E402

REF_BIN = os.path.join(REPO, "scripts", "ref_build", "build",
                       "hmmufotu")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=75000)
    ap.add_argument("--length", type=int, default=6000)
    ap.add_argument("--reads-small", type=int, default=16)
    ap.add_argument("--reads-large", type=int, default=144)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/scale_ref")
    ap.add_argument("--keep", action="store_true",
                    help="keep the DB files (~60 GB at full scale)")
    args = ap.parse_args(argv)

    if not os.path.exists(REF_BIN):
        print("reference binary missing; run "
              "scripts/ref_build/build_reference.sh first",
              file=sys.stderr)
        return 1
    os.makedirs(args.workdir, exist_ok=True)
    prefix = os.path.join(args.workdir, "synth_db")
    res = {"leaves": args.leaves, "length": args.length,
           "threads": args.threads}

    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import ProfileHMM
    from hmmufotu_tpu.index import CSFMIndex
    from hmmufotu_tpu.io.reference_format import save_reference_db
    from hmmufotu_tpu.mathx.dirichlet import HmmPrior
    from hmmufotu_tpu.msa import MSA
    from hmmufotu_tpu.phylo.models import load_model

    # ---- synthetic DB at gg_97 shape ------------------------------------
    t0 = time.perf_counter()
    tree = synth_tree(args.leaves, args.length, args.seed)
    tree.model = load_model(os.path.join(
        REPO, "hmmufotu_tpu", "data", "gg_97_otus_GTR.sm"))
    tree.anno = [f"k__K;g__g{u % 97}" for u in range(tree.num_nodes)]
    leaves = np.nonzero(tree.has_seq)[0]
    lut = np.full(256, ord("-"), np.uint8)
    lut[:4] = np.frombuffer(b"ACGT", np.uint8)
    chars = lut[np.clip(tree.seqs[leaves], -2, 3).astype(np.int16) % 256]
    names = [tree.names[int(u)] for u in leaves]
    msa = MSA.from_arrays(names, chars, name="synth")
    tree.msa_id[leaves] = np.arange(len(leaves))
    res["t_synth_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    csfm = CSFMIndex.build(msa)
    res["t_csfm_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    prior = HmmPrior.load(os.path.join(
        REPO, "hmmufotu_tpu", "data", "gg_97_otus.dm"))
    hmm = ProfileHMM.build(msa, 0.5, prior, name="synth")
    res["t_hmm_s"] = round(time.perf_counter() - t0, 1)
    res["K"] = hmm.K

    t0 = time.perf_counter()
    tree.evaluate(dtype=np.float32, engine="jax", budget_bytes=4 << 30)
    # ancestral seqs so the reference's getSeed sees internal nodes
    # too (hmmufotu-build runs inferSeq, hmmufotu-build.cpp:466)
    tree.infer_seq()
    res["t_eval_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    db = Database(msa, csfm, hmm, tree)
    save_reference_db(db, prefix)
    res["t_save_s"] = round(time.perf_counter() - t0, 1)
    res["ptu_gb"] = round(os.path.getsize(prefix + ".ptu") / 1e9, 2)

    # ---- simulated reads -------------------------------------------------
    rng = np.random.default_rng(args.seed + 1)
    n = args.reads_large
    wins, starts, ends, leaf_ids = simulate_window_reads(
        tree, n, 0, args.length, args.read_len, rng)
    for sz, fn in ((args.reads_small, "small.fa"),
                   (args.reads_large, "large.fa")):
        with open(os.path.join(args.workdir, fn), "w") as fh:
            for r in range(sz):
                row = wins[r]
                seq = "".join("ACGT"[c] for c in row[row >= 0])
                fh.write(f">r{r} leaf={leaf_ids[r]}\n{seq}\n")

    # free host memory before the reference loads its 58 GB copy
    del tree, db, msa, csfm, hmm
    import gc
    gc.collect()

    # ---- time the reference binary --------------------------------------
    env = dict(os.environ)
    times = {}
    for name, fn in (("small", "small.fa"), ("large", "large.fa")):
        t0 = time.perf_counter()
        r = subprocess.run(
            [REF_BIN, prefix, os.path.join(args.workdir, fn),
             "-o", os.path.join(args.workdir, f"out_{name}.tsv"),
             "-s", "1", "-p", str(args.threads)],
            env=env, capture_output=True, text=True)
        times[name] = time.perf_counter() - t0
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            res[f"ref_{name}_rc"] = r.returncode
            print(json.dumps(res))
            return 1
        rows = sum(1 for ln in open(
            os.path.join(args.workdir, f"out_{name}.tsv"))
            if not ln.startswith("#") and not ln.startswith("id\t"))
        res[f"ref_{name}_rows"] = rows
        res[f"ref_{name}_wall_s"] = round(times[name], 1)

    dn = args.reads_large - args.reads_small
    per_read = (times["large"] - times["small"]) / dn
    res["ref_ms_per_read"] = round(per_read * 1e3, 1)
    res["ref_reads_per_s"] = round(1.0 / per_read, 2)
    res["ref_reads_per_s_16t_scaled"] = round(
        16.0 / args.threads / per_read, 1)
    res["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    if not args.keep:
        for ext in (".msa", ".csfm", ".hmm", ".ptu"):
            try:
                os.unlink(prefix + ext)
            except OSError:
                pass
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
