"""END-TO-END on-chip assignment at reference (gg_97) DB scale.

Round-4's at-scale number (scripts/scale_assign.py) covered ONLY the
placement half: reads were synthesized pre-aligned in CS coordinates,
so the CSFM index over the ~405M-char concatenation, the K~6000
band-relative Pallas DP, and the csLen~6000 alignment build had never
run on the chip at reference shape.  This harness closes that gap
(VERDICT round-4 item #1): raw 250 bp read STRINGS flow through the
WHOLE production pipeline —

  CSFM seed lookup (batched FM backward search, host)
    -> band-relative K~6000 Pallas Viterbi DP (chip)
    -> in-kernel traceback + vectorized alignment build (host)
    -> window-resident SEP placement + Q values (chip)

via pipeline.assign_stream, the same double-buffered code path
`cli/assign` uses (reference loop: hmmufotu.cpp:603-751 +
HmmUFOtu_main.cpp:39-216).  The measured reads/s is therefore directly
comparable to the measured 1.1 s/read full-pipeline reference baseline
(scripts/scale_ref_baseline.py, BASELINE.md).

DB pieces are cached under --cache: the evaluated message window
(shared key with scale_assign.py), the CSFM index, and the HMM.

Usage (on the chip; ONE TPU process at a time; ~40 GB host RAM):
    python scripts/scale_e2e.py --leaves 75000 --length 6000 \
        --reads 20480 --batch 1024 --parity 128 --cache .bench/scale_cache
CPU smoke:
    JAX_PLATFORMS=cpu python scripts/scale_e2e.py --leaves 500 \
        --length 1200 --reads 256 --batch 128 --parity 8
"""

import argparse
import json
import os
import resource
import sys
import time


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench", "jaxcache"))

from scale_eval import synth_tree  # noqa: E402
from scale_assign import simulate_window_reads  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=75000)
    ap.add_argument("--length", type=int, default=6000)
    ap.add_argument("--reads", type=int, default=20480)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--span", type=int, default=1024,
                    help="resident site-window width Ws")
    ap.add_argument("--msg-dtype", default="f32",
                    choices=["bf16", "f32"])
    ap.add_argument("--model", default="GTR")
    ap.add_argument("--parity", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-nseed", type=int, default=50)
    ap.add_argument("--cache", default="",
                    help="dir caching msgs/CSFM/HMM between runs")
    ap.add_argument("--eval-only", action="store_true",
                    help="internal: evaluate + write the msg cache")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from hmmufotu_tpu.phylo.models import load_model, create_model
    from hmmufotu_tpu.phylo.placement import DevicePlacer
    from hmmufotu_tpu.hmm import GLOBAL, ProfileHMM, ViterbiAligner
    from hmmufotu_tpu.index import CSFMIndex
    from hmmufotu_tpu.mathx.dirichlet import HmmPrior
    from hmmufotu_tpu.msa import MSA
    from hmmufotu_tpu import pipeline as pl

    rng = np.random.default_rng(args.seed)
    res = {"backend": jax.default_backend(), "mode": "end_to_end",
           "leaves": args.leaves, "length": args.length,
           "msg_dtype": args.msg_dtype, "batch": args.batch,
           "read_len": args.read_len}

    # ---- tree + model (identical construction to scale_assign) ----------
    t0 = time.perf_counter()
    log("synth tree...")
    tree = synth_tree(args.leaves, args.length, args.seed)
    sm_path = os.path.join(REPO, "hmmufotu_tpu", "data",
                           f"gg_97_otus_{args.model}.sm")
    tree.model = load_model(sm_path) if os.path.exists(sm_path) \
        else create_model(args.model)
    tree.anno = [f"k__K;g__g{u % 97}" for u in range(tree.num_nodes)]
    res["n_nodes"] = tree.num_nodes
    leaves = np.nonzero(tree.has_seq)[0]
    res["t_synth_s"] = round(time.perf_counter() - t0, 1)

    # ---- MSA -> CSFM + HMM (cached) -------------------------------------
    key = f"{args.leaves}_{args.length}_{args.seed}"
    csfm_cache = hmm_cache = ""
    if args.cache:
        os.makedirs(args.cache, exist_ok=True)
        csfm_cache = os.path.join(args.cache, f"csfm_{key}.npz")
        hmm_cache = os.path.join(args.cache, f"hmm_{key}.hmm")
    lut = np.full(256, ord("-"), np.uint8)
    lut[:4] = np.frombuffer(b"ACGT", np.uint8)
    chars = lut[np.clip(tree.seqs[leaves], -2, 3).astype(np.int16) % 256]
    names = [tree.names[int(u)] for u in leaves]
    msa = MSA.from_arrays(names, chars, name="synth")
    tree.msa_id[leaves] = np.arange(len(leaves))
    del chars

    t0 = time.perf_counter()
    log("csfm...")
    if csfm_cache and os.path.exists(csfm_cache):
        csfm = CSFMIndex.load(csfm_cache)
        res["csfm_cached"] = True
    else:
        csfm = CSFMIndex.build(msa)
        if csfm_cache:
            csfm.save(csfm_cache)
    res["t_csfm_s"] = round(time.perf_counter() - t0, 1)
    res["csfm_chars"] = int(csfm.concat_len)

    t0 = time.perf_counter()
    log("hmm...")
    if hmm_cache and os.path.exists(hmm_cache):
        hmm = ProfileHMM.from_hmmer_file(hmm_cache)
        res["hmm_cached"] = True
    else:
        prior = HmmPrior.load(os.path.join(
            REPO, "hmmufotu_tpu", "data", "gg_97_otus.dm"))
        hmm = ProfileHMM.build(msa, 0.5, prior, name="synth")
        if hmm_cache:
            hmm.to_hmmer_file(hmm_cache)
    res["t_hmm_s"] = round(time.perf_counter() - t0, 1)
    res["K"] = hmm.K

    # ---- window-restricted evaluate (shared cache w/ scale_assign) ------
    L = args.length
    s_lo = max(0, (L - args.span) // 3)
    s_lo -= s_lo % 128
    Ws = min(args.span, L - s_lo)
    cache = ""
    if args.cache:
        cache = os.path.join(
            args.cache,
            f"msgs_{args.leaves}_{args.length}_{args.seed}_"
            f"{args.model}_{s_lo}_{Ws}.npz")
    t0 = time.perf_counter()
    if cache and not os.path.exists(cache) and not args.eval_only:
        # evaluate in a CPU-scrubbed subprocess (see scale_assign.py)
        import subprocess
        env = {k: v for k, v in os.environ.items()
               if k not in ("PALLAS_AXON_POOL_IPS",
                            "_JAX_PLATFORMS_PINNED")}
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--eval-only",
             "--leaves", str(args.leaves), "--length", str(args.length),
             "--seed", str(args.seed), "--model", args.model,
             "--span", str(args.span), "--cache", args.cache], env=env)
        if r.returncode:
            return r.returncode
    log("load msg cache...")
    if cache and os.path.exists(cache):
        z = np.load(cache)
        tree.msg_up = np.zeros((tree.num_nodes, 4, L), np.float32)
        tree.msg_down = np.zeros((tree.num_nodes, 4, L), np.float32)
        tree.msg_up[:, :, s_lo:s_lo + Ws] = z["up"]
        tree.msg_down[:, :, s_lo:s_lo + Ws] = z["down"]
        del z
        res["eval_cached"] = True
    else:
        tree.evaluate(dtype=np.float32, engine="jax",
                      budget_bytes=4 << 30, sites=(s_lo, s_lo + Ws))
        if cache:
            np.savez(cache,
                     up=tree.msg_up[:, :, s_lo:s_lo + Ws],
                     down=tree.msg_down[:, :, s_lo:s_lo + Ws])
    res["t_eval_s"] = round(time.perf_counter() - t0, 1)
    res["site_window"] = [int(s_lo), int(Ws)]
    if args.eval_only:
        print(json.dumps({"eval_only": True, **res}))
        return 0

    # ---- raw read strings from in-window leaf fragments -----------------
    # BEFORE infer_seq: simulate_window_reads samples has_seq nodes,
    # and reads must come from real LEAF genomes (an early round-5 run
    # sampled 40% of reads from argmax-inferred ancestor consensus
    # seqs, whose k-mers seed all over the 405M-char index -> wide
    # band spans, head alignments, and a 40% out-of-window fallback
    # rate that had nothing to do with the pipeline under test)
    t0 = time.perf_counter()
    log("simulate reads...")
    wins_full, starts_true, ends_true, leaf_ids = simulate_window_reads(
        tree, args.reads, s_lo, s_lo + Ws, args.read_len, rng)
    reads = []
    for r in range(args.reads):
        row = wins_full[r]
        reads.append("".join("ACGT"[c] for c in row[row >= 0]))
    res["t_simreads_s"] = round(time.perf_counter() - t0, 1)

    # ancestral seqs (reference hmmufotu-build runs inferSeq,
    # hmmufotu-build.cpp:466, so getSeed sweeps ALL non-root nodes);
    # exact within the resident window, which is where all seeding
    # happens in this workload
    t0 = time.perf_counter()
    log("infer_seq...")
    tree.infer_seq()
    res["t_inferseq_s"] = round(time.perf_counter() - t0, 1)

    # ---- production pipeline objects ------------------------------------
    log("aligner + placer staging...")
    hmm.set_sequence_mode(GLOBAL)   # assembled-read default, like the
    hmm.wing_retract()              # reference baseline run
    aligner = ViterbiAligner(hmm)
    msg_dtype = jnp.bfloat16 if args.msg_dtype == "bf16" else None
    t0 = time.perf_counter()
    placer = DevicePlacer(tree, window=args.window,
                          max_nseed=args.max_nseed,
                          msg_dtype=msg_dtype,
                          site_window=(int(s_lo), int(Ws)))
    jax.block_until_ready(placer.dt.msg_up)
    res["t_stage_s"] = round(time.perf_counter() - t0, 1)

    # count exact-host fallbacks (out-of-window alignments)
    n_host = [0]
    orig_assign_read = pl.assign_read

    def counting_assign_read(*a, **kw):
        n_host[0] += 1
        return orig_assign_read(*a, **kw)

    pl.assign_read = counting_assign_read
    os.environ["HMMUFOTU_TIMING"] = "1"
    from hmmufotu_tpu.hmm.viterbi import TIMING

    def stream(read_list, srng):
        n_done = n_valid = 0
        for alns, best in pl.assign_stream(
                aligner, csfm, tree, placer, read_list, args.batch,
                mode=GLOBAL, rng=srng):
            n_valid += sum(a.is_valid() for a in alns)
            n_done += sum(b is not None for b in best)
            log(f"  batch done ({n_done} placed)")
        return n_done, n_valid

    # ---- warmup (compile every jit specialization) ----------------------
    t0 = time.perf_counter()
    log("warmup (compile)...")
    stream(reads[:args.batch], np.random.default_rng(1))
    res["t_compile_s"] = round(time.perf_counter() - t0, 1)
    TIMING.clear()
    n_host[0] = 0

    # ---- timed end-to-end stream ----------------------------------------
    t0 = time.perf_counter()
    log("timed stream...")
    n_done, n_valid = stream(reads, np.random.default_rng(2))
    dt = time.perf_counter() - t0
    res["reads_total"] = args.reads
    res["reads_aligned"] = int(n_valid)
    res["reads_placed"] = int(n_done)
    res["host_fallback_reads"] = int(n_host[0])
    res["t_assign_s"] = round(dt, 2)
    res["reads_per_s"] = round(args.reads / dt, 1)
    res["align_substages_s"] = {k: round(v, 2)
                                for k, v in TIMING.items()}

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    if stats:
        res["hbm_peak_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    res["db_resident_gb"] = round(sum(
        a.nbytes for a in placer.dt if hasattr(a, "nbytes")) / 1e9, 2)
    try:
        res["hbm_live_gb"] = round(sum(
            x.nbytes for x in jax.live_arrays()) / 1e9, 2)
    except Exception:
        pass

    # ---- parity: first P production alignments vs exact host SEP -------
    P = min(args.parity, args.reads)
    if P:
        pl.assign_read = orig_assign_read
        sub = reads[:max(P, args.batch)]
        batches = []
        for alns, best in pl.assign_stream(
                aligner, csfm, tree, placer, sub, args.batch,
                mode=GLOBAL, rng=np.random.default_rng(2)):
            batches.append((alns, best))
        alns = [a for b in batches for a in b[0]][:P]
        best = [b for bb in batches for b in bb[1]][:P]
        n_match = n_leaf = n_both = n_trunc = n_trunc_mism = 0
        t0 = time.perf_counter()
        W = placer.W
        for r in range(P):
            if best[r] is None or not alns[r].is_valid():
                continue
            seq = pl.aln_to_digital(tree, alns[r])
            host = pl.assign_read(tree, alns[r], seq,
                                  max_nseed=args.max_nseed)
            if host is None:
                continue
            n_both += 1
            span = alns[r].cs_end - alns[r].cs_start + 1
            trunc = span > W       # device clamps the region to W cols
            n_trunc += int(trunc)
            if best[r].c_node == host.c_node:
                n_match += 1
            else:
                # this synthetic tree's 150k RANDOM leaves make window
                # logliks O(-250k/site * span); candidates within a few
                # f32 ULPs of each other argmax-flip between the device
                # and host summation orders.  Count as matching when
                # the host's pick beats the device's by less than f32
                # resolution at this magnitude (the real gg_97 tree's
                # related sequences sit orders of magnitude above this
                # floor; fixture categories are exact)
                ulp = abs(host.loglik) * 2.0 ** -23
                if host.loglik - best[r].loglik <= 8 * ulp:
                    n_match += 1
                else:
                    n_trunc_mism += int(trunc)
                    log(f"parity mismatch r{r}: dev {best[r].c_node} "
                        f"(ll {best[r].loglik:.1f}) host "
                        f"{host.c_node} (ll {host.loglik:.1f}) span "
                        f"{span}" + (" TRUNCATED" if trunc else ""))
            n_leaf += int(best[r].c_node == leaf_ids[r])
        res["t_parity_s"] = round(time.perf_counter() - t0, 1)
        res["parity_reads"] = int(n_both)
        res["parity_cnode_match"] = int(n_match)
        res["parity_span_gt_W"] = int(n_trunc)
        res["parity_mism_span_gt_W"] = int(n_trunc_mism)
        res["dev_hits_true_leaf"] = int(n_leaf)

    res["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    print(json.dumps(res))
    ok = (res.get("parity_cnode_match", 0) >= 0.95 * res.get(
        "parity_reads", 0)) if P else True
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
