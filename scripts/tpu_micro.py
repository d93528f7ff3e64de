"""Parameterized micro-timing of the device hot kernels on the chip.

One script replaces the round-3 trio (tpu_micro / tpu_micro2 /
tpu_micro3).  Stages (select with --stage, default runs dp + place):

  dp        — banded-split DP Pallas kernel (viterbi_pallas_traced_split)
  dp-full   — full-width DP kernel (viterbi_pallas_traced)
  dp-dl     — DP kernel + fresh combined-result download (delta = link)
  dp-loop   — N timed iterations with fresh downloads + checksums
              (guards against cached-host-copy lies)
  place     — full device placement at --window, est kernel on AND off
  place-prof— jax.profiler trace of one placement call, per-op device
              durations parsed from the perfetto JSON

Env knobs compose (run them via --env KEY=VAL), e.g. the traceback
share = dp vs dp with HMMUFOTU_TRACE_STEPS=8.

Run on the chip — ONE TPU process at a time:
    python scripts/tpu_micro.py --stage dp --stage place
    python scripts/tpu_micro.py --stage dp --env HMMUFOTU_TRACE_STEPS=8
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".bench", "jaxcache"))


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def setup(batch):
    import jax
    from bench import ensure_db, simulate_reads, DB_PREFIX
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu import pipeline as pl

    ensure_db()
    db = Database.load(DB_PREFIX)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    hmm.set_sequence_mode(NGCL)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    rng = np.random.default_rng(0)
    reads = simulate_reads(tree, rng, batch)
    vpaths = pl.batch_find_seed_vpaths(hmm, csfm, reads, mode=NGCL,
                                       rng=rng)
    handle = aligner.dispatch_batch(reads, vpaths)
    (_, _, _, n_rows, codes, lengths, regions, _,
     score, mi, mj, choices) = handle
    jax.block_until_ready(score)
    return aligner, tree, handle, (codes, lengths, regions, n_rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", action="append", default=[],
                    choices=["dp", "dp-full", "dp-dl", "dp-loop",
                             "place", "place-prof", "sep-trips"])
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6,
                    help="dp-loop iterations")
    ap.add_argument("--env", action="append", default=[],
                    help="KEY=VAL set before jax init")
    args = ap.parse_args(argv)
    stages = args.stage or ["dp", "place"]
    for kv in args.env:
        k, _, v = kv.partition("=")
        os.environ[k] = v

    import jax
    import jax.numpy as jnp
    from hmmufotu_tpu.pipeline import _aln_windows
    from hmmufotu_tpu.phylo.placement import DevicePlacer
    from hmmufotu_tpu.hmm.pallas_viterbi import (
        viterbi_pallas_traced, viterbi_pallas_traced_split)

    aligner, tree, handle, dp_in = setup(args.batch)
    codes, lengths, regions, n_rows = dp_in
    dh = aligner.dh
    print(f"inputs: B={codes.shape[0]} n_rows={n_rows} "
          f"K={aligner.hmm.K}", file=sys.stderr)

    def run_dp_split():
        s, comb = viterbi_pallas_traced_split(dh, codes, lengths,
                                              regions, n_rows)
        jax.block_until_ready((s, comb))

    if "dp" in stages:
        run_dp_split()
        print(f"dp_split_kernel_s {timed(run_dp_split):.4f}",
              flush=True)

    if "dp-full" in stages:
        def run_dp_full():
            s, comb = viterbi_pallas_traced(
                dh, jnp.asarray(codes), jnp.asarray(lengths),
                jnp.asarray(regions), n_rows)
            jax.block_until_ready((s, comb))
        run_dp_full()
        print(f"dp_full_kernel_s {timed(run_dp_full):.4f}", flush=True)

    if "dp-dl" in stages:
        run_dp_split()
        t_dp = timed(run_dp_split)

        def run_dp_dl():
            s, comb = viterbi_pallas_traced_split(dh, codes, lengths,
                                                  regions, n_rows)
            np.asarray(comb)   # fresh array each call = real transfer
        print(f"dp_download_s {max(timed(run_dp_dl) - t_dp, 0.0):.4f}",
              flush=True)

    if "dp-loop" in stages:
        for it in range(args.iters):
            t0 = time.time()
            s, comb = viterbi_pallas_traced_split(
                dh, codes, lengths, regions, n_rows)
            jax.block_until_ready((s, comb))
            t1 = time.time()
            s_h, comb_h = np.asarray(s), np.asarray(comb)
            t2 = time.time()
            print(f"iter{it}: kernel {t1 - t0:.4f}s download "
                  f"{t2 - t1:.4f}s finite {np.isfinite(s_h).mean():.3f}"
                  f" comb_sum {int(comb_h.sum()) & 0xFFFFFFFF:08x}",
                  flush=True)

    if {"place", "place-prof", "sep-trips"} & set(stages):
        alns = aligner.finalize_batch(handle)

    if "place" in stages:
        for est in (True, False):
            placer = DevicePlacer(tree, window=args.window,
                                  est_kernel=est)
            seqs, starts, ends, valid = _aln_windows(tree, placer, alns)

            def run_place():
                placer.place_batch_win(seqs, starts, ends,
                                       summary_only=True)
            run_place()
            print(f"place_estk{int(est)}_s {timed(run_place):.4f}",
                  flush=True)

    if "sep-trips" in stages:
        import math as _m
        import jax.numpy as jnp
        from hmmufotu_tpu.phylo.placement import place_batch_device
        placer = DevicePlacer(tree, window=args.window)
        seqs, starts, ends, valid = _aln_windows(tree, placer, alns)
        ends = np.minimum(ends, starts + placer.W - 1)
        s0, Ws = placer.union_window(starts)
        out = place_batch_device(
            placer.dt, jnp.asarray(seqs, jnp.int8),
            jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32),
            placer.pr_fn, _m.inf, _m.inf, 20.0, placer.W, placer.C,
            placer.n_rates, tree.cs_len, False, False,
            placer.fp_pallas, True, placer.eig,
            s0=jnp.asarray(s0, jnp.int32), Ws=Ws, debug_trips=True)
        trips = np.asarray(out["sep_trips"])     # [B, C, 2] per-program
        live = np.asarray(out["sep_live"])
        prog = trips.reshape(-1, 2)[::8]   # one entry per program
        o, i = prog[:, 0], prog[:, 1]
        print(f"programs {len(o)} live_lanes "
              f"{live.sum()}/{live.size}")
        print(f"outer trips: mean {o.mean():.1f} p50 "
              f"{np.percentile(o, 50):.0f} p90 {np.percentile(o, 90):.0f}"
              f" max {o.max():.0f}")
        print(f"inner trips: mean {i.mean():.1f} p50 "
              f"{np.percentile(i, 50):.0f} p90 {np.percentile(i, 90):.0f}"
              f" max {i.max():.0f} total {i.sum():.0f}")

    if "place-prof" in stages:
        placer = DevicePlacer(tree, window=args.window)
        seqs, starts, ends, valid = _aln_windows(tree, placer, alns)

        def run_place():
            placer.place_batch_win(seqs, starts, ends,
                                   summary_only=True)
        run_place()
        print(f"place_s {timed(run_place):.4f}", flush=True)
        prof = os.path.join(REPO, ".bench", "prof")
        jax.profiler.start_trace(prof)
        run_place()
        jax.profiler.stop_trace()
        traces = sorted(glob.glob(os.path.join(
            prof, "**", "*.trace.json.gz"), recursive=True),
            key=os.path.getmtime)
        if not traces:
            print("no trace written", file=sys.stderr)
            return
        with gzip.open(traces[-1], "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                     for e in events if e.get("ph") == "M"
                     and e.get("name") == "process_name"}
        agg = {}
        for e in events:
            if e.get("ph") != "X":
                continue
            pname = str(pid_names.get(e.get("pid"), ""))
            if "TPU" not in pname and "device" not in pname.lower():
                continue
            name = e.get("name", "?")
            agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:20]
        print(f"device_total_us {sum(agg.values()):.0f}")
        for name, dur in top:
            print(f"  {dur:10.0f} us  {name[:90]}")


if __name__ == "__main__":
    main()
