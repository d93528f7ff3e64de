"""Second-round attribution micro: traceback share of the DP kernel +
XLA op breakdown of the placement stage.

Runs three serialized child processes (TPU exclusivity — never two at
once):
  dp        — time the banded-split DP kernel (full traceback)
  dp_short  — same, HMMUFOTU_TRACE_STEPS=8 caps the in-kernel walk;
              the delta is the traceback's share
  place     — jax.profiler trace of one placement call, parsed from
              the perfetto JSON for per-op device durations

    python scripts/tpu_micro2.py            # parent, runs all three
    python scripts/tpu_micro2.py <mode>     # child
"""

import glob
import gzip
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 1024


def child(mode: str):
    import jax
    import jax.numpy as jnp
    from bench import ensure_db, simulate_reads, DB_PREFIX
    from hmmufotu_tpu.db import Database
    from hmmufotu_tpu.hmm import NGCL, ViterbiAligner
    from hmmufotu_tpu import pipeline as pl
    from hmmufotu_tpu.pipeline import _aln_windows
    from hmmufotu_tpu.phylo.placement import DevicePlacer

    ensure_db()
    db = Database.load(DB_PREFIX)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    hmm.set_sequence_mode(NGCL)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    rng = np.random.default_rng(0)
    reads = simulate_reads(tree, rng, BATCH)
    vpaths = pl.batch_find_seed_vpaths(hmm, csfm, reads, mode=NGCL,
                                       rng=rng)
    handle = aligner.dispatch_batch(reads, vpaths)
    (_, _, _, n_rows, codes, lengths, regions, _,
     score, mi, mj, choices) = handle
    jax.block_until_ready(score)

    if mode in ("dp", "dp_short"):
        from hmmufotu_tpu.hmm.pallas_viterbi import \
            viterbi_pallas_traced_split

        def run():
            s, comb = viterbi_pallas_traced_split(
                aligner.dh, codes, lengths, regions, n_rows)
            jax.block_until_ready((s, comb))

        run()
        best = min(timed(run) for _ in range(4))
        print(f"{mode}_s {best:.4f}", flush=True)
        return

    # mode == place: profile one call
    alns = aligner.finalize_batch(handle)
    placer = DevicePlacer(tree, window=512)
    seqs, starts, ends, valid = _aln_windows(tree, placer, alns)

    def run_place():
        placer.place_batch_win(seqs, starts, ends, summary_only=True)

    run_place()
    t = min(timed(run_place) for _ in range(3))
    print(f"place_s {t:.4f}", flush=True)
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
    # device-track complete events: sum dur by name
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in str(pname) and "device" not in str(pname).lower():
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:20]
    tot = sum(agg.values())
    print(f"device_total_us {tot:.0f}")
    for name, dur in top:
        print(f"  {dur:10.0f} us  {name[:90]}")


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    env = dict(os.environ)
    for mode, extra in (("dp", {}),
                        ("dp_short", {"HMMUFOTU_TRACE_STEPS": "8"}),
                        ("place", {})):
        e = dict(env)
        e.update(extra)
        r = subprocess.run([sys.executable, __file__, mode], env=e,
                           capture_output=True, text=True,
                           timeout=3000)
        sys.stdout.write(r.stdout)
        if r.returncode:
            sys.stdout.write(f"{mode} FAILED rc={r.returncode}\n"
                             + r.stderr[-2000:])
        sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        main()
