"""Main read assigner CLI (reference: src/hmmufotu.cpp).

Loads the 4-file DB, batch-aligns reads with the banded device
Viterbi, then runs SEP placement per read: seed (vectorized p-dist) ->
estimate -> filter -> accurate place -> Q values; writes the TSV with
the reference's column layout (hmmufotu.cpp:590-594).  Reads are
processed in device-sized batches instead of the reference's
task-per-read OpenMP loop (hmmufotu.cpp:603-610).
"""

from __future__ import annotations

import argparse
import logging
import math
import sys

import numpy as np

from . import PROG_NAME, prog_header, setup_logging
from ..db import Database
from ..hmm import GLOBAL, NGCL, HmmAlignment, ViterbiAligner
from ..hmm.profile import HMM_ALIGN_TSV_HEADER
from ..phylo import PTPlacement
from ..phylo.tree import (PLACEMENT_TSV_HEADER, UNASSIGNED_ID,
                          UNASSIGNED_TAXONID, UNASSIGNED_TAXONNAME, p_dist)
from ..seq import SeqWriter, read_seqs
from .. import pipeline as pl

log = logging.getLogger(__name__)

ALN_TSV_HEADER = ("seq_start\tseq_end\thmm_start\thmm_end\tCS_start\t"
                  "CS_end\tcost\talignment")   # BandedHMMP7.cpp:51
CHIMERA_TSV_HEADER = ("seg5_taxon_id\tseg3_taxon_id\tseg5_taxon_anno\t"
                      "seg3_taxon_anno\tchimera_lod")  # hmmufotu.cpp:57
DEFAULT_BATCH = 64          # CPU/interpret default; TPU resolves below
DEFAULT_BATCH_TPU = 2048    # measured throughput knee on v5e (BASELINE.md)
STRAND_CONFIDENCE = 0.9     # hmmufotu.cpp:41
MIN_STRAND_TEST = 10


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=PROG_NAME,
        description="Ultra-fast microbiome amplicon sequencing read "
                    "taxonomy assignment (TPU-native)")
    p.add_argument("db", help="database prefix")
    p.add_argument("reads", help="forward read file (fasta/fastq)")
    p.add_argument("mates", nargs="?", default="",
                   help="optional reverse read file")
    p.add_argument("-o", dest="out", default="-",
                   help="assignment TSV output")
    p.add_argument("-a", "--align-out", default="",
                   help="write aligned reads fasta")
    p.add_argument("-L", "--seed-len", type=int,
                   default=pl.DEFAULT_SEED_LEN)
    p.add_argument("-R", dest="seed_region", type=int,
                   default=pl.DEFAULT_SEED_REGION)
    p.add_argument("-s", "--strand", type=int, default=0,
                   choices=[0, 1, 2])
    p.add_argument("-t", "--test", type=int, default=MIN_STRAND_TEST)
    p.add_argument("-N", dest="max_nseed", type=int,
                   default=pl.DEFAULT_MAX_NSEED)
    p.add_argument("-d", "--max-diff", type=float, default=math.inf)
    p.add_argument("-H", "--max-height", type=float, default=math.inf)
    p.add_argument("-e", "--err", type=float,
                   default=pl.DEFAULT_MAX_PLACE_ERROR)
    p.add_argument("-m", "--method", default="unweighted",
                   choices=["unweighted", "weighted"])
    p.add_argument("--ML", action="store_true", dest="ml_only")
    p.add_argument("--ref-rank", action="store_true",
                   help="reference-binary compatibility ranking: pick "
                        "the candidate with the best ESTIMATE-stage "
                        "loglik, matching the v1.5.1 binary's "
                        "effective (degenerate) qPlace ordering — see "
                        "PARITY.md 'reference-binary parity'")
    p.add_argument("--prior", default="uniform",
                   choices=["uniform", "height"])
    p.add_argument("-C", "--chimera", action="store_true",
                   help="enable chimera checking")
    p.add_argument("--num-segment", type=int, default=2)
    # the reference initializes maxChimeraError = maxError / numSeg
    # BEFORE option parsing (hmmufotu.cpp:146-147 vs :225,:251), so its
    # default is the fixed 20/2 = 10.0 regardless of -e/--num-segment
    p.add_argument("--chimera-err", type=float,
                   default=pl.DEFAULT_MAX_PLACE_ERROR / 2)
    p.add_argument("--chimera-lod", type=float, default=0.0)
    p.add_argument("--chimera-out", default="")
    p.add_argument("--single", action="store_true",
                   help="assemble/single mode: GLOBAL alignment")
    p.add_argument("--ignore-orient", action="store_true")
    p.add_argument("--align-only", action="store_true")
    p.add_argument("-S", "--seed", type=int, default=None)
    p.add_argument("--opt-k", type=int, default=0,
                   help="speed knob: accurately optimize only the "
                        "opt-k best candidates by estimated loglik "
                        "(0 = all surviving candidates, "
                        "reference-faithful)")
    p.add_argument("-b", "--batch", type=int, default=0,
                   help="reads per device batch (0 = auto: "
                        f"{DEFAULT_BATCH_TPU} on TPU, {DEFAULT_BATCH} "
                        "elsewhere; larger batches amortize the "
                        "per-batch dispatch/transfer latency)")
    p.add_argument("--resume", action="store_true",
                   help="append to an existing output, skipping reads "
                        "already assigned (restartable batches)")
    p.add_argument("--resident-window", type=int, default=0,
                   metavar="WS",
                   help="single-chip capacity mode: keep only a "
                        "WS-column site window of the per-node "
                        "message tensors device-resident (chosen "
                        "from the first reads' aligned span; "
                        "reference-scale DBs exceed one chip's HBM "
                        "full-length).  Out-of-window reads fall back "
                        "to the exact host path")
    p.add_argument("--msg-bf16", action="store_true",
                   help="store the per-node message tensors as "
                        "bfloat16 (halves their HBM footprint; "
                        "compute stays f32)")
    p.add_argument("--mesh", action="store_true",
                   help="shard placement over all local devices "
                        "(data parallel: reads sharded, DB replicated)")
    p.add_argument("--mesh-tree", action="store_true",
                   help="shard the tree message tensors over all local "
                        "devices (capacity mode for DBs whose per-edge "
                        "messages exceed one chip's HBM)")
    p.add_argument("--coordinator", default="localhost:29500",
                   help="jax.distributed coordinator address for "
                        "multi-host runs")
    p.add_argument("--num-processes", type=int, default=1,
                   help="total processes of a multi-host run; reads "
                        "are host-sharded and output rows gathered to "
                        "process 0 in order")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's id in a multi-host run")
    p.add_argument("-v", action="count", default=0, dest="verbose")
    return p


def aln_tsv(aln: HmmAlignment) -> str:
    return (f"{aln.seq_start}\t{aln.seq_end}\t{aln.hmm_start}\t"
            f"{aln.hmm_end}\t{aln.cs_start}\t{aln.cs_end}\t"
            f"{aln.cost:g}\t{aln.align}")


def place_tsv(tree, place: PTPlacement | None) -> str:
    if place is None or place.c_node < 0:
        return (f"{UNASSIGNED_ID}\tnan\t{UNASSIGNED_TAXONID}\t"
                f"{UNASSIGNED_TAXONNAME}\tnan\tnan\tnan\tnan")
    # the reference TSV anno_dist column is the PLACEMENT distance only
    # (PTPlacement::write, PhyloTreeUnrooted.h:1611-1616 + getAnnoDist
    # h:466-469)
    anno_dist = place.get_anno_dist(tree)
    return (f"{place.get_id()}\t{place.ratio:g}\t{place.a_node}\t"
            f"{tree.anno[place.a_node]}\t{anno_dist:g}\t"
            f"{place.loglik:g}\t{place.q_place:g}\t{place.q_taxon:g}")


def detect_strand(aligner, csfm, reads, mode, n_test, rng) -> int:
    """Strand auto-detection by alignment cost on the first reads
    (reference hmmufotu.cpp:500-545)."""
    from ..alphabet import DNA
    sample = reads[:n_test]
    fwd_alns = pl.align_reads(aligner, csfm, sample, mode=mode, rng=rng)
    rev_alns = pl.align_reads(aligner, csfm,
                              [DNA.revcom(r) for r in sample],
                              mode=mode, rng=rng)
    fwd = sum(f.cost < r.cost for f, r in zip(fwd_alns, rev_alns))
    rev = len(sample) - fwd
    if fwd >= (fwd + rev) * STRAND_CONFIDENCE:
        return 1
    if rev >= (fwd + rev) * STRAND_CONFIDENCE:
        return 2
    raise RuntimeError("Failed to determine read strandness; try larger "
                       "-t or set -s manually")


def check_chimera(tree, aln, seq, seeds, args):
    """Segment-placement chimera check (reference hmmufotu.cpp:653-691).

    Returns (is_chimera, lod, best5, best3)."""
    num_seg = args.num_segment
    seg_len = (aln.cs_end - aln.cs_start + 1) // num_seg
    seg5, seg3 = [], []
    for n in range(num_seg):
        s0 = aln.cs_start + n * seg_len        # 1-based
        e0 = s0 + seg_len - 1
        seg_seeds = [
            type(s)(s0 - 1, e0 - 1, s.id,
                    p_dist(seq, tree.seqs[s.id], s0 - 1, e0 - 1))
            for s in seeds]
        places = pl.estimate_seq(tree, seq, seg_seeds, args.method)
        places = pl.filter_placements(places, args.chimera_err)
        places = pl.place_seq(tree, seq, places, args.max_height)
        (seg5 if n < num_seg // 2 else seg3).extend(places)
    seg5.sort(key=lambda p: -p.loglik)
    seg3.sort(key=lambda p: -p.loglik)
    b5, b3 = seg5[0], seg3[0]

    def alt(best, other):
        loc = type(seeds[0])(best.start, best.end, other.c_node,
                             p_dist(seq, tree.seqs[best.c_node],
                                    best.start, best.end))
        p = tree.estimate_seq(seq, loc, args.method)
        tree.place_seq(seq, p, args.max_height)
        return p

    alt5 = alt(b5, b3)
    alt3 = alt(b3, b5)
    lod = b5.loglik - alt5.loglik + b3.loglik - alt3.loglik
    is_chi = (b5.a_node != b3.a_node) and lod > args.chimera_lod
    return is_chi, lod, b5, b3


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    args = build_parser().parse_args(argv)
    setup_logging(args.verbose + 1)
    # without -S the FM-index occurrence choice is deterministic
    # (lexicographically first suffix), making runs reproducible by
    # default; -S <seed> opts into reference-style random occurrence
    # selection (CSFMIndex::locateOne rand(), CSFMIndex.cpp:121-146)
    rng = np.random.default_rng(args.seed) if args.seed is not None \
        else None

    multihost = args.num_processes > 1
    if multihost:
        if args.process_id is None:
            log.error("--num-processes requires --process-id")
            return 1
        if not 0 <= args.process_id < args.num_processes:
            log.error("--process-id must be in [0, %d)",
                      args.num_processes)
            return 1
        if args.resume:
            log.error("--resume is not supported with --num-processes")
            return 1
        if args.seed is not None:
            # each process would consume an identical rng over only its
            # shard, so output would silently differ from the
            # single-process run (the byte-for-byte gather guarantee)
            log.error("-S/--seed is not supported with --num-processes;"
                      " the default (deterministic first-occurrence "
                      "seed pick) is already reproducible")
            return 1
        # must run before any jax backend use
        from ..parallel.distributed import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
        for attr in ("align_out", "chimera_out"):
            if getattr(args, attr):
                setattr(args, attr,
                        getattr(args, attr) + f".p{args.process_id}")

    if not args.batch:
        import jax
        args.batch = (DEFAULT_BATCH_TPU
                      if jax.default_backend() == "tpu"
                      else DEFAULT_BATCH)

    db = Database.load(args.db)
    tree, hmm, csfm = db.ptu, db.hmm, db.csfm
    paired = bool(args.mates)
    mode = GLOBAL if (paired or args.single) else NGCL
    hmm.set_sequence_mode(mode)
    hmm.wing_retract()
    aligner = ViterbiAligner(hmm)
    log.info("Database loaded: %d nodes, csLen %d, K %d",
             tree.num_nodes, tree.cs_len, hmm.K)

    from ..alphabet import DNA
    fwd_reads = list(read_seqs(args.reads))
    rev_reads = list(read_seqs(args.mates)) if paired else []
    if paired and len(rev_reads) != len(fwd_reads):
        log.error("Unmatched number of forward/reverse reads")
        return 1

    placer = None
    mesh = None
    if args.mesh and args.mesh_tree:
        log.error("--mesh and --mesh-tree are mutually exclusive")
        return 1
    if args.resident_window and (args.mesh or args.mesh_tree):
        log.error("--resident-window is the single-chip capacity "
                  "mode; use --mesh-tree to shard full-length "
                  "messages over a mesh instead")
        return 1
    if (args.mesh or args.mesh_tree) and not args.align_only:
        import jax
        from ..parallel import make_mesh
        mesh = make_mesh(local=multihost)
        log.info("Sharding %s over %d devices",
                 "tree messages" if args.mesh_tree
                 else "placement reads", mesh.devices.size)

    strand = args.strand
    if strand == 0:
        strand = detect_strand(aligner, csfm,
                               [r.seq for r in fwd_reads], mode,
                               max(args.test, MIN_STRAND_TEST), rng)
        log.info("Read strand determined as %d", strand)
    if strand == 2:
        if paired:
            fwd_reads, rev_reads = rev_reads, fwd_reads
        else:
            for r in fwd_reads:
                r.seq = DNA.revcom(r.seq)

    # device placer for the batched SEP fast path (chimera checking
    # still uses the host path per segment)
    if not args.align_only:
        import jax.numpy as jnp
        from ..phylo.placement import DevicePlacer
        site_window = None
        if args.resident_window:
            # choose the resident span from the first reads' aligned
            # window (amplicon runs share a primer-anchored span);
            # later out-of-window reads use the exact host path
            sample = [r.seq for r in fwd_reads[:128]]
            # rng=None: the probe must not advance the -S seeded
            # Generator, or the main loop's seed picks (and output)
            # would differ between --resident-window and default runs
            sample_alns = pl.align_reads(aligner, csfm, sample,
                                         args.seed_len,
                                         args.seed_region, mode, None)
            scs = [a.cs_start - 1 for a in sample_alns if a.is_valid()]
            L = tree.cs_len
            W = min(512, L)
            Ws = min(max(args.resident_window, W), L)
            lo = min(scs) if scs else 0
            s0 = max(0, min(lo - lo % 128, L - Ws))
            site_window = (s0, Ws)
            log.info("Resident site window: [%d, %d) of %d columns",
                     s0, s0 + Ws, L)
        placer = DevicePlacer(
            tree, max_nseed=args.max_nseed, opt_k=args.opt_k or None,
            msg_dtype=jnp.bfloat16 if args.msg_bf16 else None,
            site_window=site_window, ref_rank=args.ref_rank)

    # restartable batches: on --resume, skip reads already present in
    # the output and append (the stream-processing checkpoint story;
    # the reference has none - SURVEY.md §5)
    done_ids = set()
    mode_out = "w"
    if args.resume and args.out != "-":
        import os as _os
        if _os.path.exists(args.out):
            for line in open(args.out):
                if line.startswith("#") or line.startswith("id\t"):
                    continue
                done_ids.add(line.split("\t", 1)[0])
            mode_out = "a"
            log.info("Resuming: %d reads already assigned",
                     len(done_ids))
    if done_ids:
        keep = [t for t, r in enumerate(fwd_reads)
                if r.id not in done_ids]
        fwd_reads = [fwd_reads[t] for t in keep]
        if paired:
            rev_reads = [rev_reads[t] for t in keep]

    if multihost:
        # contiguous host shard (strand detection above ran on the
        # full list, so every process made the same choice)
        from ..parallel.distributed import host_bounds
        lo_h, hi_h = host_bounds(len(fwd_reads), args.process_id,
                                 args.num_processes)
        log.info("multihost: process %d/%d assigned reads [%d, %d)",
                 args.process_id, args.num_processes, lo_h, hi_h)
        fwd_reads = fwd_reads[lo_h:hi_h]
        if paired:
            rev_reads = rev_reads[lo_h:hi_h]

    if multihost:
        import io as _io
        out = _io.StringIO()       # rows gathered to process 0 at end
    else:
        out = sys.stdout if args.out == "-" else open(args.out, mode_out)
    write_header = mode_out == "w" and (not multihost
                                        or args.process_id == 0)
    if write_header:
        out.write(prog_header([PROG_NAME] + list(argv)))
    chim_cols = ("\t" + CHIMERA_TSV_HEADER + "\t") if args.chimera \
        else "\t"
    if write_header:
        out.write("id\tdescription\t" + ALN_TSV_HEADER + chim_cols
                  + PLACEMENT_TSV_HEADER + "\n")
    chi_out = open(args.chimera_out, "w") if args.chimera_out else None
    if chi_out:
        chi_out.write(prog_header([PROG_NAME] + list(argv)))
        chi_out.write("id\tdescription\t" + ALN_TSV_HEADER + chim_cols
                      + PLACEMENT_TSV_HEADER + "\n")
    aln_out = SeqWriter(open(args.align_out, "w")) if args.align_out \
        else None

    def finalize() -> int:
        """Close outputs; on multihost, gather every process's rows
        (ordered by process id == original read order) and let process
        0 write the combined TSV — byte-identical data rows to the
        single-process run."""
        if chi_out:
            chi_out.close()
        if aln_out:
            aln_out.close()
        if not multihost:
            if out is not sys.stdout:
                out.close()
            return 0
        from ..parallel.distributed import gather_host_text
        parts = gather_host_text(out.getvalue())
        if args.process_id == 0:
            f = sys.stdout if args.out == "-" else open(args.out,
                                                        mode_out)
            for part in parts:
                f.write(part)
            if f is not sys.stdout:
                f.close()
        return 0

    n_assigned = 0
    # fast path: single-end, no chimera checking -> double-buffered
    # stream (device DP of the next batch overlaps host work)
    if not paired and not args.chimera and not args.align_only \
            and mesh is None:
        lo = 0
        for alns, best_batch in pl.assign_stream(
                aligner, csfm, tree, placer,
                [r.seq for r in fwd_reads], args.batch,
                args.seed_len, args.seed_region, mode, rng,
                args.max_diff, args.max_height, args.err, args.prior,
                args.ml_only):
            for t, aln in enumerate(alns):
                read = fwd_reads[lo + t]
                best = best_batch[t]
                if aln_out and aln.is_valid():
                    from ..seq import PrimarySeq
                    desc = (read.desc + f";csStart={aln.cs_start}"
                            f";csEnd={aln.cs_end};")
                    aln_out.write(PrimarySeq(read.id, aln.align, desc))
                if best is not None:
                    n_assigned += 1
                out.write(f"{read.id}\t{read.desc}\t" + aln_tsv(aln)
                          + "\t" + place_tsv(tree, best) + "\n")
            lo += len(alns)
            out.flush()
            log.info("Processed %d reads", lo)
        log.info("Assigned %d of %d reads", n_assigned, len(fwd_reads))
        return finalize()

    for lo in range(0, len(fwd_reads), args.batch):
        batch = fwd_reads[lo:lo + args.batch]
        alns = pl.align_reads(aligner, csfm, [r.seq for r in batch],
                              args.seed_len, args.seed_region, mode, rng)
        rev_alns = [None] * len(batch)
        if paired:
            mates = [DNA.revcom(r.seq)
                     for r in rev_reads[lo:lo + args.batch]]
            rev_alns = pl.align_reads(aligner, csfm, mates,
                                      args.seed_len, args.seed_region,
                                      mode, rng)
        # orientation / merge pass
        chim_flags = [False] * len(batch)
        for t, (read, aln, rev_aln) in enumerate(
                zip(batch, alns, rev_alns)):
            if paired and rev_aln is not None:
                if not args.ignore_orient and not (
                        aln.cs_start <= rev_aln.cs_start
                        and aln.cs_end <= rev_aln.cs_end):
                    log.warning("Bad orientation of fwd/rev read %s, "
                                "treating as chimera", read.id)
                    chim_flags[t] = True
                else:
                    aln.merge(rev_aln)

        # batched device placement for the non-chimera fast path
        best_batch = [None] * len(batch)
        if not args.align_only and not args.chimera:
            place_alns = [HmmAlignment() if chim_flags[t] else aln
                          for t, aln in enumerate(alns)]
            if args.mesh_tree:
                best_batch = pl.assign_batch_device_tree(
                    tree, placer, place_alns, mesh, args.max_diff,
                    args.max_height, args.err, args.prior,
                    args.ml_only)
            else:
                best_batch = pl.assign_batch_device(
                    tree, placer, place_alns, args.max_diff,
                    args.max_height, args.err, args.prior,
                    args.ml_only, mesh=mesh)

        for t, (read, aln) in enumerate(zip(batch, alns)):
            is_chimera = chim_flags[t]
            seq = None
            seeds = []
            if args.chimera and not is_chimera:
                seq = pl.aln_to_digital(tree, aln)
                seeds = pl.get_seed(tree, seq, aln.cs_start - 1,
                                    aln.cs_end - 1, args.max_diff,
                                    args.max_height, args.max_nseed)
            lod = math.nan
            b5 = b3 = None
            if args.chimera and not is_chimera and seeds:
                is_chimera, lod, b5, b3 = check_chimera(
                    tree, aln, seq, seeds, args)
            chim_str = ""
            if args.chimera:
                if b5 is not None:
                    chim_str = (f"\t{b5.a_node}\t{b3.a_node}\t"
                                f"{tree.anno[b5.a_node]}\t"
                                f"{tree.anno[b3.a_node]}\t{lod:g}")
                else:
                    chim_str = "\tnan\tnan\tnan\tnan\tnan"

            if is_chimera:
                if chi_out:
                    chi_out.write(f"{read.id}\t{read.desc}\t"
                                  + aln_tsv(aln) + chim_str + "\t"
                                  + place_tsv(tree, None) + "\n")
                continue
            if aln_out:
                from ..seq import PrimarySeq
                desc = (read.desc + f";csStart={aln.cs_start}"
                        f";csEnd={aln.cs_end};")
                aln_out.write(PrimarySeq(read.id, aln.align, desc))
            best = None
            if not args.align_only:
                if args.chimera and seeds:
                    # chimera mode already has host seeds; finish the
                    # host SEP path with them
                    places = pl.estimate_seq(tree, seq, seeds,
                                             args.method)
                    places = pl.filter_placements(places, args.err)
                    places = pl.place_seq(tree, seq, places,
                                          args.max_height)
                    if args.ml_only:
                        places.sort(key=lambda p: -p.loglik)
                    else:
                        pl.calc_q_values(tree, places, args.prior)
                        places.sort(key=lambda p: -p.q_place)
                    best = places[0]
                elif not args.chimera:
                    best = best_batch[t]
                if best is not None:
                    n_assigned += 1
            out.write(f"{read.id}\t{read.desc}\t" + aln_tsv(aln)
                      + chim_str + "\t" + place_tsv(tree, best) + "\n")
        out.flush()
        log.info("Processed %d reads", min(lo + args.batch,
                                           len(fwd_reads)))

    log.info("Assigned %d of %d reads", n_assigned, len(fwd_reads))
    return finalize()


if __name__ == "__main__":
    sys.exit(main())
