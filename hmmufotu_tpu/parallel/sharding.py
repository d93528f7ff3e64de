"""Device-mesh sharding of the assignment pipeline.

Design (SURVEY.md §2 parallelism table; BASELINE.json north star):

  * the DB arrays (HMM cost vectors, node sequences, per-edge message
    tensors) are REPLICATED across chips;
  * the read batch is SHARDED along the leading (read) axis of a 1-D
    "data" mesh — the analog of the reference's task-per-read OpenMP
    loop (reference src/hmmufotu.cpp:603-610), but SPMD;
  * per-taxon OTU counts are accumulated per shard and merged with a
    `psum` over the data axis — the analog of hmmufotu-sum's
    sequential accumulation (reference src/hmmufotu-sum.cpp:347-400).

All collectives ride the mesh; no host gathers are required until
final TSV writing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hmm.viterbi import DeviceHMM, viterbi_scan

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, local: bool = False) -> Mesh:
    """1-D data mesh.  `local=True` restricts to this process's
    addressable devices (per-host mesh under a multi-host run, where
    jax.devices() spans every host)."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def sharded_assign_step(mesh: Mesh, dh: DeviceHMM, node_seqs: jax.Array,
                        anno_of_node: jax.Array, n_taxa: int,
                        codes: jax.Array, lengths: jax.Array,
                        regions: jax.Array, n_rows: int):
    """One data-parallel assignment step over the mesh.

    Per shard: banded Viterbi over the local reads, then a seed-style
    p-dist argmin over ALL tree nodes (the masked mismatch count of
    getSeed, reference HmmUFOtu_main.cpp:127-152) as the device-side
    taxonomy vote, and a psum-merged per-taxon count vector.

    Returns (scores [B], best_node [B], taxon_counts [n_taxa]) with
    scores/best_node sharded over reads and taxon_counts replicated.
    """

    def step(codes_l, lengths_l, regions_l):
        scores, mi, mj, _ = viterbi_scan(dh, codes_l, lengths_l,
                                         regions_l, n_rows)
        # device-side p-dist vote against every node's profile-aligned
        # sequence: a [B, K] x [N, K] masked mismatch reduction
        read_valid = (jnp.arange(codes_l.shape[1])[None, :]
                      < lengths_l[:, None])
        q = jnp.where(read_valid, codes_l, -1)
        both = (q[:, None, :] >= 0) & (node_seqs[None, :, :] >= 0)
        mis = ((q[:, None, :] != node_seqs[None, :, :]) & both).sum(-1)
        inf_sites = both.sum(-1)
        dist = mis / jnp.maximum(inf_sites, 1)
        best_node = jnp.argmin(
            jnp.where(inf_sites > 0, dist, jnp.inf), axis=1)
        taxa = anno_of_node[best_node]
        counts = jnp.zeros((n_taxa,), jnp.int32).at[taxa].add(1)
        counts = jax.lax.psum(counts, DATA_AXIS)
        return scores, best_node, counts

    shard = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
    )
    return shard(codes, lengths, regions)


def sharded_otu_accumulate(mesh: Mesh, taxon_ids: jax.Array,
                           n_taxa: int) -> jax.Array:
    """psum-merged OTU count vector from sharded per-read taxon ids
    (the collective form of OTU-table merging, reference
    hmmufotu-sum.cpp:388-397 / OTUTable operator+=)."""

    def acc(ids_l):
        counts = jnp.zeros((n_taxa,), jnp.int32).at[ids_l].add(1)
        return jax.lax.psum(counts, DATA_AXIS)

    return jax.shard_map(acc, mesh=mesh, in_specs=P(DATA_AXIS),
                         out_specs=P())(taxon_ids)


def sharded_place_batch(mesh: Mesh, placer, seqs, starts, ends,
                        max_diff=jnp.inf, max_height=jnp.inf,
                        max_error=20.0, height_prior=False,
                        ml_only=False):
    """Data-parallel SEP placement over the mesh: reads sharded on the
    data axis, the DeviceTree (messages, node seqs, model tensors)
    replicated per chip via closure capture.

    `seqs` may be full [B, csLen] digital reads or pre-sliced [B, W]
    windows (window at min(start, csLen-W), as place_batch_win) —
    full-width input is sliced host-side so only W bytes/read are
    shipped per chip.

    Returns the packed per-read best-placement summary [B, 12]
    (sharded over reads).  This is the real multi-chip assignment
    step — the same place_batch_device kernel as single-chip, SPMD
    over the batch.
    """
    from ..phylo.placement import place_batch_device

    seqs = np.asarray(seqs, np.int8)
    L = placer.tree.cs_len
    if seqs.shape[1] != placer.W:
        sc = np.minimum(np.asarray(starts, np.int64),
                        placer.start_bound)
        seqs = seqs[np.arange(len(seqs))[:, None],
                    sc[:, None] + np.arange(placer.W)]

    s0, Ws = placer.union_window(starts)

    def step(seqs_l, starts_l, ends_l):
        out = place_batch_device(
            placer.dt, seqs_l, starts_l, ends_l, placer.pr_fn,
            max_diff, max_height, max_error, placer.W, placer.C,
            placer.n_rates, L, height_prior, ml_only, placer.fp_pallas,
            placer.sep_pallas, placer.eig,
            s0=jnp.asarray(s0, jnp.int32), Ws=Ws)
        return out["summary"]

    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS))(
            jnp.asarray(seqs, jnp.int8),
            jnp.asarray(starts, jnp.int32),
            jnp.asarray(ends, jnp.int32))


def sharded_place_batch_tree(mesh: Mesh, placer, seqs, starts, ends,
                             max_diff=jnp.inf, max_height=jnp.inf,
                             max_error=20.0, height_prior=False,
                             ml_only=False):
    """Tree-MODEL-parallel SEP placement: the HBM-dominant per-edge
    message tensors ([N, 4, L] x2 — tens of GB at reference gg_97
    scale, SURVEY.md §7 risk table) are sharded over the mesh in node
    blocks; reads and the small per-node metadata (seqs, branch
    lengths, taxonomy) are replicated.  Each shard runs the SAME
    place_batch_device kernel restricted to its node block and
    returns its candidate grid; the union grids concatenate over the
    candidate axis for the exact host-side merge
    (pipeline.merge_mp_candidates), which reproduces single-device
    results because every per-candidate quantity is shard-invariant.

    The mesh must be 1-D; its axis is used as the model axis here.

    Returns dict of union arrays [B, C * n_shards].
    """
    from ..phylo.placement import place_batch_device

    axis = mesh.axis_names[0]
    n = int(mesh.devices.size)
    dt = placer.dt
    N = dt.seqs.shape[0]
    L = placer.tree.cs_len
    Nl = (N + n - 1) // n
    Np = Nl * n

    def pad_nodes(a):
        pad = jnp.zeros((Np - N,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    mu = pad_nodes(dt.msg_up)
    md = pad_nodes(dt.msg_down)

    seqs = np.asarray(seqs, np.int8)
    if seqs.shape[1] != placer.W:
        sc = np.minimum(np.asarray(starts, np.int64),
                        placer.start_bound)
        seqs = seqs[np.arange(len(seqs))[:, None],
                    sc[:, None] + np.arange(placer.W)]
    ends = np.minimum(np.asarray(ends), np.asarray(starts) + placer.W - 1)

    s0, Ws = placer.union_window(starts)

    def step(mu_l, md_l, seqs_l, st_l, en_l):
        lo = jax.lax.axis_index(axis).astype(jnp.int32) * Nl
        dt_l = dt._replace(msg_up=mu_l, msg_down=md_l)
        out = place_batch_device(
            dt_l, seqs_l, st_l, en_l, placer.pr_fn,
            max_diff, max_height, max_error, placer.W, placer.C,
            placer.n_rates, L, height_prior, ml_only, placer.fp_pallas,
            placer.sep_pallas, placer.eig, node_lo=lo,
            opt_k=placer.C, s0=jnp.asarray(s0, jnp.int32), Ws=Ws)
        f32 = lambda x: x.astype(dt.pi.dtype)
        return (f32(out["cand"]), out["c_dist"], out["est_loglik"],
                out["loglik"], out["ratio"], out["wnr"], out["w0"],
                f32(out["live"]))

    rep = P()
    un = P(None, axis)
    outs = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis), rep, rep, rep),
        out_specs=(un, un, un, un, un, un, un, un))(
            mu, md, jnp.asarray(seqs, jnp.int8),
            jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32))
    keys = ("cand", "c_dist", "est_loglik", "loglik", "ratio", "wnr",
            "w0", "live")
    return {k: np.asarray(v) for k, v in zip(keys, outs)}
