"""Batched SEP placement on device (JAX/XLA).

TPU-native redesign of the reference per-read placement loop
(reference: src/HmmUFOtu_main.cpp:127-216 seed/estimate/filter/place,
src/PhyloTreeUnrooted.cpp:749-954 the 2-node-subtree joint 3-branch
Felsenstein optimization).  The reference walks candidates one read at
a time on a CPU thread; here the WHOLE batch x candidate grid runs as
one jitted computation:

  seed     : masked-mismatch p-dist of every read against every node
             sequence — one [B,W] x [N,W] reduction on the MXU path —
             then top-C selection (getSeed, HmmUFOtu_main.cpp:127-152)
  estimate : closed-form placement at all B x C candidate branches at
             once (estimateSeq, PhyloTreeUnrooted.cpp:849-877)
  filter   : loglik mask vs the per-read best (filterPlacements)
  place    : joint 3-branch fixed-point optimization, batched with
             lax.while_loop and per-lane convergence masks
             (optimizeBranchLength, PhyloTreeUnrooted.cpp:749-847)

Site windows are fixed-width dynamic slices (static shape W) with
validity masks, so XLA sees static shapes everywhere.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import BRANCH_EPS, MAX_ITER, PTUnrooted

INF = jnp.inf
import os as _os
# seed p-dist matmul path: "auto" uses the s8xs8->s32 MXU form for
# reference-scale node counts (where the f32 one-hot of [N, Ws, 4]
# would be GBs of HBM) and the plain f32 einsum for small fixtures
# (measured ~7% faster there — the int8 one-hot build overhead
# outweighs the tiny matmul); "1"/"0" force one path
SEED_I8 = _os.environ.get("HMMUFOTU_SEED_I8", "auto")
SEED_I8_MIN_NODES = 4096


class DeviceTree(NamedTuple):
    """Tree/DB arrays staged on device (a jax pytree)."""
    msg_up: jax.Array     # [N, 4, Lw] f32/bf16 (Lw = L or site window)
    msg_down: jax.Array   # [N, 4, Lw]
    seqs: jax.Array       # [N, Lw] int8
    brlen: jax.Array      # [N]
    heights: jax.Array    # [N]
    parent: jax.Array     # [N] int32
    anno_dist: jax.Array  # [N] taxonomy annotation distances
    anno_id: jax.Array    # [N] int32 id of each node's taxon STRING
    pi: jax.Array         # [4]
    log_pi: jax.Array     # [4]
    rates: jax.Array      # [K] discrete-Gamma rates (or [1.0])
    msg_s0: jax.Array     # [] int32: CS site of msg/seqs column 0
    seq1h: jax.Array | None = None    # [N, Lw*4] int8 one-hot window
    nvalid: jax.Array | None = None   # [N, Lw] int8 validity window

    @classmethod
    def from_tree(cls, tree: PTUnrooted, dtype=jnp.float32,
                  msg_dtype=None,
                  site_window: tuple[int, int] | None = None
                  ) -> "DeviceTree":
        """msg_dtype overrides the storage dtype of the per-edge
        message tensors (the HBM-dominant [N,4,L] pair — bf16 halves
        the footprint for reference-scale trees; compute stays f32
        after gathering; bf16 keeps f32's 8-bit exponent, so the
        reference's MIN_LOGLIK_EXP-scale magnitudes cannot overflow
        the way f16 would).

        site_window=(s0, Ws): stage only CS columns [s0, s0+Ws) of the
        message/sequence tensors — the single-chip capacity mode for
        reference-scale DBs (gg_97: [N,4,L] f32 pairs are ~29 GB vs
        16 GB v5e HBM, but an amplicon run only ever touches the
        primer-anchored span).  The node-seq one-hot planes for the
        seed p-dist matmul are precomputed host-side in this mode."""
        f = lambda a: jnp.asarray(a, dtype=dtype)
        rates = np.ones(1) if tree.dg is None \
            else np.asarray(tree.dg.rates)
        # distinct annotation strings -> dense int ids (for the
        # device-side per-taxon posterior aggregation of calcQValues)
        taxa: dict[str, int] = {}
        anno_id = np.empty(tree.num_nodes, dtype=np.int32)
        for u, a in enumerate(tree.anno):
            anno_id[u] = taxa.setdefault(a, len(taxa))
        fm = (lambda a: jnp.asarray(a, dtype=msg_dtype)) \
            if msg_dtype is not None else f
        s0 = 0
        seq1h = nvalid = None
        if site_window is None:
            msg_up, msg_down = tree.msg_up, tree.msg_down
            seqs = tree.seqs
        else:
            s0, Ws = site_window
            sl = slice(s0, s0 + Ws)
            # host-side slicing: only the window crosses the link
            msg_up = np.ascontiguousarray(tree.msg_up[:, :, sl])
            msg_down = np.ascontiguousarray(tree.msg_down[:, :, sl])
            seqs = np.ascontiguousarray(tree.seqs[:, sl])
            one_hot = (seqs[:, :, None]
                       == np.arange(4, dtype=np.int8)).astype(np.int8)
            seq1h = jnp.asarray(one_hot.reshape(len(seqs), -1))
            nvalid = jnp.asarray((seqs >= 0).astype(np.int8))
        return cls(
            msg_up=fm(msg_up), msg_down=fm(msg_down),
            seqs=jnp.asarray(seqs, jnp.int8),
            brlen=f(tree.brlen), heights=f(tree.heights),
            parent=jnp.asarray(tree.parent, jnp.int32),
            anno_dist=f(tree.anno_dist),
            anno_id=jnp.asarray(anno_id),
            pi=f(tree.model.pi), log_pi=f(np.log(tree.model.pi)),
            rates=f(rates),
            msg_s0=jnp.asarray(s0, jnp.int32),
            seq1h=seq1h, nvalid=nvalid,
        )


def _dot_scaled(P: jax.Array, V: jax.Array) -> jax.Array:
    """log(P @ exp(V)) columnwise with underflow scaling.

    P [..., 4, 4], V [..., 4, W] -> [..., 4, W]
    (reference dot_product_scaled, PhyloTreeUnrooted.h:1496-1504)."""
    m = V.max(axis=-2, keepdims=True)
    scale = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(V - scale)
    out = jnp.einsum("...ij,...jw->...iw", P, e,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(out) + scale


def _dot_scaled_vec(log_p: jax.Array, V: jax.Array) -> jax.Array:
    """log(pi . exp(V)) per column; V [..., 4, W] -> [..., W]."""
    m = V.max(axis=-2, keepdims=True)
    scale = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.exp(log_p[..., :, None] + V - scale).sum(axis=-2)
    return jnp.log(s) + scale[..., 0, :]


def _conv_mix(Pr_fn, rates: jax.Array, msgs):
    """Rate-mixed convolution sum (reference loglik + row_mean_exp,
    PhyloTreeUnrooted.cpp:326-345).

    msgs: list of (msg [..., 4, W], branch_length [...]).
    Returns the averaged summed message [..., 4, W].
    """
    outs = []
    for r in rates:
        s = None
        for msg, bl in msgs:
            conv = _dot_scaled(Pr_fn(bl * r), msg)
            s = conv if s is None else s + conv
        outs.append(s)
    if len(outs) == 1:
        return outs[0]
    X = jnp.stack(outs, axis=-1)               # [..., 4, W, K]
    m = X.max(axis=-1, keepdims=True)
    scale = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(jnp.exp(X - scale).mean(axis=-1)) + scale[..., 0]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


FP_ROWS = 128   # candidate lanes per fixed-point kernel program


class OutOfWindowError(ValueError):
    """Raised when a window-resident placer receives reads whose
    placement window falls outside the staged site window; carries the
    offending batch row indices so the caller can reroute them."""

    def __init__(self, rows):
        self.rows = np.asarray(rows)
        super().__init__(
            f"{len(self.rows)} reads outside the resident site window")


def _fp_kernel(scal_ref, eA_ref, eB_ref, out_ref):
    """One program iterates FP_ROWS candidate lanes to convergence.

    scal_ref [FP_ROWS, 128] f32: col 0 = n (informative-site count),
    col 1 = p_init, col 2 = skip flag (1.0 = lane already done).
    eA/eB [FP_ROWS, W] f32 pre-scaled site factors (0 outside mask).
    out col 0 = converged p.
    """
    eA = eA_ref[:, :]
    eB = eB_ref[:, :]
    n = scal_ref[:, 0:1]
    p0 = scal_ref[:, 1:2]
    skip = scal_ref[:, 2:3] > 0.5

    def cond(state):
        p, it, n_live, done_i = state
        return jnp.logical_and(it < MAX_ITER, n_live > 0)

    def body(state):
        p, it, n_live, done_i = state
        done = done_i > 0             # int32 carry: Mosaic while
        num = eB * p
        den = eA * (1.0 - p) + num
        frac = jnp.where(den > 0, num / den, 0.0)
        pn = jnp.sum(frac, axis=1, keepdims=True) / n
        bad = jnp.logical_not((pn >= 0) & (pn <= 1))
        diff = jnp.abs(jnp.log1p(-pn) - jnp.log1p(-p))
        conv = (diff < BRANCH_EPS) \
            | jnp.logical_not(jnp.isfinite(diff)) \
            | (pn >= 1.0 - 1e-7)
        new_done = done | conv | bad
        p_next = jnp.where(done | bad, p, pn)
        return (p_next, it + 1, jnp.sum(jnp.where(new_done, 0, 1)),
                new_done.astype(jnp.int32))

    p_fin, _, _, _ = jax.lax.while_loop(
        cond, body, (p0, jnp.int32(0), jnp.int32(FP_ROWS),
                     skip.astype(jnp.int32)))
    out_ref[:, :] = jnp.broadcast_to(p_fin, out_ref.shape)


def _fixed_point_pallas(eA, eB, n, p_init, skip):
    """Run the whole fixed-point iteration as ONE Pallas kernel.

    The XLA while_loop form issues a handful of kernels per iteration
    (and typically runs ~70 iterations to batch convergence), which is
    dominated by per-kernel dispatch overhead on a remote TPU; here the
    entire loop stays VMEM-resident in a single kernel launch.

    eA/eB [M, W]; n/p_init/skip [M].  Returns p [M].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, W = eA.shape
    Mp = _round_up(max(M, FP_ROWS), FP_ROWS)
    Wp = _round_up(W, 128)
    f32 = jnp.float32
    eAp = jnp.zeros((Mp, Wp), f32).at[:M, :W].set(eA.astype(f32))
    eBp = jnp.zeros((Mp, Wp), f32).at[:M, :W].set(eB.astype(f32))
    scal = jnp.ones((Mp, 128), f32)      # pad rows: n=1, skip=1
    scal = scal.at[:M, 0].set(n.astype(f32))
    scal = scal.at[:M, 1].set(p_init.astype(f32))
    scal = scal.at[:M, 2].set(skip.astype(f32))
    scal = scal.at[M:, 2].set(1.0)

    out = pl.pallas_call(
        _fp_kernel,
        grid=(Mp // FP_ROWS,),
        in_specs=[
            pl.BlockSpec((FP_ROWS, 128), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP_ROWS, Wp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FP_ROWS, Wp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FP_ROWS, 128), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 128), f32),
        interpret=jax.default_backend() != "tpu",
    )(scal, eAp, eBp)
    return out[:M, 0].astype(eA.dtype)


def _fixed_point_branch(log_pi, U, V, w0, site_mask, max_len,
                        skip=None, use_pallas: bool = False):
    """Batched Felsenstein single-branch fixed point
    (reference optimizeBranchLength(u,v), PhyloTreeUnrooted.cpp:749-798).

    U, V: [..., 4, W]; w0, max_len: [...]; site_mask: [..., W].
    skip: [...] bool lanes whose result the caller discards (they start
    converged, so they never hold the batch back).
    Returns optimized branch length [...].
    """
    logA = _dot_scaled_vec(log_pi, U + V)              # [..., W]
    logB = _dot_scaled_vec(log_pi, U) + _dot_scaled_vec(log_pi, V)
    ok = site_mask & ~(jnp.isnan(logA) | jnp.isnan(logB))
    scale = jnp.maximum(logA, logB)
    eA = jnp.where(ok, jnp.exp(logA - scale), 0.0)
    eB = jnp.where(ok, jnp.exp(logB - scale), 0.0)
    n = jnp.maximum(ok.sum(axis=-1), 1)

    p_init = 1.0 - jnp.exp(-w0)
    # init `done` from the data so its device-varying type matches
    # under shard_map
    done0 = p_init < -1.0 if skip is None else skip

    if use_pallas:
        shape = p_init.shape
        W = eA.shape[-1]
        p_fin = _fixed_point_pallas(
            eA.reshape(-1, W), eB.reshape(-1, W), n.reshape(-1),
            p_init.reshape(-1), done0.reshape(-1)).reshape(shape)
        w = -jnp.log1p(-p_fin)
        return jnp.minimum(w, max_len)

    def cond(state):
        p0, it, done = state
        return (~done).any() & (it < MAX_ITER)

    def body(state):
        p0, it, done = state
        num = eB * p0[..., None]
        den = eA * (1 - p0[..., None]) + num
        frac = jnp.where(den > 0, num / den, 0.0)
        p = frac.sum(axis=-1) / n
        bad = ~((p >= 0) & (p <= 1))
        diff = jnp.abs(jnp.log1p(-p) - jnp.log1p(-p0))
        # f32 saturation guard: p -> 1 makes log1p(-p) = -inf and the
        # difference nan; treat saturated lanes as converged (the f64
        # reference never quite reaches 1, cpp:764-786)
        conv = (diff < BRANCH_EPS) | ~jnp.isfinite(diff) \
            | (p >= 1.0 - 1e-7)
        new_done = done | conv | bad
        p_next = jnp.where(done | bad, p0, p)
        return p_next, it + 1, new_done

    p_fin, _, _ = jax.lax.while_loop(
        cond, body, (p_init, jnp.int32(0), done0))
    w = -jnp.log1p(-p_fin)
    return jnp.minimum(w, max_len)


def seed_pdist_bf16(seqs_w: jax.Array, q_valid: jax.Array,
                    n1h8: jax.Array, nv8: jax.Array,
                    out_dtype) -> jax.Array:
    """Seed p-dist of [B, Ws] digital reads vs [N] node one-hot planes
    as bf16-operand / f32-accumulate MXU matmuls (reference
    SeqUtils::pDist, SeqUtils.cpp:31-47, dual-gap skip via validity
    planes).

    Counts are sums of 0/1 products (< 2^24), so the bf16 form is
    EXACT — bit-equal to integer counting (unit-tested) — and the bf16
    node planes halve the resident HBM footprint and read traffic vs
    f32.  A round-5 on-chip micro at [1024,5120]x[150k,5120] measured
    all dtype forms within noise (~33-43 ms including the tunnel
    sync floor; BASELINE.md round-5 micro note), so the dtype choice
    is about residency, not a measured rate difference.

    seqs_w:  [B, Ws] int8 digital reads (-2 pad / -1 gap / 0-3 base)
    q_valid: [B, Ws] bool, read base present AND inside [start, end]
    n1h8:    [N, Ws*4] bf16 node one-hot planes
    nv8:     [N, Ws] bf16 node validity
    Returns [B, N] out_dtype p-dist (nan where no site overlaps).
    """
    B, Ws = seqs_w.shape
    bf = jnp.bfloat16
    base4 = jnp.arange(4, dtype=jnp.int8)
    q1h8 = ((seqs_w[:, :, None] == base4)
            & q_valid[:, :, None]).astype(bf)           # [B, Ws, 4]
    dim = (((1,), (1,)), ((), ()))
    match = jax.lax.dot_general(
        q1h8.reshape(B, Ws * 4), n1h8, dim,
        preferred_element_type=jnp.float32)
    both = jax.lax.dot_general(
        q_valid.astype(bf), nv8, dim,
        preferred_element_type=jnp.float32)
    return jnp.where(both > 0,
                     (both - match).astype(out_dtype)
                     / jnp.maximum(both, 1).astype(out_dtype),
                     jnp.nan)                           # [B, N]


@partial(jax.jit, static_argnames=("Pr_fn", "W", "C", "n_rates",
                                   "L", "height_prior", "ml_only",
                                   "fp_pallas", "sep_pallas", "opt_k",
                                   "Ws", "est_kernel", "debug_trips",
                                   "ref_rank"))
def place_batch_device(dt: DeviceTree, seq_win: jax.Array,
                       starts: jax.Array, ends: jax.Array,
                       Pr_fn, max_diff: float, max_height: float,
                       max_error: float, W: int, C: int, n_rates: int,
                       L: int, height_prior: bool = False,
                       ml_only: bool = False,
                       fp_pallas: bool = False,
                       sep_pallas: bool = False,
                       eig=None, node_lo=None, opt_k: int | None = None,
                       s0=None, Ws: int | None = None,
                       est_kernel: bool = True,
                       debug_trips: bool = False,
                       ref_rank: bool = False):
    """Full SEP placement of a read batch.

    seq_win: [B, W] int8 aligned digital reads, pre-sliced to the
        fixed window at min(start, L-W) — the aligned region of a read
        is far shorter than csLen, so the host ships only the window
        (device link is thin) and the full [B, L] matrix used by the
        seed p-dist is rebuilt device-side by scatter.
    starts/ends: [B] int32 0-based inclusive CS windows
    Pr_fn: static traced P(t) callable (see make_pr_fn)
    L: static csLen of the tree
    node_lo: first GLOBAL node id whose messages this shard holds —
        dt.msg_up/msg_down may be a node slice [Nl, 4, L] of the full
        message tensor (tree-model parallelism: the HBM-dominant
        tensors sharded over chips, small per-node metadata
        replicated).  Candidates are restricted to the local slice;
        merge across shards host-side (merge_mp_candidates).
    Returns dict of [B, C] candidate arrays + [B, N] seed dists.
    """
    B = seq_win.shape[0]
    N = dt.seqs.shape[0]
    rates = dt.rates[:n_rates]
    if Ws is None:
        Ws = L
    if s0 is None:
        s0 = jnp.zeros((), jnp.int32)
    # clamp each read's W-wide gather window inside the union window
    # [s0, s0+Ws) — equal to the old min(start, L-W) when the union
    # spans to csLen, and required when messages are a resident site
    # window (callers slice seq_win at the same clamped position)
    starts_c = jnp.minimum(starts, s0 + Ws - W)         # [B]

    # ---- seed: p-dist of every read against every node -------------------
    # computed over the batch's UNION site window [s0, s0+Ws) only —
    # every read's own [start, end] range lies inside it, so this is
    # exact while cutting the reduction from csLen to the amplicon
    # span (the dominant FLOP count at reference gg_97 tree scale)
    seqs_w = jax.vmap(
        lambda w, s: jax.lax.dynamic_update_slice(
            jnp.full((Ws,), -2, jnp.int8), w, (s,)))(
                seq_win, starts_c - s0)                 # [B, Ws]
    site_idx = jnp.arange(Ws)[None, :] + s0
    win = (site_idx >= starts[:, None]) \
        & (site_idx <= ends[:, None])                   # [B, Ws]
    q_valid = (seqs_w >= 0) & win
    # mismatch counting via compact one-hot matmuls (seed_pdist_bf16:
    # bf16 operands, f32 accumulate — exactly integral counts) that
    # never materialize an f32 one-hot of the full node matrix.
    # HMMUFOTU_SEED_I8=0 switches back to the f32 einsum form (A/B).
    f = dt.pi.dtype
    base4 = jnp.arange(4, dtype=jnp.int8)
    use_i8 = (dt.seq1h is not None or SEED_I8 == "1"
              or (SEED_I8 == "auto" and N >= SEED_I8_MIN_NODES))
    if use_i8:
        if dt.seq1h is not None:
            n1h8 = dt.seq1h.astype(jnp.bfloat16)        # [N, Ws*4]
            nv8 = dt.nvalid.astype(jnp.bfloat16)        # [N, Ws]
        else:
            nseqs_w = jax.lax.dynamic_slice(
                dt.seqs, (0, s0 - dt.msg_s0), (N, Ws))
            n1h8 = ((nseqs_w[:, :, None] == base4)
                    .astype(jnp.bfloat16).reshape(N, Ws * 4))
            nv8 = (nseqs_w >= 0).astype(jnp.bfloat16)
        dist = seed_pdist_bf16(seqs_w, q_valid, n1h8, nv8, f)
    else:
        nseqs_w = jax.lax.dynamic_slice(
            dt.seqs, (0, s0 - dt.msg_s0), (N, Ws))
        n_valid = nseqs_w >= 0
        q1h = jax.nn.one_hot(jnp.where(q_valid, seqs_w, 4), 5,
                             dtype=f)[:, :, :4]         # [B, Ws, 4]
        n1h = jax.nn.one_hot(jnp.where(n_valid, nseqs_w, 4), 5,
                             dtype=f)[:, :, :4]         # [N, Ws, 4]
        match = jnp.einsum("blk,nlk->bn", q1h, n1h,
                           precision=jax.lax.Precision.HIGHEST)
        both = jnp.einsum("bl,nl->bn", q1h.sum(-1), n1h.sum(-1),
                          precision=jax.lax.Precision.HIGHEST)
        dist = jnp.where(both > 0,
                         (both - match) / jnp.maximum(both, 1),
                         jnp.nan)                       # [B, N]

    eligible = (dt.parent >= 0) & (dt.heights <= max_height)
    if node_lo is not None:
        # tree-model parallelism: only nodes whose messages live on
        # this shard are candidates here
        Nl = dt.msg_up.shape[0]
        idx = jnp.arange(N)
        eligible = eligible & (idx >= node_lo) & (idx < node_lo + Nl)
    dist_sort = jnp.where(eligible[None, :] & ~jnp.isnan(dist), dist,
                          INF)
    neg_top, cand = jax.lax.top_k(-dist_sort, C)        # [B, C]
    c_dist = -neg_top
    best_dist = c_dist[:, :1]
    cand_ok = jnp.isfinite(c_dist) \
        & (c_dist - best_dist <= max_diff)              # [B, C]

    # ---- gather candidate windows ---------------------------------------
    def slice_msg(arr, node, start):
        # arr [Nl, 4, Lw] -> [4, W] window at start for one candidate
        # (node ids are global; the message tensor may be a node shard
        # and/or a site window starting at CS column msg_s0)
        n_l = node if node_lo is None else node - node_lo
        return jax.lax.dynamic_slice(arr[n_l],
                                     (0, start - dt.msg_s0), (4, W))

    gather = jax.vmap(jax.vmap(slice_msg, in_axes=(None, 0, None)),
                      in_axes=(None, 0, 0))
    cdtype = dt.pi.dtype
    U = gather(dt.msg_up, cand, starts_c).astype(cdtype)  # [B, C, 4, W]
    V = gather(dt.msg_down, cand, starts_c).astype(cdtype)

    # leaf message of the read in the same window (= the shipped slice)
    rwin = seq_win                                      # [B, W]
    obs = rwin >= 0
    base1h = jax.nn.one_hot(jnp.clip(rwin, 0, 3), 4,
                            dtype=dt.pi.dtype)      # [B, W, 4]
    leaf = jnp.where(obs[:, None, :],
                     jnp.where(base1h.transpose(0, 2, 1) > 0, 0.0, -INF),
                     dt.log_pi[None, :, None])          # [B, 4, W]
    Nl = leaf[:, None, :, :]                            # [B, 1, 4, W]
    Nl = jnp.broadcast_to(Nl, U.shape)

    site_ok = (jnp.arange(W)[None, :] + starts_c[:, None]
               <= ends[:, None]) \
        & (jnp.arange(W)[None, :] + starts_c[:, None]
           >= starts[:, None])                          # [B, W]
    site_ok_c = site_ok[:, None, :]                     # [B, 1, W]
    site_ok_c = jnp.broadcast_to(site_ok_c, (B, C, W))

    # ---- estimate (closed form, no rate mixing — estimateSeq uses the
    # plain model, PhyloTreeUnrooted.cpp:861-871) -------------------------
    w0 = dt.brlen[cand]                                 # [B, C]
    p_dist_parent = jnp.take_along_axis(dist, dt.parent[cand], axis=1)
    ratio0 = c_dist / (c_dist + p_dist_parent)
    ratio0 = jnp.where(jnp.isnan(ratio0), 0.5, ratio0)
    wur0 = w0 * ratio0
    wvr0 = w0 - wur0
    padded = None
    if sep_pallas and est_kernel:
        # fused estimate kernel: the [B, C, 4, W] exp/log chains stay
        # in VMEM (the XLA form materializes ~20 full-size temps
        # between fusion breaks at the scale reductions).  The padded
        # kernel-layout copies are built ONCE and shared with the
        # optimize kernel below (ADVICE r3 #5: the duplicate
        # transposes roughly doubled the message tensors' peak HBM).
        from .pallas_place import est_pallas, pad_msgs
        padded = pad_msgs(U, V, Nl, site_ok_c)
        est_loglik, wnr0 = est_pallas(
            None, None, None, None, wur0, wvr0, eig[0], eig[1], eig[2],
            dt.log_pi, interpret=jax.default_backend() != "tpu",
            padded=padded, shape=(B, C, W))
    else:
        UPr = _dot_scaled(Pr_fn(wur0), U)
        VPr = _dot_scaled(Pr_fn(wvr0), V)
        R0 = UPr + VPr
        # unweighted initial pendant estimate (cpp:1018-1031)
        b1 = R0.argmax(axis=-2)
        b2 = Nl.argmax(axis=-2)
        wnr0 = jnp.where(site_ok_c, (b1 != b2), 0).sum(-1) \
            / jnp.maximum(site_ok_c.sum(-1), 1)
        NPr = _dot_scaled(Pr_fn(wnr0), Nl)
        est_cols = _dot_scaled_vec(dt.log_pi, R0 + NPr)  # [B, C, W]
        est_loglik = jnp.where(site_ok_c, est_cols, 0.0).sum(-1)
    est_loglik = jnp.where(cand_ok, est_loglik, -INF)

    # ---- filter (filterPlacements, HmmUFOtu_main.cpp:162-173) -----------
    best_est = est_loglik.max(axis=1, keepdims=True)
    live = cand_ok & (best_est - est_loglik <= max_error)

    # optionally compact to the opt_k best candidates by estimated
    # loglik before the expensive optimization.  The default (None)
    # optimizes EVERY candidate the estimate filter kept, like the
    # reference (filterPlacements keeps all within maxError,
    # HmmUFOtu_main.cpp:162-173) — the estimate's bias is candidate-
    # dependent (measured up to ~30 nats on the fixture), so a tighter
    # cut can drop the true winner: the round-3 parity sweep caught
    # 2/1000 PE taxon flips at opt_k=16 whose est-ranks were 16 and 27.
    # opt_k is a speed knob (assign --opt-k) for callers that accept
    # that tradeoff.
    opt_k = C if opt_k is None else min(opt_k, C)
    _, order = jax.lax.top_k(jnp.where(live, est_loglik, -INF), opt_k)

    def take_c(x):
        extra = (1,) * (x.ndim - 2)
        return jnp.take_along_axis(
            x, order.reshape(order.shape + extra), axis=1)

    if padded is None or not sep_pallas:
        # XLA optimize path consumes the [B, C, 4, W] grids directly
        U = take_c(U)
        V = take_c(V)
        Nl = take_c(Nl)
        site_ok_c = take_c(site_ok_c)
    cand = take_c(cand)
    c_dist = take_c(c_dist)
    w0 = take_c(w0)
    wur0 = take_c(wur0)
    wvr0 = take_c(wvr0)
    wnr0 = take_c(wnr0)
    est_loglik_k = take_c(est_loglik)
    live = take_c(live)

    # ---- accurate joint 3-branch optimization ---------------------------
    if sep_pallas:
        # entire convergence loop fused into ONE Pallas kernel — the
        # XLA while_loop below issues 10s of kernels per iteration,
        # which is dispatch-bound on a remote-tunneled TPU
        from .pallas_place import sep_optimize_pallas, take_padded
        if padded is not None:
            padded_k = take_padded(padded, order, C)
            U_k = V_k = Nl_k = ok_k = None
        else:
            padded_k = None
            U_k, V_k, Nl_k, ok_k = U, V, Nl, site_ok_c
        res = sep_optimize_pallas(
            U_k, V_k, Nl_k, ok_k, w0, wur0, wnr0, live,
            eig[0], eig[1], eig[2], dt.log_pi, dt.rates, n_rates,
            interpret=jax.default_backend() != "tpu",
            return_trips=debug_trips,
            padded=padded_k, shape=(B, opt_k, W))
        wur_f, wvr_f, wnr_f, ll = res[:4]
        loglik = jnp.where(live, ll, -INF)
        out = _finish_placement(
            dt, cand, c_dist, live, w0, wur_f, wvr_f, wnr_f, loglik,
            est_loglik_k, max_height, height_prior, ml_only, ref_rank)
        if debug_trips:
            out["sep_trips"] = jnp.stack(res[4:6], axis=-1)
            out["sep_live"] = live
        return out

    def outer_cond(state):
        wur, wvr, wnr, wur_p, wnr_p, it, done = state
        return (~done).any() & (it < MAX_ITER)

    def outer_body(state):
        wur, wvr, wnr, wur_p, wnr_p, it, done = state
        Rn = _conv_mix(Pr_fn, rates, [(U, wur), (V, wvr)])
        wnr_n = _fixed_point_branch(dt.log_pi, Rn, Nl, wnr, site_ok_c,
                                    jnp.ones_like(wnr), skip=done,
                                    use_pallas=fp_pallas)
        Ru = _conv_mix(Pr_fn, rates, [(V, wvr), (Nl, wnr_n)])
        wur_n = _fixed_point_branch(dt.log_pi, Ru, U, wur, site_ok_c,
                                    w0, skip=done,
                                    use_pallas=fp_pallas)
        wvr_n = w0 - wur_n
        conv = (jnp.abs(wur_n - wur) < BRANCH_EPS) \
            & (jnp.abs(wnr_n - wnr) < BRANCH_EPS)
        bad = ~((wur_n >= 0) & (wur_n <= w0))
        new_done = done | conv | bad
        keep = done
        return (jnp.where(keep, wur, wur_n),
                jnp.where(keep, wvr, wvr_n),
                jnp.where(keep, wnr, wnr_n),
                wur, wnr, it + 1, new_done)

    init = (wur0, wvr0, wnr0, wur0, wnr0, jnp.int32(0),
            ~live)
    wur_f, wvr_f, wnr_f, _, _, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, init)

    root_msg = _conv_mix(Pr_fn, rates,
                         [(U, wur_f), (V, wvr_f), (Nl, wnr_f)])
    cols = _dot_scaled_vec(dt.log_pi, root_msg)
    loglik = jnp.where(site_ok_c, cols, 0.0).sum(-1)
    loglik = jnp.where(live, loglik, -INF)

    return _finish_placement(
        dt, cand, c_dist, live, w0, wur_f, wvr_f, wnr_f, loglik,
        est_loglik_k, max_height, height_prior, ml_only, ref_rank)


# front element of libstdc++ std::sort(rbegin, rend, always-false) on
# n all-equal elements, indexed by n (measured: g++ 13 / libstdc++ on
# this host, the toolchain that built the reference baseline binary);
# identity below the 16-element insertion-sort threshold
_INTROSORT_FRONT = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
    31, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 24,
    25, 25, 26, 26, 27, 27, 28, 28, 29, 29, 30, 30, 31, 31, 32, 32)


def _finish_placement(dt: DeviceTree, cand, c_dist, live, w0,
                      wur_f, wvr_f, wnr_f, loglik, est_loglik_k,
                      max_height, height_prior, ml_only,
                      ref_rank: bool = False):
    # ---- device Q values + best-placement summary -----------------------
    # (calcQValues, HmmUFOtu_main.cpp:182-216, with taxon grouping via
    # dense anno ids)
    parent_c = dt.parent[cand]
    ratio_f = wur_f / w0
    height_f = dt.heights[cand] + wur_f
    a_is_c = (ratio_f <= 0.5) | (dt.heights[parent_c] > max_height)
    a_node = jnp.where(a_is_c, cand, parent_c)
    anno_place = jnp.where(a_is_c, wur_f + wnr_f, wvr_f + wnr_f)
    anno_total = anno_place + dt.anno_dist[a_node]
    if height_prior:
        # logPriorPr HEIGHT uses the placement distance only
        # (PhyloTreeUnrooted.cpp:1166-1177 + h:466-469); the node's own
        # annotation distance is not part of the prior
        log_prior = -(anno_place - wnr_f + height_f)
    else:
        log_prior = jnp.zeros_like(loglik)
    pp = jnp.where(live, loglik + log_prior, -INF)
    m = pp.max(axis=1, keepdims=True)
    wgt = jnp.exp(pp - m)
    post = wgt / wgt.sum(axis=1, keepdims=True)
    q_place = jnp.minimum(-10.0 * jnp.log10(
        jnp.maximum(1.0 - post, 0.0)), 250.0)
    tax = dt.anno_id[a_node]                        # [B, C]
    same = tax[:, :, None] == tax[:, None, :]       # [B, C, C]
    pp_pair = jnp.where(same, pp[:, None, :], -INF)
    lse_tax = jax.nn.logsumexp(pp_pair, axis=-1)     # [B, C]
    lse_all = jax.nn.logsumexp(pp, axis=-1)[:, None]
    post_tax = jnp.exp(lse_tax - lse_all)
    q_taxon = jnp.minimum(-10.0 * jnp.log10(
        jnp.maximum(1.0 - post_tax, 0.0)), 250.0)
    if ref_rank:
        # reference-BINARY compatibility: v1.5.1's placeSeq loses the
        # accurate loglik (initRootLoglik + a discarded const loglik()
        # loop leave the root cache at INVALID_LOGLIK=1,
        # PhyloTreeUnrooted.cpp:916-923,69), so its reported loglik is
        # end-start+1 for EVERY candidate, all qPlace tie, and the
        # final unstable std::sort (hmmufotu.cpp:730) permutes
        # filterPlacements' order — descending ESTIMATE-stage loglik
        # (HmmUFOtu_main.cpp:166).  libstdc++ introsort on k all-equal
        # keys is deterministic given k: identity for k<17 (insertion
        # sort), else it brings the element at est-rank PERM[k] to the
        # front (measured with the toolchain that built the reference
        # baseline; scripts/ref_build notes).
        est_live = jnp.where(live, est_loglik_k, -INF)
        order = jnp.argsort(-est_live, axis=1)          # est-desc
        k = live.sum(axis=1)
        pick_rank = jnp.asarray(_INTROSORT_FRONT, jnp.int32)[
            jnp.clip(k, 0, len(_INTROSORT_FRONT) - 1)]
        best = jnp.take_along_axis(order, pick_rank[:, None],
                                   axis=1)[:, 0]
    else:
        best = (jnp.argmax(jnp.where(live, loglik, -INF), axis=1)
                if ml_only else jnp.argmax(pp, axis=1))

    def pick(x):
        return jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]

    f32 = lambda x: x.astype(dt.pi.dtype)
    summary = jnp.stack([
        f32(pick(cand)), f32(pick(parent_c)), f32(pick(a_node)),
        pick(ratio_f), pick(wnr_f), pick(loglik), pick(q_place),
        pick(q_taxon), pick(height_f), pick(anno_total), pick(w0),
        f32(live.any(axis=1)),
    ], axis=1)                                      # [B, 12]

    return {
        "cand": cand, "c_dist": c_dist, "live": live,
        "w0": w0, "ratio": ratio_f, "wnr": wnr_f,
        "loglik": loglik, "est_loglik": est_loglik_k,
        "height": height_f, "parent": parent_c,
        "q_place": q_place, "q_taxon": q_taxon,
        "summary": summary,
    }


def make_pr_fn(tensors, kind: str, dtype):
    """Return a traced P(t) function from staged model tensors.

    kind 'eig': tensors = (U, U_1, lam) eigendecomposition (GTR,
    reference GTR.h:116-121); kind 'closed': tensors = the model
    object whose Pr_batch is jnp-traceable (JC69..TN93).
    """
    if kind == "eig":
        Um, U_1, lam = tensors

        def Pr(v):
            v = jnp.asarray(v, dtype)
            e = jnp.exp(lam * v[..., None])
            prod = Um[..., :, :] * e[..., None, :]
            out = jnp.einsum("...ij,...jk->...ik", prod, U_1,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.maximum(out, 0.0)

        return Pr
    model = tensors

    def Pr(v):
        return model.Pr_batch(jnp.asarray(v, dtype))

    return Pr


class DevicePlacer:
    """High-level batched placement wrapper around a PTUnrooted."""

    def __init__(self, tree: PTUnrooted, window: int = 512,
                 max_nseed: int = 50, dtype=jnp.float32,
                 msg_dtype=None, fp_pallas: bool | None = None,
                 sep_pallas: bool | None = None,
                 opt_k: int | None = None,
                 est_kernel: bool = True,
                 site_window: tuple[int, int] | None = None,
                 ref_rank: bool = False):
        """site_window=(s0, Ws): single-chip capacity mode — stage only
        CS columns [s0, s0+Ws) of the HBM-dominant per-node tensors
        (see DeviceTree.from_tree).  Every placed read's W-wide window
        must lie inside it; dispatch_win validates and raises on
        violators (callers route those reads to the host path)."""
        self.tree = tree
        self.W = min(window, tree.cs_len)
        self.C = max_nseed
        self.ref_rank = ref_rank    # emulate the binary's degenerate rank
        self.opt_k = opt_k          # None = optimize all live (faithful)
        self.est_kernel = est_kernel
        if site_window is not None:
            s0, Ws = site_window
            Ws = min(Ws, tree.cs_len - s0)
            if Ws < self.W:
                raise ValueError(f"site_window width {Ws} < placement "
                                 f"window {self.W}")
            site_window = (s0, Ws)
        self.site_window = site_window
        # single-kernel Pallas optimization loops on real TPUs; the
        # XLA while_loop everywhere else (interpret mode is slow).
        # sep_pallas fuses the WHOLE 3-branch optimization (subsuming
        # fp_pallas, which only fuses the inner fixed points).
        on_tpu = jax.default_backend() == "tpu"
        self.fp_pallas = on_tpu if fp_pallas is None else fp_pallas
        self.sep_pallas = on_tpu if sep_pallas is None else sep_pallas
        self.dt = DeviceTree.from_tree(tree, dtype, msg_dtype,
                                       site_window)
        if tree.model.name == "GTR":
            tensors = (jnp.asarray(tree.model.U, dtype),
                       jnp.asarray(tree.model.U_1, dtype),
                       jnp.asarray(tree.model.lam, dtype))
            self.pr_fn = make_pr_fn(tensors, "eig", dtype)
        else:
            self.pr_fn = make_pr_fn(tree.model, "closed", dtype)
        from .models import eig_tensors
        self.eig = tuple(jnp.asarray(t, dtype)
                         for t in eig_tensors(tree.model))
        self.n_rates = 1 if tree.dg is None else len(tree.dg.rates)

    @property
    def start_bound(self) -> int:
        """Largest valid clamped window start sc = min(start, bound):
        csLen-W normally, (s0+Ws)-W when a site window is resident."""
        if self.site_window is not None:
            s0, Ws = self.site_window
            return s0 + Ws - self.W
        return self.tree.cs_len - self.W

    def place_batch(self, seqs: np.ndarray, starts: np.ndarray,
                    ends: np.ndarray, max_diff: float = math.inf,
                    max_height: float = math.inf,
                    max_error: float = 20.0,
                    height_prior: bool = False, ml_only: bool = False,
                    summary_only: bool = False) -> dict:
        """Place aligned reads; clamps windows to the fixed width W.

        summary_only=True downloads ONLY the packed [B, 12] best-
        placement summary (c/p/a node, ratio, wnr, loglik, qPlace,
        qTaxon, height, annoDist, w0, valid) — a few KB instead of the
        full candidate grids, which matters when the device->host link
        is thin."""
        seqs = np.asarray(seqs, np.int8)
        sc = np.minimum(np.asarray(starts, np.int64), self.start_bound)
        wins = seqs[np.arange(len(seqs))[:, None],
                    sc[:, None] + np.arange(self.W)]
        return self.place_batch_win(wins, starts, ends, max_diff,
                                    max_height, max_error, height_prior,
                                    ml_only, summary_only)

    def dispatch_win(self, seq_wins: np.ndarray, starts: np.ndarray,
                     ends: np.ndarray, max_diff: float = math.inf,
                     max_height: float = math.inf,
                     max_error: float = 20.0,
                     height_prior: bool = False,
                     ml_only: bool = False) -> dict:
        """Enqueue placement of pre-sliced [B, W] windows; returns the
        dict of DEVICE arrays without blocking (jax dispatch is
        asynchronous), so the caller can overlap the kernel with host
        work and materialize later."""
        ends = np.minimum(ends, starts + self.W - 1)
        if self.site_window is not None:
            # every read's clamped window must START inside the
            # resident span (the upper end is enforced by the clamp)
            sc = np.minimum(np.asarray(starts, np.int64),
                            self.start_bound)
            bad = sc < self.site_window[0]
            if bad.any():
                raise OutOfWindowError(np.nonzero(bad)[0])
        s0, Ws = self.union_window(starts)
        return place_batch_device(
            self.dt, jnp.asarray(seq_wins, jnp.int8),
            jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32),
            self.pr_fn, max_diff, max_height, max_error, self.W, self.C,
            self.n_rates, self.tree.cs_len, height_prior, ml_only,
            self.fp_pallas, self.sep_pallas, self.eig,
            opt_k=self.opt_k, s0=jnp.asarray(s0, jnp.int32), Ws=Ws,
            est_kernel=self.est_kernel, ref_rank=self.ref_rank)

    def union_window(self, starts) -> tuple[int, int]:
        """(s0, Ws) covering every read's site window in the batch.

        Ws is bucketed to multiples of W (capped at csLen) so amplicon
        batches — whose reads share a primer-anchored span — reuse one
        jit specialization; the seed p-dist then reduces over Ws
        instead of csLen sites, which is the dominant FLOP count for
        reference-scale trees."""
        if self.site_window is not None:
            # window-resident mode: the staged window IS the union
            # window (the precomputed one-hot planes are aligned to it)
            return self.site_window
        L = self.tree.cs_len
        starts = np.asarray(starts, np.int64)
        sc = np.minimum(starts, L - self.W)
        lo = int(sc.min()) if len(starts) else 0
        span = (int(sc.max()) if len(starts) else 0) + self.W - lo
        Ws = min((span + self.W - 1) // self.W * self.W, L)
        s0 = max(0, min(lo, L - Ws))
        return s0, Ws

    def place_batch_win(self, seq_wins: np.ndarray, starts: np.ndarray,
                        ends: np.ndarray, max_diff: float = math.inf,
                        max_height: float = math.inf,
                        max_error: float = 20.0,
                        height_prior: bool = False,
                        ml_only: bool = False,
                        summary_only: bool = False) -> dict:
        """place_batch on pre-sliced [B, W] windows (the window starts
        at min(start, csLen-W)); only W bytes/read cross the host link.
        """
        out = self.dispatch_win(seq_wins, starts, ends, max_diff,
                                max_height, max_error, height_prior,
                                ml_only)
        if summary_only:
            return {"summary": np.asarray(out["summary"])}
        return {k: np.asarray(v) for k, v in out.items()}
