"""Batched Viterbi alignment on device (JAX/XLA).

TPU-native redesign of the reference DP (reference:
src/BandedHMMP7.cpp:748-780 full DP, :782-892 banded DP, :943-1006
traceback).  The reference fills an (L+1)x(K+1) cost matrix
cell-by-cell per read on one CPU thread; here a whole read batch is
processed at once with a `lax.scan` over read positions (rows).  Each
step updates all K+1 profile lanes of all B reads on the VPU:

  * M and I recurrences are elementwise in the lane dimension
    (they read the previous row only);
  * the within-row D chain  D(i,j) = min(M(i,j-1)+c_MD, D(i,j-1)+c_DD)
    is a min-plus linear recurrence solved with
    `lax.associative_scan` in O(log K) depth;
  * banding is expressed as per-read rectangular/diagonal cell masks
    computed on device from a handful of scalars (no per-cell mask
    transfer) — outside cells are pinned to +inf, which makes the
    banded and the full DP the same kernel.

Traceback runs on the host from packed 4-bit argmin planes (2 bits for
the M choice, 1 bit each for I and D), matching the reference's
whichMin tie-breaking (B,M,I,D first-strict-min order).

Known deviation from the reference: where banded regions overlap (the
single boundary row/column between a seed region and the downstream
extension), the reference recomputes those cells dropping the B-entry
option (BandedHMMP7.cpp:838-870) while this kernel allows B-entry if
any covering region allows it; this can only lower the cost of rare
boundary cells and does not change category assignments.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .profile import (HmmAlignment, K_MIN_GAP_FRAC, ProfileHMM,
                      ViterbiAlignPath, build_global_align)

INF = jnp.inf
# fine-grained stage timing (enable with HMMUFOTU_TIMING=1)
TIMING = {}


def _tick(key, t0):
    if os.environ.get("HMMUFOTU_TIMING"):
        TIMING[key] = TIMING.get(key, 0.0) + (time.time() - t0)
    return time.time()


# region tuple layout: (j_lo, j_hi, i_lo, i_hi, entry_ok, diag, lo_d, hi_d)
REGION_WIDTH = 8
MAX_REGIONS = 5


class DeviceHMM(NamedTuple):
    """Cost arrays of a ProfileHMM staged on device (a jax pytree)."""
    EM: jax.Array        # [4, K+1] match emission costs
    EI: jax.Array        # [4, K+1]
    TMM: jax.Array       # [K+1] transition costs by source position
    TMI: jax.Array
    TMD: jax.Array
    TIM: jax.Array
    TII: jax.Array
    TDM: jax.Array
    TDD: jax.Array
    entry: jax.Array     # [K+1]
    exit: jax.Array      # [K+1]
    t_NN: jax.Array      # scalars
    t_NB: jax.Array
    t_CC: jax.Array
    t_EC: jax.Array

    @property
    def K(self) -> int:
        return self.EM.shape[1] - 1

    @classmethod
    def from_profile(cls, hmm: ProfileHMM, dtype=jnp.float32) -> "DeviceHMM":
        t = hmm.Tmat_cost
        f = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            EM=f(hmm.E_M_cost), EI=f(hmm.E_I_cost),
            TMM=f(t[:, 0, 0]), TMI=f(t[:, 0, 1]), TMD=f(t[:, 0, 2]),
            TIM=f(t[:, 1, 0]), TII=f(t[:, 1, 1]),
            TDM=f(t[:, 2, 0]), TDD=f(t[:, 2, 2]),
            entry=f(hmm.entry_cost), exit=f(hmm.exit_cost),
            t_NN=f(hmm.t_NN_cost), t_NB=f(hmm.t_NB_cost),
            t_CC=f(hmm.t_CC_cost), t_EC=f(hmm.t_EC_cost),
        )


def full_dp_regions(n_rows: int, K: int) -> np.ndarray:
    """A single all-covering region with B-entry allowed (full DP)."""
    r = np.zeros((MAX_REGIONS, REGION_WIDTH), dtype=np.int32)
    r[0] = (1, K, 1, n_rows, 1, 0, 0, 0)
    return r


def banded_regions(vpaths: list[ViterbiAlignPath], K: int,
                   L_read: int) -> np.ndarray:
    """Region scalars replicating the reference's banded boundaries
    (reference calcViterbiScores banded, BandedHMMP7.cpp:782-892)."""
    r = np.zeros((MAX_REGIONS, REGION_WIDTH), dtype=np.int32)
    n = 0
    for p, vp in enumerate(vpaths):
        if p == 0:
            up_q = max(vp.from_ - 1, 0)
            up_start = max(int(vp.start - up_q * (1 + K_MIN_GAP_FRAC)), 1)
            up_from = max(int(vp.from_ - up_q * (1 + K_MIN_GAP_FRAC)), 1)
        else:
            prev = vpaths[p - 1]
            up_start = max(prev.end, 1)
            up_from = max(prev.to, 1)
        # upstream rectangle (B-entry allowed)
        r[n] = (up_start, vp.start, up_from, vp.from_, 1, 0, 0, 0)
        n += 1
        # the seed diagonal band (B-entry allowed, diag constrained)
        r[n] = (vp.start, vp.end, vp.from_, vp.to, 1, 1,
                -vp.n_del, vp.n_ins)
        n += 1
    last = vpaths[-1]
    down_q = L_read - last.to
    down_end = min(int(last.end + down_q * (1 + K_MIN_GAP_FRAC)), K)
    down_to = min(int(last.to + down_q * (1 + K_MIN_GAP_FRAC)), L_read)
    r[n] = (last.end, down_end, last.to, down_to, 0, 0, 0, 0)
    return r


def _row_masks(regions: jax.Array, i: jax.Array, jj: jax.Array):
    """allowed[K+1] and entry_ok[K+1] lane masks for row i from region
    scalars [R, 8]; jj = lane indices [K+1]."""
    j_lo, j_hi, i_lo, i_hi, entry, diag, lo_d, hi_d = [
        regions[:, c][:, None] for c in range(REGION_WIDTH)]
    in_rect = ((jj[None, :] >= j_lo) & (jj[None, :] <= j_hi)
               & (i >= i_lo) & (i <= i_hi))
    dist = (i - i_lo) - (jj[None, :] - j_lo)   # diagnalDist (h:705-708)
    ok_diag = (diag == 0) | ((dist >= lo_d) & (dist <= hi_d))
    covered = in_rect & ok_diag
    allowed = covered.any(axis=0)
    entry_ok = (covered & (entry == 1)).any(axis=0)
    return allowed, entry_ok


@partial(jax.jit, static_argnames=("n_rows",))
def viterbi_scan(dh: DeviceHMM, codes: jax.Array, lengths: jax.Array,
                 regions: jax.Array, n_rows: int):
    """Run the batched Viterbi DP.

    codes: [B, n_rows] int8 read bases (0..3; padding ignored)
    lengths: [B] int32
    regions: [B, MAX_REGIONS, 8] int32 band regions
    Returns (min_score [B], min_i [B], min_j [B],
             choices [n_rows, B, K+1] uint8).
    """
    B = codes.shape[0]
    K = dh.K
    dtype = dh.EM.dtype
    jj = jnp.arange(K + 1)

    def shift1(x, fill=INF):
        """x[..., j] -> x[..., j-1] with +inf at lane 0."""
        pad = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-1]], axis=-1)

    TMM_sh = shift1(dh.TMM)
    TIM_sh = shift1(dh.TIM)
    TDM_sh = shift1(dh.TDM)
    TMD_sh = shift1(dh.TMD)
    TDD_sh = shift1(dh.TDD)

    d_invalid = (jj <= 1) | (jj >= K)   # D1 and DK are wing-retracted

    def step(carry, i):
        Mp, Ip, Dp, best, best_i, best_j = carry
        b = jnp.clip(codes[:, i - 1], 0, 3).astype(jnp.int32)
        em = dh.EM[b]                    # [B, K+1] (axis 0 = base)
        ei = dh.EI[b]

        col0 = jnp.where(i == 1, jnp.zeros((), dtype),
                         dh.t_NN * (i - 1)) + dh.t_NB

        allowed, entry_ok = jax.vmap(_row_masks, in_axes=(0, None, None))(
            regions, i, jj)
        allowed = allowed & (jj >= 1)
        entry_ok = entry_ok & (jj >= 1)

        optB = jnp.where(entry_ok, col0 + dh.entry[None, :], INF)
        optM = shift1(Mp) + TMM_sh[None, :]
        optI = shift1(Ip) + TIM_sh[None, :]
        optD = shift1(Dp) + TDM_sh[None, :]
        stacked = jnp.stack([optB, optM, optI, optD])       # [4, B, K+1]
        Mn = em + stacked.min(axis=0)
        choiceM = stacked.argmin(axis=0).astype(jnp.uint8)
        # traceback at j==1 considers only the B/I pair (cpp:966-973)
        c1 = jnp.where(optB[:, 1] <= optI[:, 1], 0, 2).astype(jnp.uint8)
        choiceM = choiceM.at[:, 1].set(c1)
        Mn = jnp.where(allowed, Mn, INF)
        Mn = Mn.at[:, 0].set(col0)

        iM = Mp + dh.TMI[None, :]
        iI = Ip + dh.TII[None, :]
        In = ei + jnp.minimum(iM, iI)
        choiceI = (iM > iI).astype(jnp.uint8)
        In = jnp.where(allowed, In, INF)
        In = In.at[:, 0].set(col0)
        # j==0 I choice: current-row B column vs I(i-1,0) (cpp:978-983)
        choiceI = choiceI.at[:, 0].set(
            (Mn[:, 0] + dh.TMI[0] > Ip[:, 0] + dh.TII[0]).astype(jnp.uint8))

        # D chain x_j = min(a_j, x_{j-1} + c_j) via min-plus
        # associative scan in O(log K) depth
        Mn_sh = shift1(Mn)
        a = jnp.where(~d_invalid[None, :] & allowed,
                      Mn_sh + TMD_sh[None, :], INF)
        c = jnp.where(~d_invalid[None, :] & allowed, TDD_sh[None, :], INF)

        def combine(x, y):
            cx, ax = x
            cy, ay = y
            return cx + cy, jnp.minimum(ax + cy, ay)

        _, Dn = jax.lax.associative_scan(combine, (c, a), axis=1)
        Dn = jnp.where(d_invalid[None, :], INF, Dn)
        # D choice: fresh from M(i,j-1) vs continue D(i,j-1) (cpp:996)
        choiceD = (Mn_sh + TMD_sh[None, :]
                   > shift1(Dn) + TDD_sh[None, :]).astype(jnp.uint8)

        # final S row (cpp:772-779): M cols + IK exit, E->C, C loops
        rem = (lengths - i).astype(dtype)
        c_loops = jnp.where(i < lengths, dh.t_CC * rem,
                            jnp.zeros((), dtype))
        s_m = Mn + dh.exit[None, :] + dh.t_EC + c_loops[:, None]
        s_i = In[:, K] + dh.TIM[K] + dh.t_EC + c_loops
        live = i <= lengths
        s_m = jnp.where(live[:, None], s_m, INF)
        s_i = jnp.where(live, s_i, INF)
        row_all = jnp.concatenate([s_m, s_i[:, None]], axis=1)  # [B, K+2]
        row_j = row_all.argmin(axis=1).astype(jnp.int32)
        row_min = row_all.min(axis=1)
        # column-major (j-first) first-occurrence tie-breaking like
        # Eigen minCoeff (cpp:945)
        upd = (row_min < best) | ((row_min == best) & (row_j < best_j))
        best = jnp.where(upd, row_min, best)
        best_i = jnp.where(upd, jnp.int32(i), best_i)
        best_j = jnp.where(upd, row_j, best_j)

        choices = (choiceM | (choiceI << 2) | (choiceD << 3)).astype(
            jnp.uint8)
        return (Mn, In, Dn, best, best_i, best_j), choices

    # derive the init carry from the inputs so its device-varying type
    # matches under shard_map (scan carries must keep a consistent vma)
    zb = (codes[:, 0] * 0).astype(dtype)          # [B] varying zeros
    zbi = (codes[:, 0] * 0).astype(jnp.int32)
    init = (INF + zb[:, None] + jnp.zeros((1, K + 1), dtype),
            INF + zb[:, None] + jnp.zeros((1, K + 1), dtype),
            INF + zb[:, None] + jnp.zeros((1, K + 1), dtype),
            INF + zb,
            zbi,
            jnp.iinfo(jnp.int32).max + zbi)
    (_, _, _, best, best_i, best_j), choices = jax.lax.scan(
        step, init, jnp.arange(1, n_rows + 1, dtype=jnp.int32))
    return best, best_i, best_j, choices


@partial(jax.jit, static_argnames=("K", "max_steps"))
def traceback_device(choices: jax.Array, min_i: jax.Array,
                     min_j: jax.Array, K: int, max_steps: int):
    """Batched traceback on device (the host version below transfers
    the full [n_rows, B, K+1] choice planes; this walks them on device
    and ships only the [B, max_steps] state strings).

    choices: [n_rows, B, K+1] uint8; min_i/min_j: [B].
    Returns (trace [B, max_steps] int8 REVERSED (state codes
    0=B,1=M,2=I,3=D,4=E,5=pad), aln_start, aln_end, aln_from, aln_to).
    """
    n_rows, B, lanes = choices.shape
    flat = choices.reshape(-1)

    s0 = jnp.where(min_j <= K, 1, 2).astype(jnp.int8)   # M or I
    i0 = min_i
    j0 = jnp.minimum(min_j, K)

    def step(carry, t):
        s, i, j, done = carry
        live = ~done & (i >= 1) & (j >= 0)
        emit = jnp.where(live, s, 5).astype(jnp.int8)
        idx = (i - 1) * (B * lanes) + jnp.arange(B) * lanes + j
        ch = jnp.take(flat, jnp.clip(idx, 0, flat.size - 1))
        ch = jnp.where(live, ch, 0)
        cm = (ch & 3).astype(jnp.int8)                  # BMID code
        ci = ((ch >> 2) & 1).astype(jnp.int8)
        cd = ((ch >> 3) & 1).astype(jnp.int8)
        is_m = s == 1
        is_i = s == 2
        is_d = s == 3
        # next state by current state (cpp:966-1000)
        nxt_m = cm
        nxt_i = jnp.where(j > 0, jnp.where(ci == 0, 1, 2),
                          jnp.where(ci == 0, 0, 2)).astype(jnp.int8)
        nxt_d = jnp.where(cd == 0, 1, 3).astype(jnp.int8)
        s_n = jnp.where(is_m, nxt_m,
                        jnp.where(is_i, nxt_i,
                                  jnp.where(is_d, nxt_d, s)))
        i_n = i - jnp.where(is_m | is_i, 1, 0)
        j_n = j - jnp.where(is_m | is_d, 1, 0)
        # stop after emitting B, or when out of bounds
        done_n = done | (live & (s == 0)) | ~live
        s2 = jnp.where(live, s_n, s)
        i2 = jnp.where(live, i_n, i)
        j2 = jnp.where(live, j_n, j)
        return (s2, i2, j2, done_n), emit

    init = (s0, i0, j0, jnp.zeros((B,), bool))
    (s_f, i_f, j_f, _), emits = jax.lax.scan(
        step, init, jnp.arange(max_steps))
    # emits[t] is the state emitted at step t, in reverse path order
    aln_start = j_f + 1
    aln_from = i_f + 1
    return emits.T, aln_start, j0, aln_from, i0


def traceback(choices: np.ndarray, min_i: int, min_j: int, K: int
              ) -> tuple[str, int, int, int, int]:
    """Host traceback over the packed choice planes
    (reference buildViterbiTrace, BandedHMMP7.cpp:943-1006).

    choices: [n_rows, K+1] uint8 for ONE read (row r = seq pos r+1)
    Returns (trace, aln_start, aln_end, aln_from, aln_to), 1-based.
    """
    s = "M" if min_j <= K else "I"
    i = min_i
    j = min_j if min_j <= K else K
    aln_end, aln_to = j, i
    trace = ["E"]
    codes_m = "BMID"
    while i >= 1 and j >= 0:
        trace.append(s)
        ch = int(choices[i - 1, j])
        if s == "M":
            s = codes_m[ch & 3]
            i -= 1
            j -= 1
        elif s == "I":
            c = (ch >> 2) & 1
            s = ("MI" if j > 0 else "BI")[c]
            i -= 1
        elif s == "D":
            s = "MD"[(ch >> 3) & 1]
            j -= 1
        else:  # B
            break
    aln_start = j + 1
    aln_from = i + 1
    if trace[-1] != "B":
        trace.append("B")
    return "".join(reversed(trace)), aln_start, aln_end, aln_from, aln_to


@jax.jit
def pack_choices(choices: jax.Array) -> jax.Array:
    """Pack two 4-bit choice cells per byte along the lane axis to
    halve the device->host transfer."""
    n_rows, B, lanes = choices.shape
    if lanes % 2:
        choices = jnp.concatenate(
            [choices, jnp.zeros((n_rows, B, 1), jnp.uint8)], axis=2)
    return choices[:, :, 0::2] | (choices[:, :, 1::2] << 4)


def unpack_choices(packed: np.ndarray, lanes: int) -> np.ndarray:
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,),
                   dtype=np.uint8)
    out[..., 0::2] = packed & 0x0F
    out[..., 1::2] = packed >> 4
    return out[..., :lanes]


class ViterbiAligner:
    """High-level batched aligner: device DP + traceback/align.

    traceback_mode: 'host' downloads packed choice planes and walks
    them in numpy/python (best when transfers are cheap); 'device'
    walks them in a device scan and ships only the state strings
    (best when the host link is thin but sequential scans are fast).
    """

    def __init__(self, hmm: ProfileHMM, dtype=jnp.float32,
                 traceback_mode: str | None = None,
                 kernel: str | None = None):
        self.hmm = hmm
        self.dh = DeviceHMM.from_profile(hmm, dtype)
        if kernel is None:
            # the Pallas kernel is the fast path on real TPUs; the
            # XLA scan is used elsewhere (interpret mode is slow)
            kernel = "pallas" if jax.default_backend() == "tpu" \
                else "scan"
        self.kernel = kernel
        if traceback_mode is None:
            # on TPU the device walk avoids downloading the choice
            # planes entirely (the host link dominates otherwise)
            traceback_mode = "device" if kernel == "pallas" else "host"
        self.traceback_mode = traceback_mode

    def _run_dp(self, codes, lengths, regions, n_rows):
        if self.kernel == "pallas":
            from .pallas_viterbi import viterbi_pallas
            return viterbi_pallas(self.dh, codes, lengths, regions,
                                  n_rows)
        return viterbi_scan(self.dh, codes, lengths, regions, n_rows)

    def refresh(self):
        """Re-stage cost arrays (after a mode change on the host hmm)."""
        self.dh = DeviceHMM.from_profile(self.hmm, self.dh.EM.dtype)

    def align_batch(self, seqs: list[str],
                    vpaths_per_read: list[list[ViterbiAlignPath] | None]
                    | None = None,
                    max_len: int | None = None) -> list[HmmAlignment]:
        """Align a batch of reads; vpaths_per_read[i] is None/[] for a
        full (unbanded) DP, else the seed paths for a banded DP.
        Reads whose banded DP finds no finite path are automatically
        re-run unbanded (reference HmmUFOtu_main.cpp:89-96)."""
        return self.finalize_batch(
            self.dispatch_batch(seqs, vpaths_per_read, max_len))

    def dispatch_batch(self, seqs, vpaths_per_read=None,
                       max_len: int | None = None):
        """Launch the device DP asynchronously; returns an opaque
        handle for finalize_batch.  Lets a caller overlap the host
        stages of one batch with the device DP of the next."""
        hmm = self.hmm
        B0 = len(seqs)
        if vpaths_per_read is None:
            vpaths_per_read = [None] * B0
        # pad the batch to a multiple of the pallas reads-per-program
        if self.kernel == "pallas":
            from .pallas_viterbi import READS_PER_PROGRAM as RPP
            B = (B0 + RPP - 1) // RPP * RPP
        else:
            B = B0
        if B != B0:
            seqs = list(seqs) + [seqs[0]] * (B - B0)
            vpaths_per_read = list(vpaths_per_read) \
                + [None] * (B - B0)
        n_rows = max_len or max(len(s) for s in seqs)
        if self.kernel == "pallas":
            n_rows = (n_rows + 7) // 8 * 8
        codes = np.zeros((B, n_rows), dtype=np.int8)
        lengths = np.zeros(B, dtype=np.int32)
        regions = np.zeros((B, MAX_REGIONS, REGION_WIDTH), dtype=np.int32)
        for r, s in enumerate(seqs):
            enc = hmm.abc.encode(s.upper())
            codes[r, :len(enc)] = np.clip(enc, 0, 3)
            lengths[r] = len(s)
            vps = vpaths_per_read[r]
            if vps:
                regions[r] = banded_regions(vps, hmm.K, len(s))
            else:
                regions[r] = full_dp_regions(n_rows, hmm.K)

        t = time.time()
        if self.kernel == "pallas" and self.traceback_mode == "device":
            # single-kernel DP + in-kernel traceback: only the packed
            # state strings and bounds ever leave the device, fused
            # into ONE [B, 8+TPS] int32 array = one host download
            # (each device->host fetch through a tunneled link pays a
            # large fixed latency)
            from .pallas_viterbi import viterbi_pallas_traced_split
            score, comb = viterbi_pallas_traced_split(
                self.dh, codes, lengths, regions, n_rows)
            _tick("dp_dispatch", t)
            return (seqs, B0, B, n_rows, codes, lengths, regions,
                    vpaths_per_read, score, comb, None, None)
        score, mi, mj, choices = self._run_dp(
            jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(regions), n_rows)
        _tick("dp_dispatch", t)
        return (seqs, B0, B, n_rows, codes, lengths, regions,
                vpaths_per_read, score, mi, mj, choices)

    def finalize_batch(self, handle) -> list[HmmAlignment]:
        """Download DP results, run fallbacks, traceback and build the
        alignment strings for a dispatched batch."""
        hmm = self.hmm
        (seqs, B0, B, n_rows, codes, lengths, regions,
         vpaths_per_read, score, mi, mj, choices) = handle
        traced = (self.kernel == "pallas"
                  and self.traceback_mode == "device")
        t = time.time()
        jax.block_until_ready(score)
        t = _tick("dp", t)
        if traced:
            # ONE combined fetch: cols 0:8 = score+bounds (f32 bits),
            # cols 8: = nibble-packed traceback state strings
            comb_h = np.asarray(mi)
            sb_h = comb_h[:, :8].view(np.float32)
            emits_h = comb_h[:, 8:]
            score_h = sb_h[:, 0]
        else:
            score_h = np.asarray(score)
        t = _tick("scalars_dl", t)

        # banded failures -> full DP rerun, merged on device
        failed = np.array([not np.isfinite(score_h[r])
                           and bool(vpaths_per_read[r])
                           for r in range(B)])
        if failed.any():
            regions2 = regions.copy()
            for r in np.nonzero(failed)[0]:
                regions2[r] = full_dp_regions(n_rows, hmm.K)
            fmask = jnp.asarray(failed)
            if traced:
                # host-side row merge: the rerun's comb width may
                # differ from the first pass's (narrow-band TPS vs
                # full-width TPS) — pad both to the wider layout
                from .pallas_viterbi import (PAD_WORD,
                                             viterbi_pallas_traced_split)
                s2, comb2 = viterbi_pallas_traced_split(
                    self.dh, codes, lengths, regions2, n_rows)
                comb2_h = np.asarray(comb2)
                wmax = max(comb_h.shape[1], comb2_h.shape[1])

                def _padw(a):
                    out = np.full((a.shape[0], wmax), PAD_WORD,
                                  np.int32)
                    out[:, :a.shape[1]] = a
                    return out

                comb_h = _padw(comb_h)
                comb_h[failed] = _padw(comb2_h)[failed]
                sb_h = comb_h[:, :8].view(np.float32)
                emits_h = comb_h[:, 8:]
                score_h = sb_h[:, 0]
            else:
                s2, i2, j2, c2 = self._run_dp(
                    jnp.asarray(codes), jnp.asarray(lengths),
                    jnp.asarray(regions2), n_rows)
                score = jnp.where(fmask, s2, score)
                mi = jnp.where(fmask, i2, mi)
                mj = jnp.where(fmask, j2, mj)
                choices = jnp.where(fmask[None, :, None], c2, choices)
                score_h = np.asarray(score)

        alns: list[HmmAlignment] = []
        if traced:
            # in-kernel traceback: the combined download above already
            # holds the packed state strings + bounds
            from .pallas_viterbi import unpack_emits
            from .profile import build_global_align_path
            t = time.time()
            emits = unpack_emits(emits_h)
            bounds = sb_h[:, 3:7].astype(np.int32)
            t = _tick("trace_dl", t)
            for r in range(B):
                if not np.isfinite(score_h[r]):
                    alns.append(HmmAlignment())
                    continue
                path = emits[r][emits[r] != 5][::-1]   # forward order
                if path.size and path[0] == 0:
                    path = path[1:]                    # implied B
                alns.append(build_global_align_path(
                    hmm, seqs[r], path, int(bounds[r, 0]),
                    int(bounds[r, 1]), int(bounds[r, 2]),
                    int(bounds[r, 3]), float(score_h[r])))
            _tick("host_build", t)
            return alns[:B0]
        if self.kernel == "pallas":
            from .pallas_viterbi import PACK_ROWS
            t = time.time()
            packed_h = np.asarray(choices)
            t = _tick("choices_dl", t)
            mi_h = np.asarray(mi)
            mj_h = np.asarray(mj)
            t = _tick("unpack", t)
            for r in range(B):
                if not np.isfinite(score_h[r]):
                    alns.append(HmmAlignment())
                    continue
                trace, a_start, a_end, a_from, a_to = \
                    traceback_packed(packed_h, r, int(mi_h[r]),
                                     int(mj_h[r]), hmm.K)
                alns.append(build_global_align(
                    hmm, seqs[r], trace, a_start, a_end, a_from,
                    a_to, float(score_h[r])))
            _tick("host_trace", t)
            return alns[:B0]
        if self.traceback_mode == "device":
            # ship [B, steps] state codes, not the full choice planes
            max_steps = n_rows + hmm.K + 2
            emits, a_start, a_end, a_from, a_to = traceback_device(
                choices, mi, mj, hmm.K, max_steps)
            emits = np.asarray(emits)
            a_start = np.asarray(a_start)
            a_end = np.asarray(a_end)
            a_from = np.asarray(a_from)
            a_to = np.asarray(a_to)
            codes_str = "BMIDE"
            for r in range(B):
                if not np.isfinite(score_h[r]):
                    alns.append(HmmAlignment())
                    continue
                path = emits[r][emits[r] != 5]
                trace = "".join(codes_str[c] for c in path[::-1])
                if not trace.startswith("B"):
                    trace = "B" + trace
                trace += "E"
                alns.append(build_global_align(
                    hmm, seqs[r], trace, int(a_start[r]),
                    int(a_end[r]), int(a_from[r]), int(a_to[r]),
                    float(score_h[r])))
            return alns[:B0]

        ch = unpack_choices(np.asarray(pack_choices(choices)),
                            hmm.K + 1)
        mi_h = np.asarray(mi)
        mj_h = np.asarray(mj)
        for r in range(B):
            if not np.isfinite(score_h[r]):
                alns.append(HmmAlignment())
                continue
            trace, a_start, a_end, a_from, a_to = traceback(
                ch[:, r], int(mi_h[r]), int(mj_h[r]), hmm.K)
            alns.append(build_global_align(
                hmm, seqs[r], trace, a_start, a_end, a_from, a_to,
                float(score_h[r])))
        return alns[:B0]


def traceback_packed(packed: np.ndarray, read: int, min_i: int,
                     min_j: int, K: int
                     ) -> tuple[str, int, int, int, int]:
    """Host traceback reading the nibble-packed planes directly (no
    bulk unpack; only the ~path-length cells are touched).

    packed: [n_rows/8, B, KP] int32 from viterbi_pallas.
    """
    s = "M" if min_j <= K else "I"
    i = min_i
    j = min_j if min_j <= K else K
    aln_end, aln_to = j, i
    trace = ["E"]
    codes_m = "BMID"
    plane = packed[:, read, :]
    while i >= 1 and j >= 0:
        trace.append(s)
        shift = 4 * (7 - ((i - 1) & 7))
        ch = (int(plane[(i - 1) >> 3, j]) >> shift) & 15
        if s == "M":
            s = codes_m[ch & 3]
            i -= 1
            j -= 1
        elif s == "I":
            c = (ch >> 2) & 1
            s = ("MI" if j > 0 else "BI")[c]
            i -= 1
        elif s == "D":
            s = "MD"[(ch >> 3) & 1]
            j -= 1
        else:  # B
            break
    aln_start = j + 1
    aln_from = i + 1
    if trace[-1] != "B":
        trace.append("B")
    return "".join(reversed(trace)), aln_start, aln_end, aln_from, aln_to
