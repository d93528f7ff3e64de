"""Pallas TPU kernel for the banded Viterbi DP.

The XLA `lax.scan` formulation (viterbi.py) issues dozens of small
kernels per read position; this kernel runs the ENTIRE (L+1)x(K+1)
row recurrence of 8 reads per program in one Pallas kernel with all
DP state resident in VMEM:

  * M/I recurrences: elementwise over the [8, KP] lane tile;
  * the within-row D chain as an in-register Hillis-Steele min-plus
    doubling scan (log2(KP) rolled-min steps);
  * banding via region scalars (same semantics as
    viterbi.banded_regions);
  * per-row S minima tracked in the loop carry with the reference's
    column-major tie-breaking;
  * 4-bit traceback choices nibble-packed 8 rows per int32 plane
    (aligned (8,128) int32 stores + 4x smaller transfer).

reference: src/BandedHMMP7.cpp:748-892 (the per-cell CPU DP).
Numerics and choice encoding identical to viterbi.viterbi_scan — the
two paths are cross-checked in tests (choice planes may differ only
at ulp-level cost ties from float summation order in the D chain).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi import DeviceHMM, MAX_REGIONS, REGION_WIDTH

INF = jnp.inf
# reads per kernel program.  Mosaic ops on [8, lanes] tiles cost the
# same at 384 and 1408 lanes (lane width is effectively free), but
# R=16 measured 16% SLOWER end-to-end than R=8 — the native vreg is
# (8, 128) sublanes x lanes, so doubling R doubles the vreg count per
# op while also lengthening the shared traceback walk.  8 it is.
READS_PER_PROGRAM = int(os.environ.get("HMMUFOTU_DP_RPP", "8"))
if READS_PER_PROGRAM <= 0 or READS_PER_PROGRAM % 8:
    raise ValueError(
        "HMMUFOTU_DP_RPP must be a positive multiple of 8: the kernel's "
        "[R, KP] blocks and R-row traceback assume (8, 128) sublane "
        f"tiling (got {READS_PER_PROGRAM})")
PACK_ROWS = 8   # DP rows packed per int32 choice plane


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


PAD_NIBBLE = 5                       # traceback pad state
PAD_WORD = 0x55555555                # 8 pad nibbles per int32


def _viterbi_kernel(scal_s, jb_s, codes_ref, meta_ref, tc_ref, em_ref,
                    *refs, n_rows: int, K: int, KP: int,
                    max_steps: int, traced: bool = False,
                    banded: bool = False,
                    n_regions: int = MAX_REGIONS,
                    dchain: int = 1 << 30):
    """One program = READS_PER_PROGRAM reads, full row loop.

    scal_s:  scalar-prefetch [8] f32 special costs
             (t_NN, t_NB, t_CC, t_EC, Tmat_cost[K](I,M))
    jb_s:    scalar-prefetch [B] int32 per-read band origin (absolute
             profile position of lane 0; all-zero unless `banded`)
    codes_ref [R, NRP] int32 read bases 0..3 (row-padded to 128 lanes)
              — per row the base column is extracted with ONE wide
              mask+reduce instead of R scalar SMEM loads
    meta_ref [R, 128] int32: col 0 = read length, cols 8.. = regions
    tc_ref [16, KPF] f32 packed transition costs, em_ref [8, KPF] f32
           (always FULL profile width)

    `banded`: lanes are RELATIVE band coordinates — lane l of read r
    is absolute profile position jb_s[r] + l, and KP is the band width
    (lane count), typically a few 128-lane tiles instead of the full
    padded profile.  Cost/emission rows are rotated per read into band
    coordinates once at kernel start (pltpu.roll with a dynamic
    shift); every j-semantic comparison uses the absolute position
    jabs = lane + jb.  The banded-region DP only has finite cells
    inside each read's region span, so a window covering
    [min j_lo - 1, max j_hi] loses nothing (the reference's banded DP
    never touches cells outside the regions either,
    BandedHMMP7.cpp:782-892).
    """
    if traced:
        # choice planes never leave the chip: VMEM scratch, read back
        # only by the in-kernel traceback (saves the [n_rows/8, B, KP]
        # int32 HBM output — ~740 MB/4096-read batch at fixture shape)
        best_ref, emits_ref, choices_ref = refs
    else:
        choices_ref, best_ref, emits_ref = refs
    R = READS_PER_PROGRAM
    KPF = tc_ref.shape[1]            # full padded profile width
    prog = pl.program_id(0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (R, KP), 1)

    def shift_lanes(x, s, fill):
        """x[..., l] -> x[..., l-s], `fill` in the first s lanes."""
        rolled = pltpu.roll(x, s, 1)
        return jnp.where(jj < s, fill, rolled)

    t_NN = scal_s[0]
    t_NB = scal_s[1]
    t_CC = scal_s[2]
    t_EC = scal_s[3]
    tIMK = scal_s[4]

    # rows of tc_ref: 0 TMM_sh 1 TIM_sh 2 TDM_sh 3 TMD_sh 4 TDD_sh
    # 5 TMI 6 TII 7 entry 8 exit
    if banded:
        jb_list = [jb_s[prog * R + r] for r in range(R)]
        jb = jnp.stack(jb_list).reshape(R, 1)        # [R, 1] int32
        jabs = jj + jb
        # rotate the shared cost/emission rows into each read's band
        # coordinates (one-time; the row loop then works on KP lanes).
        # Lanes whose absolute position wraps past KPF read garbage
        # cost values, but their jabs > K so every recurrence masks
        # them to +inf below.
        tc_r, em_r = [], []
        for r in range(R):
            sh = (KPF - jb_list[r]) % KPF
            tc_r.append(pltpu.roll(tc_ref[:, :], sh, 1)[:, :KP])
            em_r.append(pltpu.roll(em_ref[:, :], sh, 1)[:, :KP])

        def tc_plane(row):
            return jnp.concatenate(
                [tc_r[r][row:row + 1, :] for r in range(R)], axis=0)

        def em_plane(row):
            return jnp.concatenate(
                [em_r[r][row:row + 1, :] for r in range(R)], axis=0)
    else:
        jb = jnp.zeros((R, 1), jnp.int32)
        jabs = jj

        def tc_plane(row):
            return tc_ref[row:row + 1, :]

        def em_plane(row):
            return em_ref[row:row + 1, :]

    TMM_sh = tc_plane(0)
    TIM_sh = tc_plane(1)
    TDM_sh = tc_plane(2)
    TMD_sh = tc_plane(3)
    TDD_sh = tc_plane(4)
    TMI = tc_plane(5)
    TII = tc_plane(6)
    entry_c = tc_plane(7)
    exit_c = tc_plane(8)
    EM_pl = [em_plane(b) for b in range(4)]
    EI_pl = [em_plane(b + 4) for b in range(4)]

    lane_valid = jabs <= K
    d_invalid = (jabs <= 1) | (jabs >= K)
    is_lane_k = jabs == K

    lengths = meta_ref[:, 0:1]                      # [R, 1] int32

    # each region covers, at row i, one contiguous j-interval:
    # the j-rectangle [j_lo, j_hi] clamped to valid lanes [1, K],
    # optionally intersected with the diagonal band
    # [j_lo + (i - i_lo) - hi_d, j_lo + (i - i_lo) - lo_d].
    # All bounds are [R, 1] int32 scalars (an 11x narrower tile than
    # [R, KP]); per row each region costs two wide compares + ors
    # instead of the previous per-lane rectangle/diagonal masks.
    reg_pre = []
    for reg in range(n_regions):
        base = 8 + reg * REGION_WIDTH
        j_lo = meta_ref[:, base + 0:base + 1]
        j_hi = meta_ref[:, base + 1:base + 2]
        i_lo = meta_ref[:, base + 2:base + 3]
        i_hi = meta_ref[:, base + 3:base + 4]
        ent = meta_ref[:, base + 4:base + 5]
        diag = meta_ref[:, base + 5:base + 6]
        lo_d = meta_ref[:, base + 6:base + 7]
        hi_d = meta_ref[:, base + 7:base + 8]
        j_lo1 = jnp.maximum(j_lo, 1)                      # [R, 1]
        j_hi1 = jnp.minimum(j_hi, K)
        reg_pre.append((j_lo1, j_hi1, j_lo, i_lo, i_hi, lo_d, hi_d,
                        diag != 0, ent == 1))

    def masks_for_row(i):
        allowed = jnp.zeros((R, KP), jnp.bool_)
        entry_ok = jnp.zeros((R, KP), jnp.bool_)
        for (j_lo1, j_hi1, j_lo, i_lo, i_hi, lo_d, hi_d, isdiag,
             ent1) in reg_pre:
            ci = i - i_lo                                 # [R, 1]
            lo = jnp.where(isdiag,
                           jnp.maximum(j_lo1, j_lo + ci - hi_d), j_lo1)
            hi = jnp.where(isdiag,
                           jnp.minimum(j_hi1, j_lo + ci - lo_d), j_hi1)
            lo = jnp.where((i >= i_lo) & (i <= i_hi), lo,
                           jnp.int32(2 ** 30))
            cov = (jabs >= lo) & (jabs <= hi)             # [R, KP]
            allowed = allowed | cov
            entry_ok = entry_ok | (cov & ent1)
        return allowed, entry_ok

    NRP = codes_ref.shape[1]
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (R, NRP), 1)

    def body(i, carry):
        Mp, Ip, Dp, best, best_i, best_j, packbuf = carry
        # per-read base of row i via one wide mask+reduce over the
        # VMEM codes tile; broadcast-select of the 4 emission rows
        # then beats 16 dynamic sublane slices + concats
        b_vec = jnp.sum(jnp.where(code_iota == i - 1,
                                  codes_ref[:, :], 0),
                        axis=1, keepdims=True)      # [R, 1] int32
        em = EM_pl[0] + jnp.zeros((R, KP), jnp.float32)
        ei = EI_pl[0] + jnp.zeros((R, KP), jnp.float32)
        for b in range(1, 4):
            pick = b_vec == b
            em = jnp.where(pick, EM_pl[b], em)
            ei = jnp.where(pick, EI_pl[b], ei)

        fi = i.astype(jnp.float32)
        col0 = jnp.where(i == 1, 0.0, t_NN * (fi - 1.0)) + t_NB

        allowed, entry_ok = masks_for_row(i)

        optB = jnp.where(entry_ok, col0 + entry_c, INF)
        optM = shift_lanes(Mp, 1, INF) + TMM_sh
        optI = shift_lanes(Ip, 1, INF) + TIM_sh
        optD = shift_lanes(Dp, 1, INF) + TDM_sh
        mn = jnp.minimum(jnp.minimum(optB, optM),
                         jnp.minimum(optI, optD))
        Mn = em + mn
        # first-strict-min order B,M,I,D (whichMin, h:722-744)
        choiceM = jnp.where(
            optB <= mn, 0, jnp.where(
                optM <= mn, 1, jnp.where(optI <= mn, 2, 3)))
        # j==1 traceback uses the B/I pair only (cpp:966-973)
        c1 = jnp.where(optB <= optI, 0, 2)
        choiceM = jnp.where(jabs == 1, c1, choiceM)
        Mn = jnp.where(allowed, Mn, INF)
        Mn = jnp.where(jabs == 0, col0, Mn)

        iM = Mp + TMI
        iI = Ip + TII
        In = ei + jnp.minimum(iM, iI)
        choiceI = (iM > iI).astype(jnp.int32)
        In = jnp.where(allowed, In, INF)
        In = jnp.where(jabs == 0, col0, In)
        # j==0 I choice: current-row B column vs I(i-1,0)
        ci0 = (Mn[:, 0:1] + TMI[:, 0:1]
               > Ip[:, 0:1] + TII[:, 0:1]).astype(jnp.int32)
        choiceI = jnp.where(jabs == 0, ci0, choiceI)

        # D chain x_j = min(a_j, x_{j-1} + c_j): min-plus doubling.
        # The scan only needs to cover the longest run of consecutive
        # allowed D cells in any row; `dchain` is a host-computed
        # static bound on that run (sum of region widths per read,
        # viterbi_pallas_traced_split) — banded reads need 5-6 steps
        # instead of log2(KP).
        Mn_sh = shift_lanes(Mn, 1, INF)
        dmask = ~d_invalid & allowed
        a = jnp.where(dmask, Mn_sh + TMD_sh, INF)
        c = jnp.where(dmask, TDD_sh + jnp.zeros((R, KP), jnp.float32),
                      INF)
        s = 1
        while s < min(dchain, KP):
            a_sh = shift_lanes(a, s, INF)
            c_sh = shift_lanes(c, s, 0.0)
            a = jnp.minimum(a_sh + c, a)
            c = c_sh + c
            s *= 2
        Dn = jnp.where(d_invalid, INF, a)
        choiceD = (Mn_sh + TMD_sh
                   > shift_lanes(Dn, 1, INF) + TDD_sh) \
            .astype(jnp.int32)

        # S row + running best (column-major tie-break)
        live = i <= lengths                         # [R, 1]
        rem = (lengths - i).astype(jnp.float32)
        c_loops = jnp.where(i < lengths, t_CC * rem, 0.0)  # [R, 1]
        s_m = Mn + exit_c + t_EC + c_loops
        s_m = jnp.where(lane_valid & live, s_m, INF)
        # IK exit (lane K of In) via mask-reduce, encoded as j = K+1
        in_k = jnp.min(jnp.where(is_lane_k, In, INF), axis=1,
                       keepdims=True)
        s_i = in_k + tIMK + t_EC + c_loops
        s_i = jnp.where(live, s_i, INF)

        row_min_m = jnp.min(s_m, axis=1, keepdims=True)   # [R, 1]
        ismin = s_m == row_min_m
        row_j_m = jnp.min(jnp.where(ismin, jabs, jnp.int32(2 ** 30)),
                          axis=1, keepdims=True)
        row_min = jnp.minimum(row_min_m, s_i)
        row_j = jnp.where(row_min_m <= s_i, row_j_m, K + 1) \
            .astype(jnp.int32)
        upd = (row_min < best) | ((row_min == best) & (row_j < best_j))
        best = jnp.where(upd, row_min, best)
        best_i = jnp.where(upd, i, best_i)
        best_j = jnp.where(upd, row_j, best_j)

        ch = choiceM | (choiceI << 2) | (choiceD << 3)   # int32 0..15
        packbuf = (packbuf << 4) | ch

        @pl.when(i % PACK_ROWS == 0)
        def _():
            choices_ref[pl.ds(i // PACK_ROWS - 1, 1), :, :] = \
                packbuf[None]

        packbuf = jnp.where(i % PACK_ROWS == 0,
                            jnp.zeros((R, KP), jnp.int32), packbuf)
        return Mn, In, Dn, best, best_i, best_j, packbuf

    init = (jnp.full((R, KP), INF, jnp.float32),
            jnp.full((R, KP), INF, jnp.float32),
            jnp.full((R, KP), INF, jnp.float32),
            jnp.full((R, 1), INF, jnp.float32),
            jnp.zeros((R, 1), jnp.int32),
            jnp.full((R, 1), jnp.int32(2 ** 30), jnp.int32),
            jnp.zeros((R, KP), jnp.int32))
    _, _, _, best, best_i, best_j, _ = jax.lax.fori_loop(
        1, n_rows + 1, body, init)

    # ---- in-kernel traceback (reference buildViterbiTrace,
    # BandedHMMP7.cpp:943-1006).  The choice planes are still VMEM-
    # resident in choices_ref; walking them here avoids both the
    # device->host plane transfer and a long XLA scan of tiny kernels.
    # States emit 4-bit into emits_ref words (8 steps per int32), pad
    # nibble = 5; the walk early-exits once every read hit its B state.
    G = n_rows // PACK_ROWS
    TPS = max_steps // 8
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    gg_t = jax.lax.broadcasted_iota(jnp.int32, (R, TPS), 1)

    s_v = jnp.where(best_j <= K, 1, 2)           # M or I   [R,1]
    j_0 = jnp.minimum(best_j, K)                 # absolute
    j_0r = j_0 - jb                              # band-relative walk
    i_0 = best_i

    def tcond(state):
        t, n_live, s, i, j, done, buf = state
        return jnp.logical_and(t < max_steps, n_live > 0)

    def tbody(state):
        t, n_live, s, i, j, done_i, buf = state
        done = done_i > 0             # int32 carry: Mosaic while
        live = jnp.logical_not(done) & (i >= 1) & (j >= 0)
        emit = jnp.where(live, s, PAD_NIBBLE)    # [R,1]
        shift_t = 4 * (7 - (t & 7))              # scalar
        buf = jnp.where(gg_t == (t >> 3),
                        (buf & ~(15 << shift_t)) | (emit << shift_t),
                        buf)

        g = jnp.clip((i - 1) >> 3, 0, G - 1)     # [R,1]
        rows = []
        for r in range(R):
            g_r = jnp.sum(jnp.where(rr == r, g, 0))
            rows.append(choices_ref[pl.ds(g_r, 1), pl.ds(r, 1), :]
                        .reshape(1, KP))
        rows_m = jnp.concatenate(rows, axis=0)   # [R, KP]
        j_c = jnp.clip(j, 0, KP - 1)
        word = jnp.sum(jnp.where(jj == j_c, rows_m, 0), axis=1,
                       keepdims=True)            # [R,1]
        shift_i = 4 * (7 - ((i - 1) & 7))        # [R,1]
        ch = jax.lax.shift_right_logical(word, shift_i) & 15
        cm = ch & 3
        ci = (ch >> 2) & 1
        cd = (ch >> 3) & 1
        is_m = s == 1
        is_i = s == 2
        is_d = s == 3
        nxt_i = jnp.where(j + jb > 0, jnp.where(ci == 0, 1, 2),
                          jnp.where(ci == 0, 0, 2))
        nxt_d = jnp.where(cd == 0, 1, 3)
        s_n = jnp.where(is_m, cm,
                        jnp.where(is_i, nxt_i,
                                  jnp.where(is_d, nxt_d, s)))
        i_n = i - jnp.where(is_m | is_i, 1, 0)
        j_n = j - jnp.where(is_m | is_d, 1, 0)
        done_n = done | (live & (s == 0)) | jnp.logical_not(live)
        s2 = jnp.where(live, s_n, s)
        i2 = jnp.where(live, i_n, i)
        j2 = jnp.where(live, j_n, j)
        n_live_n = jnp.sum(jnp.where(done_n, 0, 1))
        return (t + 1, n_live_n, s2, i2, j2,
                done_n.astype(jnp.int32), buf)

    tinit = (jnp.int32(0), jnp.int32(R),
             s_v, i_0, j_0r, jnp.zeros((R, 1), jnp.int32),
             jnp.full((R, TPS), PAD_WORD, jnp.int32))
    _, _, _, i_f, j_f, _, buf = jax.lax.while_loop(
        tcond, tbody, tinit)
    emits_ref[:, :] = buf

    f32 = lambda x: x.astype(jnp.float32)
    out = jnp.concatenate(
        [best, f32(best_i), f32(best_j),
         f32(j_f + jb + 1), f32(j_0), f32(i_f + 1), f32(i_0),
         jnp.zeros((READS_PER_PROGRAM, 121), jnp.float32)], axis=1)
    best_ref[:, :] = out


@partial(jax.jit, static_argnames=("n_rows", "interpret"))
def viterbi_pallas(dh: DeviceHMM, codes, lengths, regions,
                   n_rows: int, interpret: bool = False):
    """Pallas-kernel Viterbi over a padded read batch.

    Returns (min_score [B], min_i [B], min_j [B],
             packed_choices [n_rows/8, B, KP] int32) — decode with
    unpack_nibble_choices.  n_rows must be a multiple of 8.
    The kernel also runs the traceback in-kernel; use
    viterbi_pallas_traced for the packed state strings.
    """
    score, min_i, min_j, packed, _, _ = _viterbi_pallas_full(
        dh, codes, lengths, regions, n_rows, interpret)
    return score, min_i, min_j, packed


@partial(jax.jit,
         static_argnames=("n_rows", "interpret", "KB", "n_regions",
                          "dchain"))
def viterbi_pallas_traced(dh: DeviceHMM, codes, lengths, regions,
                          n_rows: int, interpret: bool = False,
                          j_base=None, KB: int | None = None,
                          n_regions: int = MAX_REGIONS,
                          dchain: int = 1 << 30):
    """Pallas Viterbi + in-kernel traceback.

    Returns (score [B], comb [B, 8+TPS] int32): comb cols 0:8 are the
    f32 score+bounds bits (score at col 0, 1-based aln_start, aln_end,
    aln_from, aln_to at cols 3:7), cols 8: the nibble-packed reverse
    state strings (decode with unpack_emits) — ONE host download
    covers everything, and it is fused into this jit so it is ready
    the moment `score` is (a separate device op would queue behind the
    next batch's DP kernel and serialize the assignment stream).
    The choice planes stay in VMEM scratch and never touch HBM.

    j_base/KB: band-relative lane mode — lane 0 of read r is absolute
    profile position j_base[r] and only KB lanes are processed; every
    read's regions must fit in [j_base, j_base + KB).  Use
    viterbi_pallas_traced_split for automatic narrow/wide routing.
    """
    score, _, _, _, emits, sb = _viterbi_pallas_full(
        dh, codes, lengths, regions, n_rows, interpret, traced=True,
        j_base=j_base, KB=KB, n_regions=n_regions, dchain=dchain)
    comb = jnp.concatenate(
        [jax.lax.bitcast_convert_type(sb, jnp.int32), emits], axis=1)
    return score, comb


DEFAULT_BAND_LANES = 384


def _dchain_bound(reg: np.ndarray, used: np.ndarray, K: int) -> int:
    """Static power-of-two bound on the longest run of consecutive
    allowed D cells in any DP row, from the region scalars: per row
    the allowed set is a union of per-region j-intervals, so the
    longest run <= sum of per-region max widths (diagonal regions are
    capped by their band thickness hi_d - lo_d + 1).  Floored at 64 so
    batch-to-batch variation reuses one compiled shape."""
    if not used.any():
        return 64
    jl = np.maximum(reg[:, :, 0], 1)
    jh = np.minimum(reg[:, :, 1], K)
    # clamp: a region that clips to an empty interval (jh < jl after
    # the [1, K] clamp) must contribute 0, not a negative width that
    # would undercount the bound and truncate the D-chain scan
    w = np.where(used, np.maximum(jh - jl + 1, 0), 0)
    isd = (reg[:, :, 5] != 0) & used
    wd = np.maximum(reg[:, :, 7] - reg[:, :, 6] + 1, 0)
    w = np.where(isd, np.minimum(w, wd), w)
    m = int(w.sum(axis=1).max())
    # COARSE buckets: every distinct value is a separate 2-8 min jit
    # specialization through the axon remote compiler, and a finer
    # bucket saves at most one extra scan step
    for b in (64, 256, 1024):
        if m <= b:
            return b
    return 1 << 30


def _region_bucket(reg_used: np.ndarray) -> int:
    """Static region-slot count for a batch: the mask loop cost is
    per-slot per-row, and seeded reads use 3 of the MAX_REGIONS slots
    (2 per extra seed chain); bucket to {3, MAX_REGIONS} so batches
    reuse one compiled shape."""
    if not reg_used.size:
        return MAX_REGIONS
    hi = int(np.max(np.where(reg_used, np.arange(reg_used.shape[1])[None, :], -1))) + 1
    return 3 if hi <= 3 else MAX_REGIONS


def viterbi_pallas_traced_split(dh: DeviceHMM, codes, lengths, regions,
                                n_rows: int,
                                KB: int = DEFAULT_BAND_LANES,
                                wide_floor: int = 128,
                                interpret: bool = False):
    """Traced Pallas Viterbi with automatic narrow/wide band routing.

    Host-side (numpy) preprocessing splits the batch by band extent:
    reads whose region span fits in a KB-lane window run in the
    band-relative kernel (a few 128-lane tiles instead of the full
    padded profile — at fixture shape ~98% of seeded reads fit in 3
    tiles vs 11), the rest (unseeded full-DP reads, extreme bands) run
    in a small full-width launch whose rows are scattered back.  Both
    launches live in ONE jit, so the stream still pays a single
    dispatch and a single combined download.

    codes/lengths/regions must be numpy arrays (the band extents are
    computed before tracing).  Returns (score [B], comb) exactly like
    viterbi_pallas_traced.
    """
    K = dh.K
    KPF = _round_up(K + 2, 128)
    codes_j = jnp.asarray(codes)
    lengths_j = jnp.asarray(lengths)
    regions_j = jnp.asarray(regions)
    reg = np.asarray(regions)
    used = reg[:, :, 1] > 0
    if KB >= KPF:
        # band window would not be narrower than the full profile
        return viterbi_pallas_traced(dh, codes_j, lengths_j, regions_j,
                                     n_rows, interpret,
                                     n_regions=_region_bucket(used),
                                     dchain=_dchain_bound(reg, used, K))
    jlo = np.where(used, np.maximum(reg[:, :, 0], 1),
                   np.int64(1) << 40).min(axis=1)
    jhi = np.where(used, np.minimum(reg[:, :, 1], K), 0).max(axis=1)
    jb = np.maximum(jlo - 1, 0).astype(np.int64)
    none_used = ~used.any(axis=1)          # padded rows
    jb[none_used] = 0
    wide = (jhi - jb + 1 > KB) & ~none_used
    jb[wide] = 0                           # narrow rows are discarded
    jb = jnp.asarray(jb.astype(np.int32))
    n_wide = int(wide.sum())
    nr_all = _region_bucket(used)
    if n_wide == 0:
        return viterbi_pallas_traced(dh, codes_j, lengths_j, regions_j,
                                     n_rows, interpret, j_base=jb,
                                     KB=KB, n_regions=nr_all,
                                     dchain=_dchain_bound(reg, used, K))
    B = reg.shape[0]
    if 2 * n_wide >= B:
        # mostly wide: the split overhead isn't worth it
        return viterbi_pallas_traced(dh, codes_j, lengths_j, regions_j,
                                     n_rows, interpret,
                                     n_regions=nr_all,
                                     dchain=_dchain_bound(reg, used, K))
    # pad the wide row set to a power-of-two bucket (>= wide_floor) so
    # batch-to-batch variation reuses one compiled shape
    Bw = max(wide_floor, 1 << (n_wide - 1).bit_length())
    Bw = min(Bw, _round_up(B, READS_PER_PROGRAM))
    widx = np.zeros(Bw, np.int32)
    widx[:n_wide] = np.nonzero(wide)[0]
    wvalid = np.zeros(Bw, bool)
    wvalid[:n_wide] = True
    nr_w = _region_bucket(used[widx[:n_wide]])
    narrow = ~wide & ~none_used
    dc_n = _dchain_bound(reg[narrow], used[narrow], K)
    dc_w = _dchain_bound(reg[widx[:n_wide]], used[widx[:n_wide]], K)
    return _viterbi_split_jit(dh, codes_j, lengths_j, regions_j, jb,
                              jnp.asarray(widx), jnp.asarray(wvalid),
                              n_rows, KB, interpret, nr_all, nr_w,
                              dc_n, dc_w)


@partial(jax.jit, static_argnames=("n_rows", "KB", "interpret",
                                   "nr_n", "nr_w", "dc_n", "dc_w"))
def _viterbi_split_jit(dh: DeviceHMM, codes, lengths, regions, jb,
                       widx, wvalid, n_rows: int, KB: int,
                       interpret: bool = False,
                       nr_n: int = MAX_REGIONS,
                       nr_w: int = MAX_REGIONS,
                       dc_n: int = 1 << 30, dc_w: int = 1 << 30):
    """Narrow band launch over the whole batch + full-width launch
    over the gathered wide rows, scattered back — one jit, one
    downloadable (score, comb) pair."""
    score_n, comb_n = viterbi_pallas_traced(
        dh, codes, lengths, regions, n_rows, interpret, j_base=jb,
        KB=KB, n_regions=nr_n, dchain=dc_n)
    score_w, comb_w = viterbi_pallas_traced(
        dh, codes[widx], lengths[widx], regions[widx], n_rows,
        interpret, n_regions=nr_w, dchain=dc_w)
    Tn, Tw = comb_n.shape[1], comb_w.shape[1]
    if Tw > Tn:
        comb_n = jnp.concatenate(
            [comb_n, jnp.full((comb_n.shape[0], Tw - Tn), PAD_WORD,
                              jnp.int32)], axis=1)
    B = comb_n.shape[0]
    rows = jnp.where(wvalid, widx, B)      # invalid pads -> dump row
    comb = jnp.concatenate(
        [comb_n, jnp.zeros((1, comb_n.shape[1]), jnp.int32)])
    comb = comb.at[rows].set(comb_w)[:B]
    score = jnp.concatenate([score_n, jnp.zeros((1,), score_n.dtype)])
    score = score.at[rows].set(score_w)[:B]
    return score, comb


def _viterbi_pallas_full(dh: DeviceHMM, codes, lengths, regions,
                         n_rows: int, interpret: bool = False,
                         traced: bool = False,
                         j_base=None, KB: int | None = None,
                         n_regions: int = MAX_REGIONS,
                         dchain: int = 1 << 30):
    B0 = codes.shape[0]
    K = dh.K
    KPF = _round_up(K + 2, 128)      # full padded profile width
    banded = j_base is not None
    KP = KPF if KB is None else min(KB, KPF)   # DP lane count
    R = READS_PER_PROGRAM
    B = _round_up(B0, R)
    if not banded:
        j_base = jnp.zeros((B0,), jnp.int32)
    if B != B0:
        codes = jnp.concatenate(
            [codes, jnp.zeros((B - B0,) + codes.shape[1:],
                              codes.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.ones((B - B0,), lengths.dtype)])
        regions = jnp.concatenate(
            [regions, jnp.zeros((B - B0,) + regions.shape[1:],
                                regions.dtype)])
        j_base = jnp.concatenate(
            [j_base, jnp.zeros((B - B0,), j_base.dtype)])
    if n_rows % PACK_ROWS:
        raise ValueError(f"n_rows {n_rows} must be a multiple of "
                         f"{PACK_ROWS}")

    def padded(v, fill=np.inf):
        out = jnp.full((KPF,), fill, jnp.float32)
        return out.at[: v.shape[0]].set(v.astype(jnp.float32))

    def shift1(v):
        return jnp.concatenate(
            [jnp.full((1,), INF, jnp.float32), v[:-1]])

    zero_row = jnp.zeros((KPF,), jnp.float32)
    tc = jnp.stack([
        padded(shift1(dh.TMM)), padded(shift1(dh.TIM)),
        padded(shift1(dh.TDM)), padded(shift1(dh.TMD)),
        padded(shift1(dh.TDD)), padded(dh.TMI), padded(dh.TII),
        padded(dh.entry), padded(dh.exit), zero_row,
        zero_row, zero_row, zero_row, zero_row, zero_row, zero_row,
    ])                                              # [16, KPF]
    em = jnp.concatenate([
        jnp.stack([padded(dh.EM[b]) for b in range(4)]),
        jnp.stack([padded(dh.EI[b]) for b in range(4)]),
    ])                                              # [8, KPF]
    scal = jnp.stack([
        dh.t_NN.astype(jnp.float32), dh.t_NB.astype(jnp.float32),
        dh.t_CC.astype(jnp.float32), dh.t_EC.astype(jnp.float32),
        dh.TIM[K].astype(jnp.float32),
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32)])                # [8] f32

    meta = jnp.zeros((B, 128), jnp.int32)
    meta = meta.at[:, 0].set(lengths.astype(jnp.int32))
    meta = meta.at[:, 8:8 + MAX_REGIONS * REGION_WIDTH].set(
        regions.reshape(B, -1).astype(jnp.int32))
    # read bases as a VMEM tile, lane-padded to 128
    NRP = _round_up(n_rows, 128)
    codes_i = jnp.zeros((B, NRP), jnp.int32)
    codes_i = codes_i.at[:, :n_rows].set(
        jnp.clip(codes.astype(jnp.int32), 0, 3))

    # traceback emit buffer: path length <= n_rows + (j travel) + 2
    # states, 8 per int32 word, lane dim padded to 128 words; in band
    # mode j can only travel the KP-lane window
    max_steps = _round_up(n_rows + min(K, KP if banded else K) + 2, 8)
    if os.environ.get("HMMUFOTU_TRACE_STEPS"):
        # measurement-only: cap the in-kernel traceback trip count to
        # attribute kernel time between the DP row loop and the walk
        # (emits become garbage — never use outside profiling)
        max_steps = int(os.environ["HMMUFOTU_TRACE_STEPS"])
    TPS = _round_up(max_steps // 8, 128)
    max_steps = TPS * 8

    jb_arr = j_base.astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((R, NRP), lambda p, ss, jbs: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 128), lambda p, ss, jbs: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, KPF), lambda p, ss, jbs: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, KPF), lambda p, ss, jbs: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    best_spec = pl.BlockSpec((R, 128), lambda p, ss, jbs: (p, 0),
                             memory_space=pltpu.VMEM)
    emits_spec = pl.BlockSpec((R, TPS), lambda p, ss, jbs: (p, 0),
                              memory_space=pltpu.VMEM)
    G = n_rows // PACK_ROWS
    if traced:
        # choice planes = per-program VMEM scratch (never written to
        # HBM; only the packed state strings + bounds leave the chip)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // R,),
            in_specs=in_specs,
            out_specs=[best_spec, emits_spec],
            scratch_shapes=[pltpu.VMEM((G, R, KP), jnp.int32)],
        )
        best, emits = pl.pallas_call(
            partial(_viterbi_kernel, n_rows=n_rows, K=K, KP=KP,
                    max_steps=max_steps, traced=True,
                    banded=banded, n_regions=n_regions,
                    dchain=dchain),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, 128), jnp.float32),
                jax.ShapeDtypeStruct((B, TPS), jnp.int32),
            ],
            interpret=interpret,
        )(scal, jb_arr, codes_i, meta, tc, em)
        packed = None
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // R,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((G, R, KP),
                             lambda p, ss, jbs: (0, p, 0),
                             memory_space=pltpu.VMEM),
                best_spec, emits_spec,
            ],
        )
        packed, best, emits = pl.pallas_call(
            partial(_viterbi_kernel, n_rows=n_rows, K=K, KP=KP,
                    max_steps=max_steps, banded=banded,
                    n_regions=n_regions, dchain=dchain),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((G, B, KP), jnp.int32),
                jax.ShapeDtypeStruct((B, 128), jnp.float32),
                jax.ShapeDtypeStruct((B, TPS), jnp.int32),
            ],
            interpret=interpret,
        )(scal, jb_arr, codes_i, meta, tc, em)
        packed = packed[:, :B0]
    best = best[:B0]
    emits = emits[:B0]
    score = best[:, 0]
    min_i = best[:, 1].astype(jnp.int32)
    min_j = best[:, 2].astype(jnp.int32)
    sb = best[:, :8]         # score + traceback bounds in one plane
    return score, min_i, min_j, packed, emits, sb


def unpack_emits(emits: np.ndarray) -> np.ndarray:
    """Decode [B, TPS] int32 nibble-packed traceback words to
    [B, TPS*8] uint8 state codes (step t = word t>>3, nibble 7-(t&7);
    5 = pad)."""
    B, TPS = emits.shape
    out = np.empty((B, TPS, 8), dtype=np.uint8)
    for k in range(8):
        out[:, :, k] = ((emits >> (4 * (7 - k))) & 0xF).astype(np.uint8)
    return out.reshape(B, TPS * 8)


def unpack_nibble_choices(packed: np.ndarray, n_rows: int,
                          lanes: int) -> np.ndarray:
    """Decode [n_rows/8, B, KP] int32 nibble planes to
    [n_rows, B, lanes] uint8 choice planes (row g*8+r lives in nibble
    7-r of plane g)."""
    G, B, KP = packed.shape
    out = np.empty((G, PACK_ROWS, B, KP), dtype=np.uint8)
    for r in range(PACK_ROWS):
        shift = 4 * (PACK_ROWS - 1 - r)
        out[:, r] = ((packed >> shift) & 0xF).astype(np.uint8)
    return out.reshape(G * PACK_ROWS, B, KP)[:n_rows, :, :lanes]


@partial(jax.jit, static_argnames=("K", "max_steps"))
def traceback_device_packed(packed: jax.Array, min_i: jax.Array,
                            min_j: jax.Array, K: int, max_steps: int):
    """Batched traceback walking the nibble-packed choice planes on
    device — only the [B, max_steps] state strings ship to the host
    (same contract as viterbi.traceback_device).

    packed: [G, B, KP] int32 planes from viterbi_pallas.
    """
    G, B, KP = packed.shape
    flat = packed.reshape(-1)

    s0 = jnp.where(min_j <= K, 1, 2).astype(jnp.int8)   # M or I
    i0 = min_i
    j0 = jnp.minimum(min_j, K)

    def step(carry, t):
        s, i, j, done = carry
        live = ~done & (i >= 1) & (j >= 0)
        emit = jnp.where(live, s, 5).astype(jnp.int8)
        g = (i - 1) >> 3
        shift = 4 * (7 - ((i - 1) & 7))
        idx = g * (B * KP) + jnp.arange(B) * KP + j
        word = jnp.take(flat, jnp.clip(idx, 0, flat.size - 1))
        ch = (word >> shift) & 15
        ch = jnp.where(live, ch, 0)
        cm = (ch & 3).astype(jnp.int8)
        ci = ((ch >> 2) & 1).astype(jnp.int8)
        cd = ((ch >> 3) & 1).astype(jnp.int8)
        is_m = s == 1
        is_i = s == 2
        is_d = s == 3
        nxt_i = jnp.where(j > 0, jnp.where(ci == 0, 1, 2),
                          jnp.where(ci == 0, 0, 2)).astype(jnp.int8)
        nxt_d = jnp.where(cd == 0, 1, 3).astype(jnp.int8)
        s_n = jnp.where(is_m, cm,
                        jnp.where(is_i, nxt_i,
                                  jnp.where(is_d, nxt_d, s)))
        i_n = i - jnp.where(is_m | is_i, 1, 0)
        j_n = j - jnp.where(is_m | is_d, 1, 0)
        done_n = done | (live & (s == 0)) | ~live
        return (jnp.where(live, s_n, s), jnp.where(live, i_n, i),
                jnp.where(live, j_n, j), done_n), emit

    init = (s0, i0, j0, jnp.zeros((B,), bool))
    (s_f, i_f, j_f, _), emits = jax.lax.scan(
        step, init, jnp.arange(max_steps))
    return emits.T, j_f + 1, j0, i_f + 1, i0
