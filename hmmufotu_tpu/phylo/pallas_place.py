"""Single-kernel Pallas SEP placement optimization.

The accurate placement stage — the joint 3-branch Felsenstein
fixed-point of the reference (optimizeBranchLength(u,v,r,n),
src/PhyloTreeUnrooted.cpp:800-847, single-branch :749-798) — is a
convergence loop.  The XLA `lax.while_loop` formulation in
placement.py issues 10s of small kernels per outer iteration (rate
convolutions, exp/log chains, two inner fixed-point launches); on a
remote-tunneled TPU each launch costs ~ms, so the loop is dominated
by dispatch, not math.

This kernel runs the ENTIRE optimization for a block of candidate
lanes in ONE Pallas program:

  * P(t) via the spectral form P = U exp(diag(lam) t) U^-1 — all six
    reference models are time-reversible, so one code path covers
    JC69..GTR (see models.eig_tensors); the 4x4 algebra is unrolled
    into [R, 1] scalar-vector ops;
  * message convolutions (dot_product_scaled,
    PhyloTreeUnrooted.h:1496-1504) as 16 [R, W] FMA planes per
    message, with the same max-shift underflow scaling;
  * discrete-Gamma rate mixing (row_mean_exp_scaled, cpp:326-345)
    statically unrolled over the K rates;
  * both inner single-branch fixed points and the outer 3-branch
    loop as nested lax.while_loops with per-lane convergence masks —
    identical update/convergence semantics to the XLA path
    (placement._fixed_point_branch / the outer_body there);
  * the final root-message log-likelihood reduction in-kernel.

Output per lane: (wur, wvr, wnr, loglik).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tree import BRANCH_EPS, MAX_ITER

INF = jnp.inf
# candidate lanes per optimize-kernel program.  The kernel is grid/DMA
# latency bound (~98% of lanes are dead after the estimate filter, so
# per-program compute is small); wider blocks amortize the per-program
# overhead at the cost of coupling more lanes per convergence loop.
import os as _os
LANES_PER_PROGRAM = int(_os.environ.get("HMMUFOTU_SEP_LANES", "8"))
if LANES_PER_PROGRAM <= 0 or LANES_PER_PROGRAM % 8:
    raise ValueError("HMMUFOTU_SEP_LANES must be a positive multiple "
                     f"of 8 (got {LANES_PER_PROGRAM})")
N_MODEL_SCALARS = 64
# model_s layout: [0:16] U row-major, [16:32] U^-1 row-major,
# [32:36] lam, [36:40] log_pi, [40:48] dGamma rates


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _model_ops(model_s):
    """Shared spectral-model helpers closed over the staged scalars
    (layout in N_MODEL_SCALARS above); used by both the optimize and
    the estimate kernels."""

    def finite_guard(m):
        return jnp.where((m > -INF) & (m < INF), m, 0.0)

    def max4(msg):
        return jnp.maximum(jnp.maximum(msg[0], msg[1]),
                           jnp.maximum(msg[2], msg[3]))

    def conv_one(msg, t):
        """log(P(t) @ exp(msg)) columnwise; msg = 4 [R, W] planes,
        t [R, 1].  Mirrors placement._dot_scaled."""
        e = [jnp.exp(model_s[32 + j] * t) for j in range(4)]
        scale = finite_guard(max4(msg))
        em = [jnp.exp(msg[l] - scale) for l in range(4)]
        out = []
        for k in range(4):
            acc = None
            for l in range(4):
                p_kl = None
                for j in range(4):
                    term = (model_s[k * 4 + j]
                            * model_s[16 + j * 4 + l]) * e[j]
                    p_kl = term if p_kl is None else p_kl + term
                p_kl = jnp.maximum(p_kl, 0.0)
                v = p_kl * em[l]
                acc = v if acc is None else acc + v
            out.append(jnp.log(acc) + scale)
        return out

    def dot_vec(msg):
        """log(pi . exp(msg)) per column (placement._dot_scaled_vec:
        scale from the raw message max, exactly as the XLA path)."""
        scale = finite_guard(max4(msg))
        s = None
        for k in range(4):
            v = jnp.exp(model_s[36 + k] + msg[k] - scale)
            s = v if s is None else s + v
        return jnp.log(s) + scale

    return finite_guard, max4, conv_one, dot_vec


def _sep_kernel(model_s, scal_ref, U_ref, V_ref, N_ref, mask_ref,
                out_ref, *, n_rates: int):
    R = LANES_PER_PROGRAM
    mask = mask_ref[:, :] > 0.5
    w0 = scal_ref[:, 0:1]
    wur0 = scal_ref[:, 1:2]
    wnr0 = scal_ref[:, 2:3]
    skip0 = scal_ref[:, 3:4] > 0.5

    Um = [U_ref[k] for k in range(4)]
    Vm = [V_ref[k] for k in range(4)]
    Nm = [N_ref[k] for k in range(4)]

    finite_guard, max4, conv_one, _dot_vec_shared = _model_ops(model_s)

    def conv_mix(pairs):
        """Rate-mixed summed convolution (placement._conv_mix)."""
        outs = []
        for r in range(n_rates):
            rate = model_s[40 + r]
            s = None
            for msg, t in pairs:
                c = conv_one(msg, t * rate)
                s = c if s is None else [s[k] + c[k] for k in range(4)]
            outs.append(s)
        if n_rates == 1:
            return outs[0]
        res = []
        for k in range(4):
            planes = [outs[r][k] for r in range(n_rates)]
            m = planes[0]
            for p_ in planes[1:]:
                m = jnp.maximum(m, p_)
            scale = finite_guard(m)
            s = None
            for p_ in planes:
                v = jnp.exp(p_ - scale)
                s = v if s is None else s + v
            res.append(jnp.log(s / float(n_rates)) + scale)
        return res

    dot_vec = _dot_vec_shared

    def fp(Rm, Xm, w_cur, max_len, skip):
        """Single-branch Felsenstein fixed point on this lane block
        (placement._fixed_point_branch semantics, reference
        PhyloTreeUnrooted.cpp:749-798).  Returns (w, trip_count)."""
        logA = dot_vec([Rm[k] + Xm[k] for k in range(4)])
        logB = dot_vec(Rm) + dot_vec(Xm)
        ok = mask & jnp.logical_not((logA != logA) | (logB != logB))
        scale = jnp.maximum(logA, logB)
        eA = jnp.where(ok, jnp.exp(logA - scale), 0.0)
        eB = jnp.where(ok, jnp.exp(logB - scale), 0.0)
        n = jnp.maximum(
            jnp.sum(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True),
            1.0)
        p0 = 1.0 - jnp.exp(-w_cur)

        def cond(state):
            p, it, n_live, done_i = state
            return jnp.logical_and(it < MAX_ITER, n_live > 0)

        def body(state):
            p, it, n_live, done_i = state
            done = done_i > 0
            num = eB * p
            den = eA * (1.0 - p) + num
            frac = jnp.where(den > 0, num / den, 0.0)
            pn = jnp.sum(frac, axis=1, keepdims=True) / n
            bad = jnp.logical_not((pn >= 0) & (pn <= 1))
            diff = jnp.abs(jnp.log1p(-pn) - jnp.log1p(-p))
            conv = (diff < BRANCH_EPS) \
                | jnp.logical_not((diff > -INF) & (diff < INF)) \
                | (pn >= 1.0 - 1e-7)
            new_done = done | conv | bad
            p_next = jnp.where(done | bad, p, pn)
            return (p_next, it + 1,
                    jnp.sum(jnp.where(new_done, 0, 1)),
                    new_done.astype(jnp.int32))

        p_fin, trips, _, _ = jax.lax.while_loop(
            cond, body,
            (p0, jnp.int32(0), jnp.sum(jnp.where(skip, 0, 1)),
             skip.astype(jnp.int32)))
        return jnp.minimum(-jnp.log1p(-p_fin), max_len), trips

    ones = jnp.ones_like(wnr0)

    # ~98% of candidate lanes are dead after the estimate filter
    # (skip0 set), and lanes cluster so most PROGRAMS are all-dead;
    # gate the whole optimization + final-loglik epilogue on having
    # any live lane — dead programs only zero their output block
    # (measured: the unconditional epilogue alone was ~60% of this
    # kernel's 29 ms/1024-batch on v5e)
    out_ref[:, :] = jnp.zeros((R, 128), jnp.float32)

    @pl.when(jnp.sum(jnp.where(skip0, 0, 1)) > 0)
    def _run():
        def ocond(state):
            wur, wvr, wnr, it, n_live, done_i, inner = state
            return jnp.logical_and(it < MAX_ITER, n_live > 0)

        def obody(state):
            wur, wvr, wnr, it, n_live, done_i, inner = state
            done = done_i > 0
            Rn = conv_mix([(Um, wur), (Vm, wvr)])
            wnr_n, t1 = fp(Rn, Nm, wnr, ones, done)
            Ru = conv_mix([(Vm, wvr), (Nm, wnr_n)])
            wur_n, t2 = fp(Ru, Um, wur, w0, done)
            wvr_n = w0 - wur_n
            convd = (jnp.abs(wur_n - wur) < BRANCH_EPS) \
                & (jnp.abs(wnr_n - wnr) < BRANCH_EPS)
            bad = jnp.logical_not((wur_n >= 0) & (wur_n <= w0))
            new_done = done | convd | bad
            return (jnp.where(done, wur, wur_n),
                    jnp.where(done, wvr, wvr_n),
                    jnp.where(done, wnr, wnr_n),
                    it + 1, jnp.sum(jnp.where(new_done, 0, 1)),
                    new_done.astype(jnp.int32), inner + t1 + t2)

        wur_f, wvr_f, wnr_f, o_trips, _, _, i_trips = \
            jax.lax.while_loop(
                ocond, obody,
                (wur0, w0 - wur0, wnr0, jnp.int32(0),
                 jnp.sum(jnp.where(skip0, 0, 1)),
                 skip0.astype(jnp.int32), jnp.int32(0)))

        root = conv_mix([(Um, wur_f), (Vm, wvr_f), (Nm, wnr_f)])
        cols = dot_vec(root)
        ll = jnp.sum(jnp.where(mask, cols, 0.0), axis=1, keepdims=True)

        trips = jnp.full((R, 1), o_trips, jnp.float32)
        itr = jnp.full((R, 1), i_trips, jnp.float32)
        out_ref[:, :] = jnp.concatenate(
            [wur_f, wvr_f, wnr_f, ll, trips, itr,
             jnp.zeros((R, 122), jnp.float32)], axis=1)


def pad_msgs(U, V, Nl, site_ok):
    """Pad/transpose [B, C, 4, W] message windows + [B, C, W] mask
    into the kernels' [4, Mp, Wp] / [Mp, Wp] layouts.  Shared between
    est_pallas and sep_optimize_pallas via the `padded=` argument so
    the (HBM-doubling) copies happen once per batch (ADVICE r3 #5)."""
    B, C, _, W = U.shape
    M = B * C
    R = LANES_PER_PROGRAM
    Mp = _round_up(max(M, R), R)
    Wp = _round_up(W, 128)
    f32 = jnp.float32

    def pad_msg(X):
        Xt = jnp.transpose(X.reshape(M, 4, W), (1, 0, 2))
        out = jnp.zeros((4, Mp, Wp), f32)
        return out.at[:, :M, :W].set(Xt.astype(f32))

    maskp = jnp.zeros((Mp, Wp), f32).at[:M, :W].set(
        site_ok.reshape(M, W).astype(f32))
    return pad_msg(U), pad_msg(V), pad_msg(Nl), maskp


def take_padded(padded, order, C: int):
    """Compact padded [4, Mp, Wp] lanes (and the [Mp, Wp] mask) to a
    new candidate order: order [B, k] of per-read candidate ranks ->
    flat lane gather, re-padded to the program multiple.  Replaces a
    fresh transpose+pad of the gathered [B, k, 4, W] grids."""
    Up, Vp, Np, maskp = padded
    B, k = order.shape
    R = LANES_PER_PROGRAM
    M = B * k
    Mp = _round_up(max(M, R), R)
    flat = (jnp.arange(B, dtype=order.dtype)[:, None] * C
            + order).reshape(-1)                  # [B*k]
    flat = jnp.concatenate(
        [flat, jnp.zeros(Mp - M, flat.dtype)]) if Mp != M else flat

    def gather(X):
        out = jnp.take(X, flat, axis=X.ndim - 2)
        if Mp != M:
            # zero the padding lanes (gathered lane 0 copies)
            sl = (slice(None),) * (X.ndim - 2)
            mask = (jnp.arange(Mp) < M)
            shape = (1,) * (X.ndim - 2) + (Mp, 1)
            out = out * mask.reshape(shape)
        return out

    return gather(Up), gather(Vp), gather(Np), gather(maskp)


def sep_optimize_pallas(U, V, Nl, site_ok, w0, wur0, wnr0, live,
                        Um, U_1, lam, log_pi, rates, n_rates: int,
                        interpret: bool = False,
                        return_trips: bool = False,
                        padded=None, shape=None):
    """Fused joint 3-branch optimization over a [B, C] candidate grid.

    U/V/Nl [B, C, 4, W] f32 message windows; site_ok [B, C, W] bool;
    w0/wur0/wnr0/live [B, C].  Returns (wur, wvr, wnr, loglik) each
    [B, C]; loglik is raw (caller applies the live mask).
    return_trips: also return (outer, inner) while-loop trip counts
    per PROGRAM (each covers LANES_PER_PROGRAM lanes) for profiling.
    padded=(Up, Vp, Np, maskp) with shape=(B, C, W): kernel-layout
    inputs already built (pad_msgs/take_padded) — U/V/Nl/site_ok are
    ignored then.
    """
    if padded is not None:
        B, C, W = shape
        Up, Vp, Np, maskp = padded
        M = B * C
        R = LANES_PER_PROGRAM
        Mp = Up.shape[1]
        Wp = Up.shape[2]
        f32 = jnp.float32
    else:
        B, C, _, W = U.shape
        M = B * C
        R = LANES_PER_PROGRAM
        Mp = _round_up(max(M, R), R)
        Wp = _round_up(W, 128)
        f32 = jnp.float32
        Up, Vp, Np, maskp = pad_msgs(U, V, Nl, site_ok)
    scal = jnp.zeros((Mp, 128), f32)
    scal = scal.at[:M, 0].set(w0.reshape(-1).astype(f32))
    scal = scal.at[:M, 1].set(wur0.reshape(-1).astype(f32))
    scal = scal.at[:M, 2].set(wnr0.reshape(-1).astype(f32))
    skip = jnp.logical_not(live.reshape(-1))
    scal = scal.at[:M, 3].set(skip.astype(f32))
    scal = scal.at[M:, 3].set(1.0)

    model_s = jnp.zeros((N_MODEL_SCALARS,), f32)
    model_s = model_s.at[0:16].set(jnp.asarray(Um, f32).reshape(-1))
    model_s = model_s.at[16:32].set(jnp.asarray(U_1, f32).reshape(-1))
    model_s = model_s.at[32:36].set(jnp.asarray(lam, f32))
    model_s = model_s.at[36:40].set(jnp.asarray(log_pi, f32))
    model_s = model_s.at[40:40 + n_rates].set(
        jnp.asarray(rates, f32)[:n_rates])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // R,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda p, ms: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wp), lambda p, ms: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda p, ms: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_sep_kernel, n_rates=n_rates),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, 128), f32),
        interpret=interpret,
    )(model_s, scal, Up, Vp, Np, maskp)

    def col(i):
        return out[:M, i].reshape(B, C)

    if return_trips:
        return (col(0), col(1), col(2), col(3), col(4), col(5))
    return col(0), col(1), col(2), col(3)


def _est_kernel(model_s, scal_ref, U_ref, V_ref, N_ref, mask_ref,
                out_ref):
    """Closed-form placement estimate for a block of candidate lanes
    (reference estimateSeq, PhyloTreeUnrooted.cpp:861-871 + the
    unweighted initial pendant estimate cpp:1018-1031) — the same math
    as the XLA block in placement.place_batch_device, fused so the
    [B, C, 4, W]-shaped exp/log chains never materialize in HBM.

    scal_ref cols: 0 = wur0, 1 = wvr0.
    out cols: 0 = est_loglik, 1 = wnr0.
    """
    R = LANES_PER_PROGRAM
    mask = mask_ref[:, :] > 0.5
    wur0 = scal_ref[:, 0:1]
    wvr0 = scal_ref[:, 1:2]
    _, _, conv_one, dot_vec = _model_ops(model_s)

    Um = [U_ref[k] for k in range(4)]
    Vm = [V_ref[k] for k in range(4)]
    Nm = [N_ref[k] for k in range(4)]

    UPr = conv_one(Um, wur0)
    VPr = conv_one(Vm, wvr0)
    R0 = [UPr[k] + VPr[k] for k in range(4)]

    def argmax4(planes):
        # first-index max, matching jnp.argmax tie-breaking
        best = planes[0]
        idx = jnp.zeros_like(best, dtype=jnp.int32)
        for k in range(1, 4):
            upd = planes[k] > best
            idx = jnp.where(upd, k, idx)
            best = jnp.maximum(best, planes[k])
        return idx

    b1 = argmax4(R0)
    b2 = argmax4(Nm)
    nsites = jnp.maximum(
        jnp.sum(jnp.where(mask, 1.0, 0.0), axis=1, keepdims=True), 1.0)
    wnr0 = jnp.sum(jnp.where(mask & (b1 != b2), 1.0, 0.0),
                   axis=1, keepdims=True) / nsites

    NPr = conv_one(Nm, wnr0)
    cols = dot_vec([R0[k] + NPr[k] for k in range(4)])
    est = jnp.sum(jnp.where(mask, cols, 0.0), axis=1, keepdims=True)
    out_ref[:, :] = jnp.concatenate(
        [est, wnr0, jnp.zeros((R, 126), jnp.float32)], axis=1)


def est_pallas(U, V, Nl, site_ok, wur0, wvr0, Um, U_1, lam, log_pi,
               interpret: bool = False, padded=None, shape=None):
    """Fused estimate over a [B, C] candidate grid.

    U/V/Nl [B, C, 4, W] f32 message windows; site_ok [B, C, W];
    wur0/wvr0 [B, C].  Returns (est_loglik [B, C], wnr0 [B, C]) —
    the same values as the XLA estimate block up to f32 reduce order.
    padded/shape: pre-built kernel-layout inputs (see
    sep_optimize_pallas).
    """
    if padded is not None:
        B, C, W = shape
        Up, Vp, Np, maskp = padded
        M = B * C
        R = LANES_PER_PROGRAM
        Mp, Wp = Up.shape[1], Up.shape[2]
        f32 = jnp.float32
    else:
        B, C, _, W = U.shape
        M = B * C
        R = LANES_PER_PROGRAM
        Mp = _round_up(max(M, R), R)
        Wp = _round_up(W, 128)
        f32 = jnp.float32
        Up, Vp, Np, maskp = pad_msgs(U, V, Nl, site_ok)
    scal = jnp.zeros((Mp, 128), f32)
    scal = scal.at[:M, 0].set(wur0.reshape(-1).astype(f32))
    scal = scal.at[:M, 1].set(wvr0.reshape(-1).astype(f32))

    model_s = jnp.zeros((N_MODEL_SCALARS,), f32)
    model_s = model_s.at[0:16].set(jnp.asarray(Um, f32).reshape(-1))
    model_s = model_s.at[16:32].set(jnp.asarray(U_1, f32).reshape(-1))
    model_s = model_s.at[32:36].set(jnp.asarray(lam, f32))
    model_s = model_s.at[36:40].set(jnp.asarray(log_pi, f32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // R,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda p, ms: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, Wp), lambda p, ms: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wp), lambda p, ms: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda p, ms: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _est_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, 128), f32),
        interpret=interpret,
    )(model_s, scal, Up, Vp, Np, maskp)
    return out[:M, 0].reshape(B, C), out[:M, 1].reshape(B, C)
