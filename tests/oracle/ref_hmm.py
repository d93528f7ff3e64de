"""Oracle profile-HMM alignment: literal sequential f64 transcriptions
of the reference's banded/full Viterbi DP, traceback and global
alignment building (/root/reference/src/BandedHMMP7.cpp:640-1186) plus
the alignSeq driver (/root/reference/src/HmmUFOtu_main.cpp:39-105).

Only trained parameter tables are taken from the production ProfileHMM
(as plain numbers); all control flow below is transcribed from the C++.
DP matrices are Python lists of f64 — every arithmetic op is IEEE
double, exactly like the reference's Eigen MatrixXd cells.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

INF = math.inf
K_MIN_GAP_FRAC = 0.2        # BandedHMMP7.cpp:53
M, I, D = 0, 1, 2           # p7 matching-state indices
GAP_SYM = "-"
PAD_SYM = "."

_ENC = {"A": 0, "C": 1, "G": 2, "T": 3,
        "a": 0, "c": 1, "g": 2, "t": 3}


def _ctrunc(x: float) -> int:
    """C++ double->int conversion (truncate toward zero)."""
    return int(x)


def which_min4(pb: float, pm: float, pi_: float, pd: float,
               states: str = "BMID") -> str:
    """BandedHMMP7::whichMin 4-arg (BandedHMMP7.h:722-746): strict <,
    first state wins ties (inf everywhere -> states[0])."""
    idx = 0
    mn = INF
    if pb < mn:
        idx, mn = 0, pb
    if pm < mn:
        idx, mn = 1, pm
    if pi_ < mn:
        idx, mn = 2, pi_
    if pd < mn:
        idx, mn = 3, pd
    return states[idx]


def which_min2(pm: float, pid: float, states: str) -> str:
    """BandedHMMP7::whichMin 2-arg (BandedHMMP7.h:774-790)."""
    idx = 0
    mn = INF
    if pm < mn:
        idx, mn = 0, pm
    if pid < mn:
        idx, mn = 1, pid
    return states[idx]


@dataclass
class OracleVPath:
    """ViterbiAlignPath (BandedHMMP7.h:231-252)."""
    start: int
    end: int
    from_: int
    to: int
    n_ins: int
    n_del: int

    def is_valid(self) -> bool:
        return (self.start > 0 and self.start <= self.end
                and self.from_ > 0 and self.from_ <= self.to
                and self.n_ins >= 0 and self.n_del >= 0)


@dataclass
class OracleVScores:
    """ViterbiScores (BandedHMMP7.h:198-228): (L+1)x(K+1) f64 DP
    matrices, all-inf on reset."""
    K: int
    L: int
    DP_M: list = field(default_factory=list)
    DP_I: list = field(default_factory=list)
    DP_D: list = field(default_factory=list)
    S: np.ndarray | None = None

    def __post_init__(self):
        self.reset()

    def reset(self):
        w = self.K + 1
        self.DP_M = [[INF] * w for _ in range(self.L + 1)]
        self.DP_I = [[INF] * w for _ in range(self.L + 1)]
        self.DP_D = [[INF] * w for _ in range(self.L + 1)]
        self.S = None


@dataclass
class OracleVTrace:
    """ViterbiAlignTrace (BandedHMMP7.h:254-272)."""
    min_score: float = INF
    aln_start: int = 0
    aln_end: int = 0
    aln_from: int = 0
    aln_to: int = 0
    aln_trace: str = ""


@dataclass
class OracleAlignment:
    """HmmAlignment essentials (BandedHMMP7.h:74-130)."""
    K: int = 0
    L: int = 0
    seq_start: int = 0
    seq_end: int = 0
    hmm_start: int = 0
    hmm_end: int = 0
    cs_start: int = 0
    cs_end: int = 0
    cost: float = INF
    align: str = ""

    def is_valid(self) -> bool:
        return (0 < self.seq_start <= self.seq_end
                and 0 < self.hmm_start <= self.hmm_end <= self.K
                and 0 < self.cs_start <= self.cs_end <= self.L
                and 0 <= self.cost < INF and self.L == len(self.align))

    def merge(self, other: "OracleAlignment") -> "OracleAlignment":
        """Paired-end merge (BandedHMMP7.cpp:1188-1213): the other's
        char only fills '.' pad positions of this alignment."""
        assert self.K == other.K and self.L == other.L
        self.seq_start = min(self.seq_start, other.seq_start)
        self.seq_end = max(self.seq_end, other.seq_end)
        self.hmm_start = min(self.hmm_start, other.hmm_start)
        self.hmm_end = max(self.hmm_end, other.hmm_end)
        self.cs_start = min(self.cs_start, other.cs_start)
        self.cs_end = max(self.cs_end, other.cs_end)
        self.cost += other.cost
        merged = [b if (a == PAD_SYM and b != PAD_SYM) else a
                  for a, b in zip(self.align, other.align)]
        self.align = "".join(merged)
        return self


class RefHmm:
    """Parameter snapshot + literal algorithm transcription."""

    def __init__(self, K: int, L: int, Tmat_cost, E_M_cost, E_I_cost,
                 entry: np.ndarray, exit_: np.ndarray,
                 t_NN_cost: float, t_NB_cost: float, t_CC_cost: float,
                 t_EC_cost: float, cs2profile, profile2cs):
        self.K = K
        self.L = L
        # [K+1][3][3] nested float lists
        self.Tmat_cost = [[[float(Tmat_cost[k][a][b]) for b in range(3)]
                           for a in range(3)] for k in range(K + 1)]
        self.E_M_cost = [[float(E_M_cost[b][k]) for k in range(K + 1)]
                         for b in range(4)]
        self.E_I_cost = [[float(E_I_cost[b][k]) for k in range(K + 1)]
                         for b in range(4)]
        self.entry = [float(x) for x in entry]     # probabilities
        self.exit = [float(x) for x in exit_]
        self.t_NN_cost = float(t_NN_cost)
        self.t_NB_cost = float(t_NB_cost)
        self.t_CC_cost = float(t_CC_cost)
        self.t_EC_cost = float(t_EC_cost)
        self.cs2profile = [int(x) for x in cs2profile]
        self.profile2cs = [int(x) for x in profile2cs]
        self.entry_cost = [INF] * (K + 1)
        self.exit_cost = [INF] * (K + 1)
        self.wing_retracted = False

    @classmethod
    def from_production(cls, hmm) -> "RefHmm":
        """Snapshot a production ProfileHMM with its sequence mode set.

        Entry/exit probabilities are NOT taken from the production hmm
        (which wing-retracts eagerly on load); they are rebuilt here
        from the Tmat probabilities following adjustProfileLocalMode
        (BandedHMMP7.cpp:627-640) — the state the reference reaches
        after reading an .hmm file — then wing-retracted by the
        oracle's own literal transcription."""
        K = int(hmm.K)
        entry = [0.0] + [float(hmm.Tmat[0][M][M])] * K
        exit_ = [0.0] + [float(hmm.Tmat[K][M][M])] * K
        ref = cls(K, int(hmm.L), hmm.Tmat_cost, hmm.E_M_cost,
                  hmm.E_I_cost, entry, exit_,
                  hmm.t_NN_cost, hmm.t_NB_cost, hmm.t_CC_cost,
                  hmm.t_EC_cost, hmm.cs2profile, hmm.profile2cs)
        ref.wing_retract()
        return ref

    # ------------------------------------------------------------------
    def wing_retract(self):
        """Literal wingRetract (BandedHMMP7.cpp:1083-1120): fold the
        B->D1..Dj-1->Mj and Mi->Di+1..DK->E chains into entry/exit."""
        K = self.K
        Tc = self.Tmat_cost
        # entry: incremental prefix keeps the reference's exact
        # left-to-right accumulation order (cost rebuilt from MD0 each j)
        acc = Tc[0][M][D]           # B->D1
        for j in range(2, K + 1):
            if j > 2:
                acc = acc + Tc[j - 2][D][D]   # D_{j-2} -> D_{j-1}
            cost = acc + Tc[j - 1][D][M]      # D_{j-1} -> Mj
            self.entry[j] += math.exp(-cost)
            if self.entry[j] > 1:
                self.entry[j] = 1.0
        # exit: literal O(K^2) loop (each row's sum starts from MD_i)
        for i in range(1, K):
            cost = Tc[i][M][D]
            for j in range(i + 1, K):
                cost += Tc[j][D][D]
            cost += Tc[K][D][M]
            self.exit[i] += math.exp(-cost)
            if self.exit[i] > 1:
                self.exit[i] = 1.0
        self.entry_cost = [-math.log(p) if p > 0 else INF
                           for p in self.entry]
        self.exit_cost = [-math.log(p) if p > 0 else INF
                          for p in self.exit]
        self.wing_retracted = True

    # ------------------------------------------------------------------
    @staticmethod
    def encode(read: str) -> list[int]:
        return [_ENC[c] for c in read]

    def prepare_viterbi_scores(self, vs: OracleVScores):
        """prepareViterbiScores (BandedHMMP7.cpp:735-748)."""
        vs.DP_M[0][0] = vs.DP_I[0][0] = vs.DP_D[0][0] = INF
        for i in range(1, vs.L + 1):
            base = 0.0 if i == 1 else self.t_NN_cost * (i - 1)
            vs.DP_M[i][0] = base + self.t_NB_cost
        for i in range(vs.L + 1):
            vs.DP_I[i][0] = vs.DP_M[i][0]

    def _finish_scores(self, vs: OracleVScores):
        """Build the S matrix (shared tail of both calcViterbiScores
        variants, BandedHMMP7.cpp:772-780 / 880-892)."""
        K, L = self.K, vs.L
        S = np.full((L + 1, K + 2), INF)
        S[:, : K + 1] = np.array(vs.DP_M, dtype=np.float64)
        S[:, K + 1] = np.array([row[K] for row in vs.DP_I])
        S[:, : K + 1] += np.array(self.exit_cost)[None, :]
        S[:, K + 1] += self.Tmat_cost[K][I][M]
        S += self.t_EC_cost
        for i in range(1, L):
            S[i, :] += self.t_CC_cost * (L - i)
        vs.S = S

    def _cell(self, vs, enc, i: int, j: int, allow_b: bool):
        """One DP cell update (the recurrence repeated at
        BandedHMMP7.cpp:755-770, 812-827, 833-852, 866-878)."""
        K = self.K
        Mm, Im, Dm = vs.DP_M, vs.DP_I, vs.DP_D
        Tc1 = self.Tmat_cost[j - 1]
        b = enc[i - 1]
        cand = min(Mm[i - 1][j - 1] + Tc1[M][M],
                   Im[i - 1][j - 1] + Tc1[I][M],
                   Dm[i - 1][j - 1] + Tc1[D][M])
        if allow_b:
            eb = Mm[i][0] + self.entry_cost[j]
            if eb < cand:
                cand = eb
        Mm[i][j] = self.E_M_cost[b][j] + cand
        Tcj = self.Tmat_cost[j]
        Im[i][j] = self.E_I_cost[b][j] + min(Mm[i - 1][j] + Tcj[M][I],
                                             Im[i - 1][j] + Tcj[I][I])
        if 1 < j < K:   # D1 and DK are retracted
            Dm[i][j] = min(Mm[i][j - 1] + Tc1[M][D],
                           Dm[i][j - 1] + Tc1[D][D])

    def calc_viterbi_scores_full(self, enc: list[int], vs: OracleVScores):
        """Full DP (calcViterbiScores(seq, vs),
        BandedHMMP7.cpp:752-780): column-first order j outer, i inner."""
        self.prepare_viterbi_scores(vs)
        for j in range(1, self.K + 1):
            for i in range(1, vs.L + 1):
                self._cell(vs, enc, i, j, allow_b=True)
        self._finish_scores(vs)

    def calc_viterbi_scores_banded(self, enc: list[int],
                                   vs: OracleVScores,
                                   vpaths: list[OracleVPath]):
        """Banded DP (calcViterbiScores(seq, vs, vpaths),
        BandedHMMP7.cpp:782-892), with the reference's region geometry,
        C-double truncation and overlap recompute semantics."""
        L = vs.L
        if not vpaths:
            return
        self.prepare_viterbi_scores(vs)
        for p, vp in enumerate(vpaths):
            # upstream region (BandedHMMP7.cpp:795-827)
            up_q = vp.from_ - 1 if p == 0 else vp.from_ - vpaths[p - 1].to
            if up_q < 0:
                up_q = 0
            up_start = _ctrunc(vp.start - up_q * (1 + K_MIN_GAP_FRAC)) \
                if p == 0 else vpaths[p - 1].end
            if up_start < 1:
                up_start = 1
            up_from = _ctrunc(vp.from_ - up_q * (1 + K_MIN_GAP_FRAC)) \
                if p == 0 else vpaths[p - 1].to
            if up_from < 1:
                up_from = 1
            for j in range(up_start, vp.start + 1):
                for i in range(up_from, vp.from_ + 1):
                    self._cell(vs, enc, i, j, allow_b=True)
            # the known-path band (BandedHMMP7.cpp:829-852)
            for j in range(vp.start, vp.end + 1):
                for i in range(vp.from_, vp.to + 1):
                    dist = (i - vp.from_) - (j - vp.start)
                    if not (dist <= vp.n_ins and dist >= -vp.n_del):
                        continue
                    self._cell(vs, enc, i, j, allow_b=True)
        # downstream region (BandedHMMP7.cpp:854-879) — no B entry
        last = vpaths[-1]
        down_q = L - last.to
        down_end = _ctrunc(last.end + down_q * (1 + K_MIN_GAP_FRAC))
        down_to = _ctrunc(last.to + down_q * (1 + K_MIN_GAP_FRAC))
        if down_end > self.K:
            down_end = self.K
        if down_to > L:
            down_to = L
        for j in range(last.end, down_end + 1):
            for i in range(last.to, down_to + 1):
                self._cell(vs, enc, i, j, allow_b=False)
        self._finish_scores(vs)

    # ------------------------------------------------------------------
    def build_viterbi_trace(self, vs: OracleVScores) -> OracleVTrace:
        """Literal buildViterbiTrace (BandedHMMP7.cpp:943-1006)."""
        K = self.K
        vt = OracleVTrace()
        S = vs.S
        # Eigen minCoeff visits column-major with strict <; np.argmin on
        # the transpose reproduces that first-minimum tie order
        flat = int(np.argmin(S.T))
        min_col, min_row = divmod(flat, S.shape[0])
        vt.min_score = float(S[min_row, min_col])
        if vt.min_score == INF:
            return vt
        Mm, Im, Dm = vs.DP_M, vs.DP_I, vs.DP_D
        Tc = self.Tmat_cost
        s = "M" if min_col <= K else "I"
        i = min_row
        j = min_col if min_col <= K else K
        vt.aln_end = j
        vt.aln_to = i
        trace = ["E"]
        while i >= 1 and j >= 0:
            trace.append(s)
            if s == "M":
                if j > 1:
                    s = which_min4(Mm[i][0] + self.entry_cost[j],
                                   Mm[i - 1][j - 1] + Tc[j - 1][M][M],
                                   Im[i - 1][j - 1] + Tc[j - 1][I][M],
                                   Dm[i - 1][j - 1] + Tc[j - 1][D][M])
                else:
                    s = which_min2(Mm[i][0] + self.entry_cost[j],
                                   Im[i - 1][j - 1] + Tc[j - 1][I][M],
                                   "BI")
                i -= 1
                j -= 1
            elif s == "I":
                if j > 0:
                    s = which_min2(Mm[i - 1][j] + Tc[j][M][I],
                                   Im[i - 1][j] + Tc[j][I][I], "MI")
                else:
                    s = which_min2(Mm[i][0] + Tc[0][M][I],
                                   Im[i - 1][j] + Tc[j][I][I], "BI")
                i -= 1
            elif s == "D":
                s = which_min2(Mm[i][j - 1] + Tc[j - 1][M][D],
                               Dm[i][j - 1] + Tc[j - 1][D][D], "MD")
                j -= 1
            else:  # B
                break
        vt.aln_start = j + 1
        vt.aln_from = i + 1
        if trace[-1] != "B":
            trace.append("B")
        vt.aln_trace = "".join(reversed(trace))
        return vt

    # ------------------------------------------------------------------
    @staticmethod
    def get_padding_seq(L: int, insert: str, pad_ch: str,
                        mode: str) -> str:
        """Literal getPaddingSeq (BandedHMMP7.cpp:1137-1186)."""
        if not insert:
            return pad_ch * L
        n = len(insert)
        if mode == "LEFT":
            if n >= L:
                return insert[:L]
            return insert + pad_ch * (L - n)
        if mode == "RIGHT":
            if n >= L:
                return insert[n - L:]
            return pad_ch * (L - n) + insert
        if mode == "MIDDLE":
            if n >= L:
                o = (n - L) // 2
                return insert[o:o + L]
            lo = int(math.floor((L - n) / 2.0))
            hi = int(math.ceil((L - n) / 2.0))
            return pad_ch * lo + insert + pad_ch * hi
        if mode == "JUSTIFIED":
            if n >= L:
                lo = int(math.floor(L / 2.0))
                hi = int(math.ceil(L / 2.0))
                return insert[:lo] + insert[n - hi:]
            lo = int(math.floor(n / 2.0))
            hi = int(math.ceil(n / 2.0))
            return insert[:lo] + pad_ch * (L - n) + insert[:hi]
        return pad_ch * L

    def build_global_align(self, read: str, vs: OracleVScores,
                           vt: OracleVTrace) -> OracleAlignment:
        """Literal buildGlobalAlign (BandedHMMP7.cpp:1008-1081).

        NB: the bare `L` in the reference body is the PROFILE member
        csLen (BandedHMMP7.h), not the read length vs.L — the align
        string is over consensus coordinates."""
        L = self.L
        aln = OracleAlignment()
        seq_n = read[: vt.aln_from - 1]
        seq_c = read[vt.aln_to: vt.aln_to + (L - vt.aln_to)]
        cs_start = self.profile2cs[vt.aln_start]
        cs_end = self.profile2cs[vt.aln_end]
        out: list[str] = []
        j = 0
        k = 0
        insert = ""
        trace = vt.aln_trace
        ti = 0
        n_trace = len(trace)
        while ti < n_trace:
            state = trace[ti]
            if state == "B":
                out.append(self.get_padding_seq(cs_start - 1, seq_n,
                                                PAD_SYM, "RIGHT"))
                j = vt.aln_from
                k = vt.aln_start
            elif state == "M":
                if k > 1 and ti > 1 and \
                        self.profile2cs[k] - self.profile2cs[k - 1] > 1:
                    out.append(self.get_padding_seq(
                        self.profile2cs[k] - self.profile2cs[k - 1] - 1,
                        insert, GAP_SYM, "JUSTIFIED"))
                insert = ""
                out.append(read[j - 1])
                j += 1
                k += 1
            elif state == "I":
                ins: list[str] = []
                while ti < n_trace and trace[ti] == "I":
                    ins.append(read[j - 1].lower())
                    j += 1
                    ti += 1
                ti -= 1  # rewind
                insert = "".join(ins)
            elif state == "D":
                assert insert == ""
                if k > 1 and \
                        self.profile2cs[k] - self.profile2cs[k - 1] > 1:
                    out.append(GAP_SYM * (self.profile2cs[k]
                                          - self.profile2cs[k - 1] - 1))
                out.append(GAP_SYM)
                k += 1
            elif state == "E":
                assert j == vt.aln_to + 1
                out.append(self.get_padding_seq(L - cs_end, seq_c,
                                                PAD_SYM, "LEFT"))
            ti += 1
        aln.align = "".join(out)
        assert len(aln.align) == L
        aln.K = self.K
        aln.L = L
        aln.seq_start = vt.aln_from
        aln.seq_end = vt.aln_to
        aln.hmm_start = vt.aln_start
        aln.hmm_end = vt.aln_end
        aln.cs_start = cs_start
        aln.cs_end = cs_end
        aln.cost = vt.min_score
        return aln

    # ------------------------------------------------------------------
    def build_align_path(self, cs_loc, cs_from: int,
                         cs_to: int) -> OracleVPath:
        """Literal buildAlignPath (BandedHMMP7.cpp:894-941); cs_loc has
        .start/.end (1-based CS coords) and .CS (gapped string)."""
        start = end = from_ = to = n_ins = n_del = 0
        i = cs_from
        j = cs_loc.start
        for ch in cs_loc.CS:
            k = self.cs2profile[j]
            non_gap = ch.upper() in _ENC
            if from_ == 0 and non_gap:
                from_ = i
            if non_gap:
                to = i
            if k != 0:
                if start == 0:
                    start = k
                end = k
                if not non_gap:
                    n_del += 1
            else:
                if non_gap:
                    n_ins += 1
            j += 1
            if non_gap:
                i += 1
        assert i == cs_to + 1 and j == cs_loc.end + 1
        return OracleVPath(start, end, from_, to, n_ins, n_del)


def oracle_align_seq(ref: RefHmm, locator, read: str,
                     seed_len: int = 20, seed_region: int = 50,
                     mode: str = "global") -> OracleAlignment:
    """Literal alignSeq (HmmUFOtu_main.cpp:39-105): 5' (then for GLOBAL
    3') seed window scan, banded DP with full-DP fallback, traceback,
    global alignment."""
    L = len(read)
    vpaths: list[OracleVPath] = []
    region = seed_region if seed_region < L else L
    seed_from = 0
    while seed_from + seed_len - 1 < region:
        loc = locator.locate_one(read[seed_from: seed_from + seed_len])
        if loc is not None and loc.is_valid():
            vp = ref.build_align_path(loc, seed_from + 1,
                                      seed_from + seed_len)
            if vp.is_valid():
                vpaths.append(vp)
                break
        seed_from += 1
    if mode.lower() == "global" and (not vpaths or L >= 2 * region):
        seed_to = L - 1
        while seed_to - seed_len + 1 >= L - region:
            frm = seed_to - seed_len + 1
            loc = locator.locate_one(read[frm: seed_to + 1])
            if loc is not None and loc.is_valid():
                vp = ref.build_align_path(loc, frm + 1, seed_to + 1)
                if vp.is_valid():
                    vpaths.append(vp)
                    break
            seed_to -= 1

    enc = ref.encode(read)
    vs = OracleVScores(ref.K, L)
    if vpaths:
        ref.calc_viterbi_scores_banded(enc, vs, vpaths)
        if float(np.min(vs.S)) == INF:   # banded failed -> full DP
            vs.reset()
            ref.calc_viterbi_scores_full(enc, vs)
    else:
        ref.calc_viterbi_scores_full(enc, vs)
    vt = ref.build_viterbi_trace(vs)
    assert vt.min_score != INF
    return ref.build_global_align(read, vs, vt)
