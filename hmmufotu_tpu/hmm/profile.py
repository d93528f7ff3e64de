"""Plan7-like banded profile HMM (host-side model container).

reference: src/BandedHMMP7.{h,cpp} — per-position 3x3 transition
matrices Tmat[0..K] (h:505), match/insert emissions E_M/E_I 4x(K+1)
(h:508-509), special N/C/B/E transitions (h:512-513), entry/exit
vectors with wing retraction (cpp:1083-1120), HMMER3/f text IO
(cpp:100-246 read, 324-378 write), training from a weighted MSA with
Dirichlet priors and effective-N tuned to 1 bit mean relative entropy
by bisection (cpp:386-541); src/BandedHMMP7Bg.{h,cpp} null model.

The model itself is plain numpy (f64); `viterbi.py` lifts the cost
arrays onto the device for the batched DP.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass

import numpy as np

from ..alphabet import DNA
from ..mathx.dirichlet import HmmPrior
from ..mathx.rootfinder import root_bisection

# p7 match-state indices within Tmat rows/cols
M, I, D = 0, 1, 2
# p7 state letters used in traces
STATE_CHARS = "MID"

NAT2BIT = 1.0 / math.log(2.0)
DEFAULT_ERE = 1.0         # BandedHMMP7.cpp:55 target mean relative entropy
CONS_THRESHOLD = 0.9      # BandedHMMP7.cpp:54
K_MIN_GAP_FRAC = 0.2      # BandedHMMP7.cpp:53
MIN_BG_K = 350            # BandedHMMP7Bg.h MIN_BG_K
HMM_TAG = ("HMM\t\tA\tC\tG\tT\n\t\tm->m\tm->i\tm->d\ti->m\ti->i"
           "\td->m\td->d")

GLOBAL, LOCAL, NGCL, CGNL = "global", "local", "ngcl", "cgnl"

HMM_ALIGN_TSV_HEADER = ("CS_start\tCS_end\talignment")  # hmmufotu.cpp:592
GAP_SYM = "-"
PAD_SYM = "."


def _neglog(x):
    with np.errstate(divide="ignore"):
        return -np.log(x)


class HmmBg:
    """Null model: background base frequencies + geometric length
    transition (reference BandedHMMP7Bg.{h,cpp})."""

    def __init__(self, size: int):
        self.k = size
        self.bg_freq = np.full(4, 0.25)
        self._set_trans()

    def _set_trans(self):
        k = max(self.k, MIN_BG_K)
        self.p1 = k / (k + 1.0)

    def set_size(self, size: int):
        self.k = size
        self._set_trans()

    def set_bg_freq(self, q: np.ndarray):
        q = np.asarray(q, dtype=np.float64)
        self.bg_freq = q / q.sum() if q.sum() > 0 else np.full(4, 0.25)

    @property
    def bg_trans_pr(self) -> float:
        return self.p1

    @property
    def bg_term_pr(self) -> float:
        return 1 - self.p1


@dataclass
class HmmAlignment:
    """Result of one HMM alignment (reference BandedHMMP7.h:74-130).

    All coordinates 1-based as in the reference TSV output."""
    K: int = 0
    L: int = 0
    seq_start: int = 0
    seq_end: int = 0
    hmm_start: int = 0
    hmm_end: int = 0
    cs_start: int = 0
    cs_end: int = 0
    cost: float = math.inf
    align: str = ""

    def is_valid(self) -> bool:
        return (0 < self.seq_start <= self.seq_end
                and 0 < self.hmm_start <= self.hmm_end <= self.K
                and 0 < self.cs_start <= self.cs_end <= self.L
                and 0 <= self.cost < math.inf
                and self.L == len(self.align))

    def merge(self, other: "HmmAlignment") -> "HmmAlignment":
        """Merge a mate alignment in place (reference
        HmmAlignment::merge, BandedHMMP7.cpp:1188-1213)."""
        if not (self.K == other.K and self.L == other.L):
            return self
        self.seq_start = min(self.seq_start, other.seq_start)
        self.seq_end = max(self.seq_end, other.seq_end)
        self.hmm_start = min(self.hmm_start, other.hmm_start)
        self.hmm_end = max(self.hmm_end, other.hmm_end)
        self.cs_start = min(self.cs_start, other.cs_start)
        self.cs_end = max(self.cs_end, other.cs_end)
        self.cost += other.cost
        a = np.frombuffer(self.align.encode(), dtype=np.uint8).copy()
        b = np.frombuffer(other.align.encode(), dtype=np.uint8)
        mask = (a == ord(PAD_SYM)) & (b != ord(PAD_SYM))
        a[mask] = b[mask]
        self.align = a.tobytes().decode()
        return self


@dataclass
class ViterbiAlignPath:
    """A seed-derived known align path constraining the banded DP
    (reference BandedHMMP7.h:238-258); 1-based coordinates."""
    start: int = 0  # profile
    end: int = 0
    from_: int = 0  # seq
    to: int = 0
    n_ins: int = 0
    n_del: int = 0

    def is_valid(self) -> bool:
        return (self.start > 0 and self.start <= self.end
                and 0 < self.from_ <= self.to
                and self.n_ins >= 0 and self.n_del >= 0)


class ProfileHMM:
    """The profile HMM model (probabilities + -log cost copies)."""

    def __init__(self, name: str = "", K: int = 0, L: int = 0):
        self.name = name
        self.version = "hmmufotu-tpu"
        self.abc = DNA
        self.K = K
        self.L = L
        self.n_seq = 0
        self.eff_n = 0.0
        self.wing_retracted = False
        self.opt_tags: dict[str, str] = {}
        self.loc_opt_tags: dict[str, list[str]] = {}
        if K:
            self._alloc()
        self.bg = HmmBg(K)
        # special-state transitions (probability scale)
        self.t_NN = 0.0
        self.t_NB = 1.0
        self.t_CC = 0.0
        self.t_EC = 1.0

    def _alloc(self):
        K = self.K
        self.Tmat = np.zeros((K + 1, 3, 3))
        self.E_M = np.zeros((4, K + 1))
        self.E_I = np.zeros((4, K + 1))
        self.entry = np.zeros(K + 1)
        self.exit = np.zeros(K + 1)
        self.Tmat_cost = np.full((K + 1, 3, 3), np.inf)
        self.E_M_cost = np.full((4, K + 1), np.inf)
        self.E_I_cost = np.full((4, K + 1), np.inf)
        self.entry_cost = np.full(K + 1, np.inf)
        self.exit_cost = np.full(K + 1, np.inf)
        self.profile2cs = np.zeros(K + 1, dtype=np.int64)
        self.cs2profile = np.zeros(0, dtype=np.int64)  # sized on L known

    # ----- derived cost copies -------------------------------------------
    def reset_cost_by_prob(self):
        self.Tmat_cost = _neglog(self.Tmat)
        self.E_M_cost = _neglog(self.E_M)
        self.E_I_cost = _neglog(self.E_I)
        self.entry_cost = _neglog(self.entry)
        self.exit_cost = _neglog(self.exit)

    def reset_prob_by_cost(self):
        self.Tmat = np.exp(-self.Tmat_cost)
        self.E_M = np.exp(-self.E_M_cost)
        self.E_I = np.exp(-self.E_I_cost)

    @property
    def t_NN_cost(self):
        return -math.log(self.t_NN) if self.t_NN > 0 else math.inf

    @property
    def t_NB_cost(self):
        return -math.log(self.t_NB) if self.t_NB > 0 else math.inf

    @property
    def t_CC_cost(self):
        return -math.log(self.t_CC) if self.t_CC > 0 else math.inf

    @property
    def t_EC_cost(self):
        return -math.log(self.t_EC) if self.t_EC > 0 else math.inf

    # ----- modes (reference BandedHMMP7.cpp:561-583) ----------------------
    def set_sequence_mode(self, mode: str):
        if mode == GLOBAL:
            self.t_NN = self.t_CC = 0.0
        elif mode == LOCAL:
            self.t_NN = self.t_CC = self.bg.bg_term_pr
        elif mode == NGCL:
            self.t_NN = 0.0
            self.t_CC = self.bg.bg_term_pr
        elif mode == CGNL:
            self.t_NN = self.bg.bg_term_pr
            self.t_CC = 0.0
        else:
            raise ValueError(f"unknown align mode {mode}")
        self.t_NB = 1.0 - self.t_NN
        self.t_EC = 1.0

    def enable_profile_local_mode(self):
        """Uniform B->Mj / Mj->E local entry/exit
        (reference BandedHMMP7.cpp:704-717)."""
        self.entry[0] = self.exit[0] = 0.0
        self.entry[1:] = 1 - self.bg.bg_trans_pr
        self.exit[1:] = 1 - self.bg.bg_trans_pr
        self.entry_cost = _neglog(self.entry)
        self.exit_cost = _neglog(self.exit)

    def adjust_profile_local_mode(self):
        """Entry/exit from the trained B->M1 / MK->E probabilities
        (reference BandedHMMP7.cpp:719-731)."""
        self.entry[0] = self.exit[0] = 0.0
        self.entry[1:] = self.Tmat[0, M, M]
        self.exit[1:] = self.Tmat[self.K, M, M]
        self.entry_cost = _neglog(self.entry)
        self.exit_cost = _neglog(self.exit)

    def wing_retract(self):
        """Fold B->D1..Dj-1->Mj and Mi->Di+1..DK->E silent chains into
        the entry/exit vectors (reference BandedHMMP7.cpp:1083-1120)."""
        if self.wing_retracted:
            return
        K = self.K
        # entry: B->D1 + sum(Di->Di+1) + Dj-1->Mj
        dd = self.Tmat_cost[:, D, D]           # dd[i] = cost Di->Di+1
        dd_cum = np.concatenate([[0.0], np.cumsum(dd[1:K])])  # sum dd[1..x]
        for j in range(2, K + 1):
            cost = (self.Tmat_cost[0, M, D] + dd_cum[j - 2]
                    + self.Tmat_cost[j - 1, D, M])
            self.entry[j] = min(self.entry[j] + math.exp(-cost), 1.0)
        # exit: Mi->Di+1 + sum(Dj->Dj+1) + DK->E
        for i in range(1, K):
            cost = (self.Tmat_cost[i, M, D]
                    + (dd_cum[K - 1] - dd_cum[i])
                    + self.Tmat_cost[K, D, M])
            self.exit[i] = min(self.exit[i] + math.exp(-cost), 1.0)
        self.entry_cost = _neglog(self.entry)
        self.exit_cost = _neglog(self.exit)
        self.wing_retracted = True

    # ----- scaling / priors / entropy (training) --------------------------
    def scale(self, r: float):
        self.Tmat *= r
        self.E_M *= r
        self.E_I *= r
        self.reset_cost_by_prob()

    def estimate_params(self, prior: HmmPrior):
        """Posterior-mean parameters from observed weighted counts + the
        5 Dirichlet priors (reference BandedHMMP7.cpp:280-315)."""
        for k in range(self.K + 1):
            self.Tmat[k, M] = prior.dmMT.mean_post_p(self.Tmat[k, M])
            self.Tmat[k, I, :2] = prior.dmIT.mean_post_p(self.Tmat[k, I, :2])
            dt = prior.dmDT.mean_post_p(
                np.array([self.Tmat[k, D, M], self.Tmat[k, D, D]]))
            self.Tmat[k, D, M] = dt[0]
            self.Tmat[k, D, D] = dt[1]
            self.E_M[:, k] = prior.dmME.mean_post_p(self.E_M[:, k])
            self.E_I[:, k] = prior.dmIE.mean_post_p(self.E_I[:, k])
        # enforce the T[0] and T[K] specials
        self.Tmat[0, D, M] = 1.0
        self.Tmat[0, D, D] = 0.0
        self.Tmat[self.K, M, D] = 0.0
        self.Tmat[self.K, D, M] = 1.0
        self.Tmat[self.K, D, D] = 0.0
        self.reset_cost_by_prob()

    def mean_relative_entropy(self) -> float:
        """Mean per-position match-emission relative entropy vs the
        background, in bits (reference BandedHMMP7.cpp:317-322)."""
        p = self.E_M[:, 1:]
        q = self.bg.bg_freq[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(p > 0, p * np.log(p / q), 0.0)
        return float(NAT2BIT * terms.sum() / self.K)

    # ----- training from an MSA (reference BandedHMMP7.cpp:386-541) -------
    @classmethod
    def build(cls, msa, symfrac: float, prior: HmmPrior,
              name: str = "") -> "ProfileHMM":
        if msa.num_seq == 0:
            raise ValueError("Empty MSA encountered")
        if not (0 < symfrac < 1):
            raise ValueError("symfrac must between 0 and 1")
        L = msa.cs_len
        N = msa.num_seq

        # match columns by weighted symbol fraction
        sym_wfrac = msa.sym_wfrac()
        is_match = sym_wfrac >= symfrac           # [L] 0-based
        K = int(is_match.sum())

        hmm = cls(name or msa.name, K, L)
        hmm.bg = HmmBg(K)
        # dual coordinate maps; cs2profile is the sparse map (0 at
        # non-match CS columns) used by the read/assignment path
        hmm.profile2cs = np.zeros(K + 1, dtype=np.int64)
        hmm.profile2cs[1:] = np.nonzero(is_match)[0] + 1  # 1-based
        hmm.cs2profile = np.zeros(L + 2, dtype=np.int64)
        hmm.cs2profile[hmm.profile2cs[1:]] = np.arange(1, K + 1)
        # trailing columns map to K (reference extend_index, cpp:700)
        if K:
            hmm.cs2profile[hmm.profile2cs[K] + 1:] = K

        # dense running-count map for training-state determination
        cs2k = np.cumsum(is_match)                # [L] 1-based profile idx

        codes = msa.codes                         # [N, L] int8
        w = msa.seq_weight                        # [N]
        is_res = codes >= 0

        # per-cell p7 state: M/I at residues, D at gaps of match cols,
        # P elsewhere (reference determineMatchingState, h:713-716)
        sm = np.full((N, L), 3, dtype=np.int8)    # 3 = P
        sm[is_res & is_match[None, :]] = M
        sm[is_res & ~is_match[None, :]] = I
        sm[~is_res & is_match[None, :]] = D

        # emission counts (vectorized per-column accumulation)
        for b in range(4):
            sel_m = (codes == b) & (sm == M)
            sel_i = (codes == b) & (sm == I)
            wm = (sel_m * w[:, None]).sum(axis=0)        # [L]
            wi = (sel_i * w[:, None]).sum(axis=0)
            np.add.at(hmm.E_M[b], cs2k, wm)
            np.add.at(hmm.E_I[b], cs2k, wi)
        hmm.E_M[:, 0] = (
            (np.stack([(codes == b) & (sm == M) for b in range(4)])
             * w[None, :, None]).sum(axis=(1, 2)))

        # transition counts: for each cell, next non-P cell on the row
        for i in range(N):
            row_sm = sm[i]
            pos = np.nonzero(row_sm != 3)[0]
            if pos.size == 0:
                continue
            s = row_sm[pos]
            k_at = cs2k[pos]
            # consecutive informative positions
            s_cur, s_nxt = s[:-1], s[1:]
            k_cur = k_at[:-1]
            keep = ~(((s_cur == I) & (s_nxt == D))
                     | ((s_cur == D) & (s_nxt == I)))
            np.add.at(hmm.Tmat, (k_cur[keep], s_cur[keep], s_nxt[keep]),
                      w[i])
            # B->first and last->E specials use the FIRST/LAST residue
            # state, not the first informative cell (cpp:469-479)
            res = np.nonzero(is_res[i])[0]
            if res.size:
                hmm.Tmat[0, M, sm[i, res[0]]] += w[i]
                hmm.Tmat[K, sm[i, res[-1]], M] += w[i]

        hmm.n_seq = N
        hmm.eff_n = float(N)

        # tune effN to the target mean relative entropy by bisection
        # (reference RelativeEntropyTargetFunc, cpp:1122-1135)
        base_T = hmm.Tmat.copy()
        base_EM = hmm.E_M.copy()
        base_EI = hmm.E_I.copy()

        def ent_gap(x: float) -> float:
            if x > hmm.eff_n:
                return 0.0
            hmm.Tmat = base_T * (x / N)
            hmm.E_M = base_EM * (x / N)
            hmm.E_I = base_EI * (x / N)
            hmm.bg.set_bg_freq(hmm.E_M[:, 0])
            hmm.estimate_params(prior)
            return hmm.mean_relative_entropy() - DEFAULT_ERE

        eff_n = root_bisection(ent_gap, 0, N)
        if math.isnan(eff_n):
            eff_n = float(N)
        hmm.eff_n = eff_n
        hmm.Tmat = base_T * (eff_n / N)
        hmm.E_M = base_EM * (eff_n / N)
        hmm.E_I = base_EI * (eff_n / N)
        hmm.estimate_params(prior)

        hmm.bg.set_bg_freq(hmm.E_M[:, 0])

        # optional tags mirroring the reference output (cpp:496-541)
        hmm.opt_tags = {
            "MAXL": str(L), "RF": "no", "MM": "no", "CONS": "yes",
            "CS": "no", "MAP": "yes", "NSEQ": str(N),
            "EFFN": f"{eff_n:g}",
            "DATE": time.strftime("%c"),
        }
        cons = [""]
        for k in range(1, K + 1):
            j = hmm.profile2cs[k]          # 1-based CS col
            c = msa.cs_base_at(j - 1)
            if msa.w_identity_at(j - 1) < CONS_THRESHOLD:
                c = c.lower()
            cons.append(c)
        hmm.loc_opt_tags = {
            "MAP": [""] + [str(int(j)) for j in hmm.profile2cs[1:]],
            "CONS": cons,
        }
        # make alignment-ready in memory (the reference reaches this
        # state via the write->read roundtrip, cpp:104-110)
        hmm.adjust_profile_local_mode()
        hmm.wing_retract()
        hmm.set_sp_emission_freq(hmm.E_M[:, 0])
        return hmm

    def set_sp_emission_freq(self, freq: np.ndarray):
        f = np.asarray(freq, dtype=np.float64)
        self.sp_emission = f / f.sum() if f.sum() > 0 else np.full(4, .25)

    # ----- coordinate helpers ---------------------------------------------
    def get_profile_loc(self, cs_pos: int) -> int:
        """1-based CS position -> profile position (0 = not a match
        column)."""
        return int(self.cs2profile[cs_pos])

    def get_cs_loc(self, k: int) -> int:
        return int(self.profile2cs[k])

    # ----- seed path construction (reference cpp:894-940) -----------------
    def build_align_path(self, cs_loc, cs_from: int, cs_to: int
                         ) -> ViterbiAlignPath:
        """Convert an FM-index CSLoc hit into a profile align path."""
        start = end = from_ = to = n_ins = n_del = 0
        i = cs_from
        j = cs_loc.start
        for ch in cs_loc.cs:
            k = self.get_profile_loc(j)
            non_gap = self.abc.is_symbol_char(ch)
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
        return ViterbiAlignPath(start, end, from_, to, n_ins, n_del)

    # ----- HMMER3/f text IO -----------------------------------------------
    @classmethod
    def from_hmmer_file(cls, path_or_stream) -> "ProfileHMM":
        """Parse HMMER3/f text (reference operator>>, cpp:100-246)."""
        if isinstance(path_or_stream, (str, os.PathLike)):
            with open(path_or_stream) as fh:
                text = fh.read()
        else:
            text = path_or_stream.read()
        hmm = cls()
        lines = text.splitlines()
        li = 0
        k = 0
        map_positions: list[int] = []

        def tokens_from(idx):
            """Generator yielding whitespace tokens from lines[idx:]."""
            for lx in range(idx, len(lines)):
                for tok in lines[lx].split():
                    yield tok, lx

        in_body = False
        while li < len(lines):
            line = lines[li]
            if line.strip() == "//":
                break
            if not in_body:
                toks = line.split()
                if not toks:
                    li += 1
                    continue
                tag = toks[0]
                if tag.startswith("HMMER3"):
                    pass
                elif tag == "NAME":
                    hmm.name = toks[1] if len(toks) > 1 else ""
                elif tag == "LENG":
                    hmm.K = int(toks[1])
                    hmm._alloc()
                    hmm.bg = HmmBg(hmm.K)
                    hmm.enable_profile_local_mode()
                    hmm.set_sp_emission_freq(np.full(4, 0.25))
                elif tag == "ALPH":
                    if toks[1] != "DNA":
                        raise ValueError(
                            f"Not allowed alphabet '{toks[1]}', must be DNA")
                elif tag == "MAXL":
                    # keep it in opt_tags too so write->read->write
                    # round-trips preserve it (the reference stores all
                    # optional tags and echoes them back, cpp:135,345)
                    hmm.L = int(toks[1])
                    hmm.opt_tags[tag] = toks[1]
                elif tag == "HMM":
                    li += 2  # skip the transition header line
                    in_body = True
                    continue
                else:
                    hmm.opt_tags[tag] = " ".join(toks[1:])
                    if tag == "NSEQ":
                        hmm.n_seq = int(toks[1])
                    elif tag == "EFFN":
                        hmm.eff_n = float(toks[1])
                li += 1
                continue
            # body: 3 logical lines per position (may wrap); consume by
            # token counts like the reference's stream extraction
            toks = line.split()
            li += 1
            if not toks:
                continue
            tag = toks[0]
            vals = toks[1:]

            def take(n):
                nonlocal vals, li
                out = []
                while len(out) < n:
                    if vals:
                        out.append(vals.pop(0))
                    else:
                        vals = lines[li].split()
                        li += 1
                return out

            if tag == "COMPO" or tag.lstrip("-").isdigit():
                em = [_hmm_value(x) for x in take(4)]
                if tag == "COMPO":
                    hmm.E_M_cost[:, 0] = em
                    freq = np.exp(-np.array(em))
                    hmm.set_sp_emission_freq(freq)
                    hmm.bg.set_bg_freq(freq)
                else:
                    hmm.E_M_cost[:, k] = em
                    if hmm.opt_tags.get("MAP") != "yes":
                        raise ValueError(
                            "HMM file must have the MAP flag set to 'yes'")
                    # the MAP/CONS/RF/MM/CS extras are line-scoped: the
                    # reference reads them from the match line's own
                    # stringstream, silently stopping at EOL
                    # (cpp:186-213)
                    map_pos = int(vals.pop(0))
                    map_positions.append(map_pos)
                    for opt in ("CONS", "RF", "MM", "CS"):
                        if hmm.opt_tags.get(opt) and vals:
                            hmm.loc_opt_tags.setdefault(
                                opt, [""] * (hmm.K + 1))
                            hmm.loc_opt_tags[opt][k] = vals.pop(0)
                    vals = []
                hmm.E_I_cost[:, k] = [_hmm_value(x) for x in take(4)]
                t = [_hmm_value(x) for x in take(7)]
                (hmm.Tmat_cost[k, M, M], hmm.Tmat_cost[k, M, I],
                 hmm.Tmat_cost[k, M, D], hmm.Tmat_cost[k, I, M],
                 hmm.Tmat_cost[k, I, I], hmm.Tmat_cost[k, D, M],
                 hmm.Tmat_cost[k, D, D]) = t
                k += 1
            else:
                # begin state line without COMPO: insert emissions +
                # transitions for k=0
                vals = toks
                hmm.E_I_cost[:, 0] = [_hmm_value(x) for x in take(4)]
                t = [_hmm_value(x) for x in take(7)]
                (hmm.Tmat_cost[0, M, M], hmm.Tmat_cost[0, M, I],
                 hmm.Tmat_cost[0, M, D], hmm.Tmat_cost[0, I, M],
                 hmm.Tmat_cost[0, I, I], hmm.Tmat_cost[0, D, M],
                 hmm.Tmat_cost[0, D, D]) = t
                k += 1

        # build coordinate maps from MAP tags
        hmm.cs2profile = np.zeros(max(hmm.L + 2, max(map_positions or [0])
                                      + 2), dtype=np.int64)
        for kk, mp in enumerate(map_positions, start=1):
            hmm.profile2cs[kk] = mp
            hmm.cs2profile[mp] = kk
        if hmm.K:
            hmm.cs2profile[hmm.profile2cs[hmm.K] + 1:] = hmm.K
        hmm.loc_opt_tags["MAP"] = [""] + [str(m) for m in map_positions]

        hmm.reset_prob_by_cost()
        hmm.adjust_profile_local_mode()
        hmm.wing_retract()
        return hmm

    def to_hmmer_file(self, path_or_stream):
        """Write HMMER3/f text (reference operator<<, cpp:324-378)."""
        fh = (open(path_or_stream, "w")
              if isinstance(path_or_stream, (str, os.PathLike))
              else path_or_stream)
        try:
            fh.write(f"HMMER3/f\t{self.version}\n")
            fh.write(f"NAME\t{self.name}\n")
            fh.write(f"LENG\t{self.K}\n")
            fh.write("ALPH\tDNA\n")
            for tag, val in self.opt_tags.items():
                fh.write(f"{tag}  {val}\n")
            fh.write(HMM_TAG + "\n")

            def fmt(x):
                return "*" if math.isinf(x) else f"{x:.5f}"

            def wline(vals, extra=""):
                fh.write("\t" + "\t".join(vals) + (("\t" + extra)
                                                   if extra else "") + "\n")

            for k in range(self.K + 1):
                if k == 0:
                    wline(["COMPO"] + [fmt(v) for v in self.E_M_cost[:, 0]])
                else:
                    extra = []
                    if self.opt_tags.get("MAP"):
                        extra.append(self.loc_opt_tags["MAP"][k])
                    if self.opt_tags.get("CONS"):
                        extra.append(self.loc_opt_tags["CONS"][k])
                    wline([str(k)] + [fmt(v) for v in self.E_M_cost[:, k]],
                          "\t".join(extra))
                wline([fmt(v) for v in self.E_I_cost[:, k]])
                t = self.Tmat_cost[k]
                wline([fmt(t[M, M]), fmt(t[M, I]), fmt(t[M, D]),
                       fmt(t[I, M]), fmt(t[I, I]),
                       fmt(t[D, M]), fmt(t[D, D])])
            fh.write("//\n")
        finally:
            if isinstance(path_or_stream, (str, os.PathLike)):
                fh.close()


def _hmm_value(s: str) -> float:
    return math.inf if s == "*" else float(s)


# --------------------------------------------------------------------------
# alignment-string reconstruction (reference BandedHMMP7.cpp:1008-1186)
# --------------------------------------------------------------------------

def get_padding_seq(n: int, insert: str, pad_ch: str, mode: str) -> str:
    """Pad/trim `insert` into exactly n characters
    (reference getPaddingSeq, BandedHMMP7.cpp:1139-1186)."""
    if n <= 0:
        return ""
    if not insert:
        return pad_ch * n
    ln = len(insert)
    if mode == "left":
        return insert[:n] if ln >= n else insert + pad_ch * (n - ln)
    if mode == "right":
        return insert[ln - n:] if ln >= n else pad_ch * (n - ln) + insert
    if mode == "middle":
        if ln >= n:
            off = (ln - n) // 2
            return insert[off:off + n]
        left = (n - ln) // 2
        return pad_ch * left + insert + pad_ch * (n - ln - left)
    if mode == "justified":
        if ln >= n:
            head = n // 2
            tail = n - head
            return insert[:head] + insert[ln - tail:]
        head = ln // 2
        tail = (ln + 1) // 2
        return insert[:head] + pad_ch * (n - ln) + insert[:tail]
    raise ValueError(f"unknown padding mode {mode}")


def build_global_align_path(hmm: ProfileHMM, seq: str,
                            states: "np.ndarray",
                            aln_start: int, aln_end: int,
                            aln_from: int, aln_to: int,
                            min_score: float) -> HmmAlignment:
    """Vectorized build_global_align on a NUMERIC state path.

    states: forward-order uint8 array over {1=M, 2=I, 3=D} (B/E
    implied).  Byte-identical to build_global_align on the equivalent
    trace string (cross-checked in tests) but scatters match/delete
    columns with numpy instead of a per-character Python loop — this
    is the batch hot path of the aligner (reference buildGlobalAlign,
    BandedHMMP7.cpp:1008-1081).
    """
    import numpy as np
    L = hmm.L
    p2c = hmm.profile2cs
    cs_start = int(p2c[aln_start])
    cs_end = int(p2c[aln_end])
    sb = np.frombuffer(seq.encode("latin-1"), np.uint8)
    out = np.full(L, ord("."), np.uint8)

    # prefix / suffix pads (get_padding_seq right/left semantics)
    npref = cs_start - 1
    seq_n = sb[: aln_from - 1]
    if npref > 0:
        if len(seq_n) >= npref:
            out[:npref] = seq_n[len(seq_n) - npref:]
        elif len(seq_n):
            out[npref - len(seq_n):npref] = seq_n
    nsuf = L - cs_end
    seq_c = sb[aln_to:]
    if nsuf > 0:
        if len(seq_c) >= nsuf:
            out[cs_end:] = seq_c[:nsuf]
        elif len(seq_c):
            out[cs_end:cs_end + len(seq_c)] = seq_c

    # interior default: every aligned column and inter-column gap
    # is '-' unless a match/insert character lands on it
    out[cs_start - 1:cs_end] = ord("-")

    is_m = states == 1
    is_i = states == 2
    is_d = states == 3
    k_ev = aln_start - 1 + np.cumsum(is_m | is_d)
    j_ev = aln_from - 1 + np.cumsum(is_m | is_i)
    mt = np.nonzero(is_m)[0]
    out[p2c[k_ev[mt]] - 1] = sb[j_ev[mt] - 1]

    # insert runs flush (justified) into the gap before the NEXT
    # match state, replicating the trace-string walker exactly:
    # only the last run before an M survives, trailing runs are
    # dropped, and the first trace element never flushes
    if is_i.any():
        ii = np.nonzero(is_i)[0]
        run_s = ii[np.r_[True, np.diff(ii) > 1]]
        run_e = ii[np.r_[np.diff(ii) > 1, True]]
        n_ev = len(states)
        # next M event index at or after run end + 1 (searchsorted
        # instead of a Python backward scan over the whole path)
        m_idx = np.nonzero(is_m)[0]
        pos_m = np.searchsorted(m_idx, run_e + 1)
        for s0, e0, pm in zip(run_s, run_e, pos_m):
            t = int(m_idx[pm]) if pm < len(m_idx) else n_ev
            if t >= n_ev or t == 0:
                continue
            km = int(k_ev[t])
            if km <= 1:
                continue
            w = int(p2c[km] - p2c[km - 1] - 1)
            if w <= 0:
                continue
            ins = sb[j_ev[s0:e0 + 1] - 1].copy()
            up = (ins >= 65) & (ins <= 90)
            ins[up] += 32
            ln = len(ins)
            if ln >= w:
                head = w // 2
                tail = w - head
                reg = np.concatenate([ins[:head], ins[ln - tail:]])
            else:
                head = ln // 2
                tail = (ln + 1) // 2
                reg = np.full(w, ord("-"), np.uint8)
                reg[:head] = ins[:head]
                if tail:
                    reg[w - tail:] = ins[:tail]
            base = int(p2c[km - 1])
            out[base:base + w] = reg

    align = out.tobytes().decode("latin-1")
    return HmmAlignment(hmm.K, L, aln_from, aln_to, aln_start, aln_end,
                        cs_start, cs_end, min_score, align)


def build_global_align(hmm: ProfileHMM, seq: str, trace: str,
                       aln_start: int, aln_end: int,
                       aln_from: int, aln_to: int,
                       min_score: float) -> HmmAlignment:
    """Reconstruct the full gapped CS-length alignment string from a
    Viterbi state trace (reference buildGlobalAlign, cpp:1008-1081).

    trace: string over B/M/I/D/E; coordinates 1-based.
    """
    L = hmm.L
    seq_n = seq[:aln_from - 1]
    seq_c = seq[aln_to:]
    cs_start = int(hmm.profile2cs[aln_start])
    cs_end = int(hmm.profile2cs[aln_end])

    out: list[str] = []
    j = 0  # 1-based position on seq
    k = 0  # 1-based position on profile
    insert = ""
    ti = 0
    n = len(trace)
    while ti < n:
        state = trace[ti]
        if state == "B":
            out.append(get_padding_seq(cs_start - 1, seq_n, PAD_SYM,
                                       "right"))
            j = aln_from
            k = aln_start
        elif state == "M":
            if k > 1 and ti > 1 \
                    and hmm.profile2cs[k] - hmm.profile2cs[k - 1] > 1:
                out.append(get_padding_seq(
                    int(hmm.profile2cs[k] - hmm.profile2cs[k - 1] - 1),
                    insert, GAP_SYM, "justified"))
            insert = ""
            out.append(seq[j - 1])
            j += 1
            k += 1
        elif state == "I":
            ins_chars = []
            while ti < n and trace[ti] == "I":
                ins_chars.append(seq[j - 1].lower())
                j += 1
                ti += 1
            ti -= 1
            insert = "".join(ins_chars)
        elif state == "D":
            if k > 1 and hmm.profile2cs[k] - hmm.profile2cs[k - 1] > 1:
                out.append(GAP_SYM
                           * int(hmm.profile2cs[k] - hmm.profile2cs[k - 1]
                                 - 1))
            out.append(GAP_SYM)
            k += 1
        elif state == "E":
            out.append(get_padding_seq(L - cs_end, seq_c, PAD_SYM, "left"))
        ti += 1

    align = "".join(out)
    assert len(align) == L, f"align len {len(align)} != {L}"
    return HmmAlignment(hmm.K, L, aln_from, aln_to, aln_start, aln_end,
                        cs_start, cs_end, min_score, align)
