"""DNA substitution models (time-reversible family).

reference: src/DNASubModel.{h,cpp} (abstract interface + training helpers),
src/GTR.{h,cpp} (eigendecomposed P(t) = U diag(exp(lambda t)) U^-1),
src/TN93.h:113-155, src/HKY85.h:111-158, src/F81.h:110-122,
src/K80.h:109-120, src/JC69.h:97-101 (closed forms),
src/DNASubModelFactory.{h,cpp} (by-name creation), .sm text format as
shipped in data/gg_97_otus_*.sm.

Every model exposes:
  pi            [4]  stationary distribution
  Pr(v)         [4,4] transition matrix for branch length v (numpy f64)
  Pr_batch(v)   [...,4,4] vectorized over an arbitrary-shape v array —
                this is the TPU-facing form: parameters are baked into
                closed-form jnp expressions / eigendecomposition tensors
                so XLA can fuse them into the placement kernels.
  sub_dist(D,N) model-corrected distance from observed difference matrix
  train(Pv, f)  parameter estimation from transition counts
"""

from __future__ import annotations

import io
import math
import os

import numpy as np

A, C, G, T = 0, 1, 2, 3


def _fmt(v: float) -> str:
    return f"{v:.17g}"


class SubModel:
    """Base class; subclasses set name and implement Pr/sub_dist/train."""

    name = "base"

    # --- shared helpers (reference DNASubModel.cpp) -----------------------
    @staticmethod
    def calc_trans_freq_2seq(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        """Goldman 2-seq transition counts (DNASubModel.cpp:44-55)."""
        valid = (s1 >= 0) & (s2 >= 0)
        f = np.zeros((4, 4))
        np.add.at(f, (s1[valid], s2[valid]), 1)
        return f

    @staticmethod
    def calc_trans_freq_3seq(out: np.ndarray, s1: np.ndarray,
                             s2: np.ndarray) -> np.ndarray:
        """Gojobori 3-seq transition counts (DNASubModel.cpp:69-100)."""
        f = np.zeros((4, 4))
        valid = (out >= 0) & (s1 >= 0) & (s2 >= 0)
        b0, b1, b2 = out[valid], s1[valid], s2[valid]
        bc = np.full(b0.shape, -1, dtype=np.int64)
        bc = np.where((b0 == b1) & (b0 == b2), b0, bc)
        bc = np.where((b0 == b1) & (b0 != b2), b0, bc)
        bc = np.where((b0 == b2) & (b0 != b1), b0, bc)
        bc = np.where((b0 != b1) & (b0 != b2) & (b1 == b2), b1, bc)
        ok = bc >= 0
        np.add.at(f, (bc[ok], b0[ok]), 1)
        np.add.at(f, (bc[ok], b1[ok]), 1)
        np.add.at(f, (bc[ok], b2[ok]), 1)
        return f

    @staticmethod
    def calc_base_freq(seq: np.ndarray) -> np.ndarray:
        f = np.zeros(4)
        valid = seq >= 0
        np.add.at(f, seq[valid], 1)
        return f

    @staticmethod
    def scale_q(Q: np.ndarray, pi: np.ndarray, mu: float = 1.0) -> np.ndarray:
        """Scale rate matrix to mu expected substitutions per unit time
        (reference DNASubModel.cpp:126-129)."""
        beta = float(pi @ np.diag(Q))
        return Q / -beta * mu

    @staticmethod
    def constrained_q_from_p(P: np.ndarray, reversible: bool = True):
        """Constrained Q estimate from observed transition counts
        (reference DNASubModel.cpp:152-167)."""
        if reversible:
            P = (P + P.T) / 2.0
        Z = P.sum(axis=1)
        Q = np.zeros((4, 4))
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(4):
                for j in range(4):
                    if i != j:
                        Q[i, j] = P[i, j] / Z[i]
                        Q[i, i] -= Q[i, j]
        return Q

    @staticmethod
    def is_valid_rate(Q: np.ndarray) -> bool:
        off = Q[~np.eye(4, dtype=bool)]
        return bool(np.isfinite(Q).all() and (off >= 0).all()
                    and (np.diag(Q) < 0).all())

    # --- interface --------------------------------------------------------
    @property
    def pi(self) -> np.ndarray:
        raise NotImplementedError

    def Pr(self, v: float) -> np.ndarray:
        return np.asarray(self.Pr_batch(np.float64(v)))

    def Pr_batch(self, v) -> np.ndarray:
        """[..., 4, 4] transition matrices for branch lengths v [...]
        using numpy ufuncs only, so it traces cleanly under jax.numpy."""
        raise NotImplementedError

    def sub_dist(self, D: np.ndarray, N: float) -> float:
        raise NotImplementedError

    def train(self, Pv: list[np.ndarray], f: np.ndarray):
        raise NotImplementedError

    # --- text IO (.sm format) ----------------------------------------------
    def _write_params(self, fh):
        raise NotImplementedError

    def _read_params(self, tags: dict):
        raise NotImplementedError

    def write(self, fh):
        fh.write("# DNA Substitution Model\n")
        fh.write(f"Type: {self.name}\n")
        self._write_params(fh)

    def __repr__(self):
        return f"{self.name}(pi={np.round(self.pi, 4)})"


class JC69(SubModel):
    """Jukes-Cantor 1969 (reference src/JC69.h)."""

    name = "JC69"
    _pi = np.full(4, 0.25)

    @property
    def pi(self):
        return self._pi

    def Pr_batch(self, v):
        np_ = _np_of(v)
        e = np_.exp(-4.0 * np_.asarray(v)[..., None, None] / 3.0)
        eye = np_.eye(4)
        return eye * (1 + 3 * e) / 4 + (1 - eye) * (1 - e) / 4

    def sub_dist(self, D, N):
        if N == 0:
            return 0.0
        p = (D.sum() - np.trace(D)) / N
        return -3.0 / 4.0 * math.log(1.0 - 4.0 / 3.0 * p)

    def train(self, Pv, f):
        pass  # parameter free

    def _write_params(self, fh):
        pass

    def _read_params(self, tags):
        pass


class K80(SubModel):
    """Kimura 1980 (reference src/K80.h)."""

    name = "K80"
    _pi = np.full(4, 0.25)

    def __init__(self, kappa: float = 1.0):
        self.kappa = kappa

    @property
    def pi(self):
        return self._pi

    @property
    def beta(self):
        return 1.0 / (2.0 * self.kappa)

    def Pr_batch(self, v):
        np_ = _np_of(v)
        v = np_.asarray(v)[..., None, None]
        beta = self.beta
        e = np_.exp(-4 * beta * v)
        eV = np_.exp(-2 * (1 + self.kappa) * beta * v)
        self_p = (1.0 + e + 2 * eV) / 4
        ti = (1.0 + e - 2 * eV) / 4
        tv = (1.0 - e) / 4
        eye = np_.eye(4)
        ti_mask = _ti_mask(np_)
        return eye * self_p + ti_mask * ti + (1 - eye - ti_mask) * tv

    def sub_dist(self, D, N):
        if N == 0:
            return 0.0
        p = (D[A, G] + D[G, A] + D[C, T] + D[T, C]) / N
        q = _tv_sum(D) / N
        return -0.5 * math.log(1 - 2 * p - q) - 0.25 * math.log(1 - 2 * q)

    def train(self, Pv, f):
        # reference K80.cpp trainParams: average Ti/Tv from counts
        ti = tv = 0.0
        for P in Pv:
            P = (P + P.T) / 2
            n = P.sum()
            if n == 0:
                continue
            ti += (P[A, G] + P[G, A] + P[C, T] + P[T, C]) / n
            tv += _tv_sum(P) / n
        self.kappa = 2.0 * ti / tv if tv > 0 else 1.0

    def _write_params(self, fh):
        fh.write(f"kappa: {_fmt(self.kappa)}\n")

    def _read_params(self, tags):
        self.kappa = float(tags["kappa:"][0])


class F81(SubModel):
    """Felsenstein 1981 (reference src/F81.h)."""

    name = "F81"

    def __init__(self, pi=None):
        self._pi = np.asarray(pi, dtype=np.float64) if pi is not None \
            else np.full(4, 0.25)

    @property
    def pi(self):
        return self._pi

    @property
    def beta(self):
        return 1.0 / (1.0 - float(self._pi @ self._pi))

    def Pr_batch(self, v):
        np_ = _np_of(v)
        v = np_.asarray(v)[..., None, None]
        e = np_.exp(-self.beta * v)
        eye = np_.eye(4)
        pi = np_.asarray(self._pi)[None, :]
        return eye * e + pi * (1 - e)

    def sub_dist(self, D, N):
        if N == 0:
            return 0.0
        p = (D.sum() - np.trace(D)) / N
        E = 1 - float(self._pi @ self._pi)
        return -E * math.log(1 - p / E)

    def train(self, Pv, f):
        self._pi = f / f.sum()

    def _write_params(self, fh):
        fh.write("pi: " + " ".join(_fmt(x) for x in self._pi) + "\n")
        fh.write(f"beta: {_fmt(self.beta)}\n")

    def _read_params(self, tags):
        self._pi = np.array([float(x) for x in tags["pi:"]])


class HKY85(SubModel):
    """Hasegawa-Kishino-Yano 1985 (reference src/HKY85.h)."""

    name = "HKY85"

    def __init__(self, pi=None, kappa: float = 1.0):
        self._pi = np.asarray(pi, dtype=np.float64) if pi is not None \
            else np.full(4, 0.25)
        self.kappa = kappa

    @property
    def pi(self):
        return self._pi

    @property
    def beta(self):
        a, c, g, t = self._pi
        return 1.0 / (2 * (a + g) * (c + t) + 2 * self.kappa * (a * g + c * t))

    def Pr_batch(self, v):
        return _tn93_pr(self._pi, self.kappa, self.kappa, self.beta, v)

    def sub_dist(self, D, N):
        if N == 0:
            return 0.0
        a, c, g, t = self._pi
        A_ = a * g / (a + g) + c * t / (c + t)
        B_ = a * g + c * t
        C_ = (a + g) * (c + t)
        p = (D[A, G] + D[G, A] + D[C, T] + D[T, C]) / N
        q = _tv_sum(D) / N
        return -2 * A_ * math.log(1 - p / (2 * A_) - (A_ - B_) * q / (2 * A_ * C_))

    def train(self, Pv, f):
        self._pi = f / f.sum()
        ti = tv = 0.0
        for P in Pv:
            P = (P + P.T) / 2
            n = P.sum()
            if n == 0:
                continue
            ti += (P[A, G] + P[G, A] + P[C, T] + P[T, C]) / n
            tv += _tv_sum(P) / n
        self.kappa = 2.0 * ti / tv if tv > 0 else 1.0

    def _write_params(self, fh):
        fh.write("pi: " + " ".join(_fmt(x) for x in self._pi) + "\n")
        fh.write(f"kappa: {_fmt(self.kappa)} beta: {_fmt(self.beta)}\n")

    def _read_params(self, tags):
        self._pi = np.array([float(x) for x in tags["pi:"]])
        self.kappa = float(tags["kappa:"][0])


class TN93(SubModel):
    """Tamura-Nei 1993 (reference src/TN93.h)."""

    name = "TN93"

    def __init__(self, pi=None, kr: float = 1.0, ky: float = 1.0):
        self._pi = np.asarray(pi, dtype=np.float64) if pi is not None \
            else np.full(4, 0.25)
        self.kr = kr
        self.ky = ky

    @property
    def pi(self):
        return self._pi

    @property
    def beta(self):
        a, c, g, t = self._pi
        return 1.0 / (2 * (a * c + a * t + c * g + g * t
                           + self.kr * a * g + self.ky * c * t))

    def Pr_batch(self, v):
        return _tn93_pr(self._pi, self.kr, self.ky, self.beta, v)

    def sub_dist(self, D, N):
        if N == 0:
            return 0.0
        a, c, g, t = self._pi
        r, y = a + g, c + t
        pr = (D[A, G] + D[G, A]) / N
        py = (D[C, T] + D[T, C]) / N
        q = _tv_sum(D) / N
        return (-2 * a * g / r * math.log(1 - r / (2 * a * g) * pr - q / (2 * r))
                - 2 * g * c / y * math.log(1 - y / (2 * t * c) * py - q / (2 * y))
                - 2 * (r * y - a * g * y / r - t * c * r / y)
                * math.log(1 - q / (2 * r * y)))

    def train(self, Pv, f):
        self._pi = f / f.sum()
        tir = tiy = tv = 0.0
        for P in Pv:
            P = (P + P.T) / 2
            n = P.sum()
            if n == 0:
                continue
            tir += (P[A, G] + P[G, A]) / n
            tiy += (P[C, T] + P[T, C]) / n
            tv += _tv_sum(P) / n
        if tv > 0:
            self.kr = 4.0 * tir / tv
            self.ky = 4.0 * tiy / tv

    def _write_params(self, fh):
        fh.write("pi: " + " ".join(_fmt(x) for x in self._pi) + "\n")
        fh.write(f"kr: {_fmt(self.kr)} ky: {_fmt(self.ky)} "
                 f"beta: {_fmt(self.beta)}\n")

    def _read_params(self, tags):
        self._pi = np.array([float(x) for x in tags["pi:"]])
        self.kr = float(tags["kr:"][0])
        self.ky = float(tags["ky:"][0])


class GTR(SubModel):
    """General time-reversible (reference src/GTR.{h,cpp}).

    P(v) = U exp(diag(lambda) v) U^-1 with the eigendecomposition of the
    scaled rate matrix Q cached at parameter-set time — on device this is
    three [4,4] matmuls per branch length, batched over candidates.
    """

    name = "GTR"

    def __init__(self, pi=None, R=None):
        self._pi = np.asarray(pi, dtype=np.float64) if pi is not None \
            else np.full(4, 0.25)
        self.R = np.asarray(R, dtype=np.float64) if R is not None \
            else np.ones((4, 4)) - np.eye(4)
        self._set_q_from_params()

    @property
    def pi(self):
        return self._pi

    def _set_q_from_params(self):
        # reference GTR.cpp:124-145.  NOTE the reference's
        # `Q = scale(Q)` (GTR.cpp:131) uses scale's DEFAULT pi=ones
        # (DNASubModel.h:154), i.e. it normalizes by -trace(Q), NOT the
        # textbook pi-weighted unit-substitution rate the other models'
        # closed forms use.  The shipped gg_97 DB and every reference
        # binary are consistent in that convention, so matching it is
        # required for cross-loading parity (this scaled GTR Pr(t) by
        # ~3.9x before round 5 — found by the reference-binary
        # estimate-loglik dump, PARITY.md "reference-binary parity").
        Q = self.R * self._pi[None, :]
        np.fill_diagonal(Q, 0.0)
        np.fill_diagonal(Q, -Q.sum(axis=1))
        Q = self.scale_q(Q, np.ones(4))
        self.Q = Q
        # reversible Q is similar to the symmetric B = D^1/2 Q D^-1/2
        # (D = diag(pi)); eigh gives orthogonal eigenvectors, which keeps
        # P(t) accurate in float32 on device (the reference uses a plain
        # non-symmetric EigenSolver, GTR.cpp:134-145 — same math, worse
        # conditioning)
        d = np.sqrt(self._pi)
        B = (Q * d[:, None]) / d[None, :]
        lam, V = np.linalg.eigh((B + B.T) / 2.0)
        self.lam = lam
        self.U = V / d[:, None]
        self.U_1 = V.T * d[None, :]

    def Pr_batch(self, v):
        np_ = _np_of(v)
        v = np_.asarray(v)[..., None]
        lam = np_.asarray(self.lam)
        U = np_.asarray(self.U)
        U_1 = np_.asarray(self.U_1)
        e = np_.exp(lam * v)                    # [..., 4]
        prod = U[..., :, :] * e[..., None, :]
        if np_ is np:
            out = prod @ U_1
        else:
            # TPU matmul defaults to bf16 passes; the 4x4 reconstruction
            # needs full f32 accumulation to keep P(t) rows stochastic
            out = np_.matmul(prod, U_1, precision="highest")
        # clamp tiny negative round-off so downstream logs stay finite
        # (reference returns exact identity at v == 0, GTR.h:116-121)
        return np_.maximum(out, 0.0)

    def sub_dist(self, D, N):
        # reference GTR.cpp:147-168
        if N == 0:
            return 0.0
        F = D / N
        Fnorm = (F + F.T) / 2
        P = np.diag(self._pi) @ Fnorm
        P = P / P.sum(axis=1, keepdims=True)
        lam, U = np.linalg.eig(P)
        U_1 = np.linalg.inv(U)
        return float(-np.trace((U * np.log(lam)[None, :]) @ U_1).real)

    def train(self, Pv, f):
        # reference GTR.cpp:92-122
        self._pi = f / f.sum()
        Q = np.zeros((4, 4))
        n = 0
        for P in Pv:
            Qv = self.constrained_q_from_p(P)
            if self.is_valid_rate(Qv):
                n += 1
                # reference GTR.cpp:105 `Q += scale(Qv)` — default
                # pi=ones, i.e. trace normalization (see
                # _set_q_from_params)
                Q += self.scale_q(Qv, np.ones(4))
        Q /= max(n, 1)
        R = Q / self._pi[None, :]
        np.fill_diagonal(R, 0.0)
        R = (R + R.T) / 2.0
        self.R = R
        self._set_q_from_params()

    def _write_params(self, fh):
        fh.write("pi: " + " ".join(_fmt(x) for x in self._pi) + "\n")
        fh.write("R:\n")
        for i in range(4):
            fh.write(" ".join(_fmt(x) for x in self.R[i]) + "\n")
        fh.write("Q:\n")
        for i in range(4):
            fh.write(" ".join(_fmt(x) for x in self.Q[i]) + "\n")

    def _read_params(self, tags):
        self._pi = np.array([float(x) for x in tags["pi:"]])
        vals = [float(x) for x in tags["R:"]]
        self.R = np.array(vals).reshape(4, 4)
        self._set_q_from_params()


# --- shared closed-form helpers ------------------------------------------

def _np_of(v):
    """Return jnp if v is a jax array, else numpy (keeps host path f64)."""
    mod = type(v).__module__
    if mod.startswith("jax"):
        import jax.numpy as jnp
        return jnp
    return np


def _ti_mask(np_):
    m = np_.zeros((4, 4))
    if np_ is np:
        m[A, G] = m[G, A] = m[C, T] = m[T, C] = 1.0
        return m
    return np_.asarray(_TI_MASK_NP)


_TI_MASK_NP = np.zeros((4, 4))
_TI_MASK_NP[A, G] = _TI_MASK_NP[G, A] = _TI_MASK_NP[C, T] = _TI_MASK_NP[T, C] = 1.0


def _tv_sum(D):
    return (D[A, C] + D[A, T] + D[C, A] + D[C, G]
            + D[G, C] + D[G, T] + D[T, A] + D[T, G])


def _tn93_pr(pi, kr, ky, beta, v):
    """TN93/HKY85 closed-form P(v), vectorized over v
    (reference TN93.h:113-155); negative Ti entries clamped to 0."""
    np_ = _np_of(v)
    v = np_.asarray(v)
    a, c, g, t = [float(x) for x in pi]
    e = np_.exp(-beta * v)
    eR = np_.exp(-(1 + (a + g) * (kr - 1)) * beta * v)
    eY = np_.exp(-(1 + (c + t) * (ky - 1)) * beta * v)

    r, y = a + g, c + t
    selfA = (a * (r + y * e) + g * eR) / r
    selfC = (c * (y + r * e) + t * eY) / y
    selfG = (g * (r + y * e) + a * eR) / r
    selfT = (t * (y + r * e) + c * eY) / y
    tiAG = np_.maximum((g * (r + y * e) - g * eR) / r, 0.0)
    tiCT = np_.maximum((t * (y + r * e) - t * eY) / y, 0.0)
    tiGA = np_.maximum((a * (r + y * e) - a * eR) / r, 0.0)
    tiTC = np_.maximum((c * (y + r * e) - c * eY) / y, 0.0)
    tvA = a * (1 - e)
    tvC = c * (1 - e)
    tvG = g * (1 - e)
    tvT = t * (1 - e)

    row0 = np_.stack([selfA, tvC, tiAG, tvT], axis=-1)
    row1 = np_.stack([tvA, selfC, tvG, tiCT], axis=-1)
    row2 = np_.stack([tiGA, tvC, selfG, tvT], axis=-1)
    row3 = np_.stack([tvA, tiTC, tvG, selfT], axis=-1)
    return np_.stack([row0, row1, row2, row3], axis=-2)


_MODELS = {m.name: m for m in (JC69, K80, F81, HKY85, TN93, GTR)}


def create_model(name: str) -> SubModel:
    """Factory by type string (reference DNASubModelFactory.h:40-44)."""
    try:
        return _MODELS[name]()
    except KeyError:
        raise ValueError(f"unknown DNA substitution model type: {name}")


def load_model(path_or_stream) -> SubModel:
    """Parse a .sm model file (reference GTR::read etc.)."""
    if isinstance(path_or_stream, (str, os.PathLike)):
        with open(path_or_stream) as fh:
            text = fh.read()
    else:
        text = path_or_stream.read()
    # tokenize as tag: values, handling multi-line matrix sections
    model_type = None
    tags: dict[str, list[str]] = {}
    cur: str | None = None
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        i = 0
        while i < len(toks):
            tok = toks[i]
            if tok.endswith(":"):
                cur = tok
                tags[cur] = []
                if cur == "Type:":
                    model_type = toks[i + 1]
                    i += 1
                    cur = None
            elif cur is not None:
                tags[cur].append(tok)
            i += 1
    if model_type is None:
        raise ValueError("missing 'Type:' in substitution model input")
    model = create_model(model_type)
    model._read_params(tags)
    return model


def save_model(model: SubModel, path_or_stream):
    if isinstance(path_or_stream, (str, os.PathLike)):
        with open(path_or_stream, "w") as fh:
            model.write(fh)
    else:
        model.write(path_or_stream)


def eig_tensors(model: SubModel):
    """(U, U_1, lam) spectral form of ANY reference model.

    Every reference substitution model (src/JC69.h .. src/GTR.h) is
    time-reversible, so P(v) = U exp(diag(lam) v) U^-1 exists with a
    well-conditioned symmetric eigendecomposition (same construction
    as GTR._set_q_from_params).  Used by the fused device placement
    kernel, which evaluates all models through the one spectral path
    instead of per-model closed forms.
    """
    if isinstance(model, GTR):
        return model.U, model.U_1, model.lam
    pi = np.asarray(model.pi, dtype=np.float64)
    R = np.ones((4, 4)) - np.eye(4)
    if isinstance(model, K80) or isinstance(model, HKY85):
        k = model.kappa
        R[A, G] = R[G, A] = R[C, T] = R[T, C] = k
    elif isinstance(model, TN93):
        R[A, G] = R[G, A] = model.kr
        R[C, T] = R[T, C] = model.ky
    if isinstance(model, K80):
        # the reference K80 closed form (K80.h) is parametrized with
        # raw rates beta (transversion) / kappa*beta (transition),
        # beta = 1/(2 kappa) — NOT unit-substitution scaled and with
        # no pi factor
        Q = R * model.beta
        np.fill_diagonal(Q, 0.0)
        np.fill_diagonal(Q, -Q.sum(axis=1))
    else:
        Q = R * pi[None, :]
        np.fill_diagonal(Q, 0.0)
        np.fill_diagonal(Q, -Q.sum(axis=1))
        Q = SubModel.scale_q(Q, pi)
    d = np.sqrt(pi)
    B = (Q * d[:, None]) / d[None, :]
    lam, V = np.linalg.eigh((B + B.T) / 2.0)
    return V / d[:, None], V.T * d[None, :], lam
