"""Dirichlet density / mixture priors with text IO and ML training.

reference: src/math/DirichletDensity.{h,cpp} (posterior mean with
pseudo-counts, gradient training), src/math/DirichletMixture.{h,cpp}
(HMMER-style match-emission mixture prior: component posteriors via
log-Beta functions, EM + gradient training), and the combined HMM prior
container src/BandedHMMP7Prior.{h,cpp} (5 sub-models, text round-trip of
the shipped data/gg_97_otus.dm).

All math is vectorized numpy f64; `mean_post_p` additionally supports a
batched [K, M] input (one posterior per column) which the reference
computes column-by-column — used to estimate all HMM positions at once.
"""

from __future__ import annotations

import io
import math
import os

import numpy as np
from scipy.special import digamma, gammaln as _gammaln

DEFAULT_ETA = 0.001  # reference DirichletModel.cpp:15
DEFAULT_REL_EPS_COST = 1e-6
DEFAULT_REL_EPS_PARAMS = 1e-4

def _lbeta(alpha, axis=0):
    """log multivariate Beta over the given axis."""
    return _gammaln(alpha).sum(axis=axis) - _gammaln(alpha.sum(axis=axis))


class DirichletDensity:
    """Single Dirichlet density (reference DirichletDensity.h:20-105)."""

    def __init__(self, alpha=None, k: int = 0):
        if alpha is not None:
            self.alpha = np.asarray(alpha, dtype=np.float64)
        else:
            self.alpha = np.ones(k, dtype=np.float64)
        self.training_cost = math.nan

    @property
    def k(self) -> int:
        return self.alpha.shape[0]

    def mean_post_p(self, freq) -> np.ndarray:
        """Posterior mean; freq may be [K] or [K, M]
        (reference DirichletDensity.cpp:25-27)."""
        freq = np.asarray(freq, dtype=np.float64)
        a = self.alpha if freq.ndim == 1 else self.alpha[:, None]
        return (freq + a) / (freq.sum(axis=0) + self.alpha.sum())

    def lpdf(self, freq) -> float:
        freq = np.asarray(freq, dtype=np.float64)
        # alpha components may be 0 during ML training (gammaln(0)=inf,
        # inf-inf=nan); the nan cost is the intended signal (train_ml
        # aborts on it) — silence only these expected warnings
        with np.errstate(invalid="ignore", divide="ignore"):
            log_c = (_gammaln(freq.sum() + 1) + _gammaln(self.alpha.sum())
                     - _gammaln(freq.sum() + self.alpha.sum()))
            log_s = (_gammaln(freq + self.alpha) - _gammaln(freq + 1)
                     - _gammaln(self.alpha)).sum()
        return float(log_c + log_s)

    def cost(self, data) -> float:
        return float(-sum(self.lpdf(data[:, t]) for t in range(data.shape[1])))

    def _moment_init(self, data):
        data = np.array(data, dtype=np.float64)
        m = data.shape[1]
        if m < 2:
            return
        n = data.sum(axis=0).max()
        data *= n / data.sum(axis=0)
        mean = data.mean(axis=1)
        var = ((data - mean[:, None]) ** 2).sum(axis=1) / (m - 1)
        for i in range(self.k):
            a_norm = (var[i] - n * mean[i] + 1) / (mean[i] - 1 / n - var[i])
            if a_norm > 0:
                self.alpha = mean * a_norm / n
                return

    def _weight_gradient(self, data):
        # reference DirichletDensity.cpp:29-45
        a = self.alpha
        a_sum = a.sum()
        n_sum = data.sum(axis=0)                   # [M]
        m = data.shape[1]
        # digamma at 0 is -inf; a=0 lanes multiply the (possibly
        # inf/nan) gradient by 0 below — expected during training
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (digamma(data + a[:, None])
                 - digamma(n_sum + a_sum)[None, :]).sum(axis=1)
            return a * (m * (digamma(a_sum) - digamma(a)) + s)

    def train_ml(self, data, eta: float = DEFAULT_ETA, max_iter: int = 0,
                 abs_eps_cost=0.0, rel_eps_cost=DEFAULT_REL_EPS_COST,
                 abs_eps_params=0.0,
                 rel_eps_params=DEFAULT_REL_EPS_PARAMS) -> float:
        data = np.asarray(data, dtype=np.float64)
        self._moment_init(data)
        with np.errstate(divide="ignore"):   # alpha=0 -> w=-inf lane
            w = np.log(self.alpha)
        c = self.cost(data)
        it = 0
        while max_iter <= 0 or it < max_iter:
            it += 1
            c_old = c
            alpha_old = self.alpha.copy()
            w = w + eta * self._weight_gradient(data)
            self.alpha = np.exp(w)
            if (self.alpha == 0).any():
                return math.nan
            c = self.cost(data)
            delta = c_old - c
            close = np.linalg.norm(self.alpha - alpha_old) <= (
                abs_eps_params + rel_eps_params * np.linalg.norm(alpha_old))
            if close and 0 <= delta < abs_eps_cost + rel_eps_cost * c_old:
                break
            if it > 100000:  # safety net beyond reference semantics
                break
        self.training_cost = c
        return c

    # --- text IO (reference DirichletDensity print/read) ------------------
    FILE_HEADER = "Dirichlet Density Model"

    def write(self, fh):
        fh.write(self.FILE_HEADER + "\n")
        fh.write(f"Training cost: {self.training_cost:g}\n")
        fh.write(f"K: {self.k}\n")
        fh.write("alpha:\n")
        fh.write(" ".join(f"{float(v):.17g}" for v in self.alpha) + "\n")

    @classmethod
    def parse(cls, lines) -> "DirichletDensity":
        it = iter(lines)
        dd = cls(k=1)
        for line in it:
            line = line.strip()
            if line.startswith("Training cost:"):
                dd.training_cost = float(line.split(":")[1])
            elif line.startswith("K:"):
                pass
            elif line.startswith("alpha:"):
                vals = next(it).split()
                dd.alpha = np.array([float(v) for v in vals])
                break
        return dd


class DirichletMixture:
    """Mixture of Dirichlets (reference DirichletMixture.h:19-160).

    alpha is [K, L] (K categories x L components), q is [L].
    """

    def __init__(self, alpha=None, q=None, k: int = 0, l: int = 0):
        if alpha is not None:
            self.alpha = np.asarray(alpha, dtype=np.float64)
            self.q = np.asarray(q, dtype=np.float64)
        else:
            self.alpha = np.ones((k, l), dtype=np.float64)
            self.q = np.full(l, 1.0 / l if l else 0.0)
        self.training_cost = math.nan

    @property
    def k(self) -> int:
        return self.alpha.shape[0]

    @property
    def L(self) -> int:
        return self.alpha.shape[1]

    def mean_post_p(self, freq) -> np.ndarray:
        """Posterior mean under the mixture; freq [K] or [K, M]
        (reference DirichletMixture.cpp:45-62)."""
        freq = np.asarray(freq, dtype=np.float64)
        single = freq.ndim == 1
        if single:
            freq = freq[:, None]
        # logB[j, t] = lbeta(alpha_j + n_t) - lbeta(alpha_j)
        a = self.alpha[:, :, None]                      # [K, L, 1]
        n = freq[:, None, :]                            # [K, 1, M]
        log_b = _lbeta(a + n, axis=0) - _lbeta(self.alpha, axis=0)[:, None]
        log_b = log_b - log_b.max(axis=0, keepdims=True)  # [L, M]
        a_sum = self.alpha.sum(axis=0)                  # [L]
        n_sum = freq.sum(axis=0)                        # [M]
        wj = self.q[:, None] * np.exp(log_b)            # [L, M]
        post = (a + n) / (a_sum[None, :, None] + n_sum[None, None, :])
        x = (wj[None, :, :] * post).sum(axis=1)         # [K, M]
        x = x / x.sum(axis=0, keepdims=True)
        return x[:, 0] if single else x

    def comp_post_p(self, data) -> np.ndarray:
        """Component posterior probabilities [L, M]
        (reference DirichletMixture.cpp:178-198)."""
        data = np.asarray(data, dtype=np.float64)
        if data.ndim == 1:
            data = data[:, None]
        a = self.alpha[:, :, None]
        n = data[:, None, :]
        a_sum = self.alpha.sum(axis=0)
        n_sum = data.sum(axis=0)
        log_c = (_gammaln(n_sum + 1)[None, :] + _gammaln(a_sum)[:, None]
                 - _gammaln(n_sum[None, :] + a_sum[:, None]))
        log_s = (_gammaln(n + a) - _gammaln(n + 1) - _gammaln(a)).sum(axis=0)
        log_p = log_c + log_s                           # [L, M]
        p = self.q[:, None] * np.exp(log_p - log_p.max(axis=0, keepdims=True))
        return p / p.sum(axis=0, keepdims=True)

    def lpdf(self, data) -> float:
        data = np.asarray(data, dtype=np.float64)
        a_sum = self.alpha.sum(axis=0)
        n_sum = data.sum()
        log_c = _gammaln(n_sum + 1) + _gammaln(a_sum) - _gammaln(n_sum + a_sum)
        log_s = (_gammaln(data[:, None] + self.alpha) - _gammaln(data + 1)[:, None]
                 - _gammaln(self.alpha)).sum(axis=0)
        m = (log_c + log_s).max()
        return float(math.log((self.q * np.exp(log_c + log_s - m)).sum()) + m)

    def cost(self, data) -> float:
        return float(-sum(self.lpdf(data[:, t]) for t in range(data.shape[1])))

    def _moment_init(self, data, rng):
        k, m = data.shape
        if m < 2 * self.L:
            return
        data = data[:, rng.permutation(m)]
        n = data.sum(axis=0).max()
        data = data * (n / data.sum(axis=0))
        size = m // self.L
        for j in range(self.L):
            block = data[:, j * size:(j + 1) * size]
            mean = block.mean(axis=1)
            var = ((block - mean[:, None]) ** 2).sum(axis=1) / block.shape[1]
            a_norm = -1.0
            for i in range(k):
                a_norm = (var[i] - n * mean[i] + 1) / (mean[i] - 1 / n - var[i])
                if a_norm > 0:
                    break
            if a_norm > 0:
                self.alpha[:, j] = mean * a_norm / n

    def _weight_gradient(self, data):
        # reference DirichletMixture.cpp:63-90
        comp = self.comp_post_p(data)                   # [L, M]
        comp_s = comp.sum(axis=1)                       # [L]
        a = self.alpha
        a_sum = a.sum(axis=0)                           # [L]
        n_sum = data.sum(axis=0)                        # [M]
        # S[i, j] = sum_t comp[j,t] * (digamma(n_it + a_ij) - digamma(nsum_t + asum_j))
        dg = digamma(data[:, None, :] + a[:, :, None])  # [K, L, M]
        dg2 = digamma(n_sum[None, None, :] + a_sum[None, :, None])
        s = (comp[None, :, :] * (dg - dg2)).sum(axis=2)  # [K, L]
        grad = a * (comp_s[None, :] * (digamma(a_sum)[None, :] - digamma(a)) + s)
        return grad

    def train_ml(self, data, eta: float = DEFAULT_ETA, max_iter: int = 0,
                 abs_eps_cost=0.0, rel_eps_cost=DEFAULT_REL_EPS_COST,
                 abs_eps_params=0.0,
                 rel_eps_params=DEFAULT_REL_EPS_PARAMS, rng=None) -> float:
        data = np.asarray(data, dtype=np.float64)
        rng = rng or np.random.default_rng()
        self._moment_init(data, rng)
        w = np.log(self.alpha)
        c = self.cost(data)
        m = data.shape[1]
        it = 0
        while max_iter <= 0 or it < max_iter:
            it += 1
            c_old = c
            alpha_old = self.alpha.copy()
            w = w + eta * self._weight_gradient(data)
            self.alpha = np.exp(w)
            if (self.alpha == 0).any():
                return math.nan
            if self.q.min() < 1.0 / m:
                return math.nan
            c = self.cost(data)
            delta = c_old - c
            # E step
            self.q = self.comp_post_p(data).sum(axis=1) / m
            close = np.linalg.norm(self.alpha - alpha_old) <= (
                abs_eps_params + rel_eps_params * np.linalg.norm(alpha_old))
            if close and 0 <= delta < abs_eps_cost + rel_eps_cost * c_old:
                break
            if it > 100000:  # safety net
                break
        self.training_cost = c
        return c

    FILE_HEADER = "Dirichlet Mixture Model"

    def write(self, fh):
        fh.write(self.FILE_HEADER + "\n")
        fh.write(f"Training cost: {self.training_cost:g}\n")
        fh.write(f"K: {self.k} L: {self.L}\n")
        fh.write("Mixture coefficients:\n")
        fh.write(" ".join(f"{float(v):.17g}" for v in self.q) + "\n")
        fh.write("alpha:\n")
        for i in range(self.k):
            fh.write(" ".join(f"{float(v):.17g}" for v in self.alpha[i]) + "\n")

    @classmethod
    def parse(cls, lines) -> "DirichletMixture":
        it = iter(lines)
        dm = cls(k=1, l=1)
        k = l = 0
        for line in it:
            line = line.strip()
            if line.startswith("Training cost:"):
                dm.training_cost = float(line.split(":")[1])
            elif line.startswith("K:"):
                parts = line.replace("K:", "").replace("L:", "").split()
                k, l = int(parts[0]), int(parts[1])
            elif line.startswith("Mixture coefficients:"):
                dm.q = np.array([float(v) for v in next(it).split()])
            elif line.startswith("alpha:"):
                rows = [np.array([float(v) for v in next(it).split()])
                        for _ in range(k)]
                dm.alpha = np.stack(rows)
                break
        return dm


class HmmPrior:
    """The 5-model HMM prior (reference BandedHMMP7Prior.h:60-65).

    dmME: match emission mixture; dmIE: insert emission density;
    dmMT/dmIT/dmDT: match/insert/delete transition densities.
    """

    def __init__(self):
        self.dmME = DirichletMixture(k=4, l=1)
        self.dmIE = DirichletDensity(k=4)
        self.dmMT = DirichletDensity(k=3)
        self.dmIT = DirichletDensity(k=2)
        self.dmDT = DirichletDensity(k=2)

    @classmethod
    def load(cls, path_or_stream) -> "HmmPrior":
        if isinstance(path_or_stream, (str, os.PathLike)):
            with open(path_or_stream) as fh:
                text = fh.read()
        else:
            text = path_or_stream.read()
        pri = cls()
        # split into sections (reference BandedHMMP7Prior.cpp:38-60)
        sections = {
            "Match emission:": ("dmME", DirichletMixture),
            "Insert emission:": ("dmIE", DirichletDensity),
            "Match transition:": ("dmMT", DirichletDensity),
            "Insert transition:": ("dmIT", DirichletDensity),
            "Delete transition:": ("dmDT", DirichletDensity),
        }
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            for head, (attr, klass) in sections.items():
                if lines[i].startswith(head):
                    setattr(pri, attr, klass.parse(lines[i + 1:]))
                    break
            i += 1
        return pri

    def save(self, path_or_stream):
        fh = (open(path_or_stream, "w")
              if isinstance(path_or_stream, (str, os.PathLike))
              else path_or_stream)
        fh.write("Match emission:\n")
        self.dmME.write(fh)
        fh.write("Insert emission:\n")
        self.dmIE.write(fh)
        fh.write("Match transition:\n")
        self.dmMT.write(fh)
        fh.write("Insert transition:\n")
        self.dmIT.write(fh)
        fh.write("Delete transition:\n")
        self.dmDT.write(fh)
        if isinstance(path_or_stream, (str, os.PathLike)):
            fh.close()
