"""Yang (1994) discrete-Gamma rate heterogeneity model.

reference: src/DiscreteGammaModel.{h,cpp} — K equal-probability rate
categories with break points at Gamma(alpha, alpha) quantiles
(DiscreteGammaModel.cpp:40-45) and category mean rates from the
regularized incomplete gamma function (cpp:47-55); moment-matching shape
estimation from per-site mutation-count vectors (cpp:92-98).
"""

from __future__ import annotations

import math

import numpy as np
from scipy.special import gammainc, gammaincinv


class DiscreteGammaModel:
    def __init__(self, alpha: float = 1.0, k: int = 4):
        self.alpha = float(alpha)
        self.k = int(k)
        self._set_breaks_and_rates()

    def _set_breaks_and_rates(self):
        a = self.alpha
        k = self.k
        # quantiles of Gamma(shape=a, rate=a): x with gammainc(a, a*x) = p
        b = np.empty(k + 1)
        b[0] = 0.0
        for i in range(1, k):
            b[i] = gammaincinv(a, i / k) / a
        b[k] = math.inf
        r = np.empty(k)
        for i in range(k):
            lo = gammainc(a + 1, b[i] * a)
            hi = gammainc(a + 1, b[i + 1] * a) if b[i + 1] != math.inf else 1.0
            r[i] = hi - lo
        # NOTE: textbook Yang-1994 mean rates carry a factor K; the
        # reference omits it (DiscreteGammaModel.cpp:47-55, rates sum to 1
        # instead of averaging to 1) and we match that behavior for parity
        self.b = b
        self.r = r

    def rate(self, i: int) -> float:
        return float(self.r[i])

    @property
    def rates(self) -> np.ndarray:
        return self.r

    @staticmethod
    def estimate_shape_moment(X) -> float:
        """Moment-matching shape from per-site mutation counts
        (reference DiscreteGammaModel.cpp:92-98)."""
        X = np.asarray(X, dtype=np.float64)
        if X.shape[0] < 2:
            return math.inf
        m = X.mean()
        s = ((X - m) ** 2).sum() / (X.shape[0] - 1)
        return float(m * m / (s - m))

    def __repr__(self):
        return f"DiscreteGammaModel(alpha={self.alpha}, K={self.k})"
