"""Oracle substitution models: literal f64 transcriptions of the
reference's closed-form P(v) (JC69.h:97-101, K80.h:110-122,
F81.h:110-119, HKY85.h:111-153, TN93.h:113-155) and the GTR
eigendecomposition form (GTR.h:116-121, GTR.cpp:124-145).

Parameters are read off a production SubModel instance as plain data;
every formula here is re-derived from the reference headers, not from
hmmufotu_tpu.phylo.models.
"""

from __future__ import annotations

import math

import numpy as np

A, C, G, T = 0, 1, 2, 3


class RefModel:
    """P(v) oracle for one trained substitution model."""

    def __init__(self, kind: str, pi: np.ndarray, params: dict):
        self.kind = kind
        self.pi = np.asarray(pi, dtype=np.float64).copy()
        self.params = params
        if kind == "GTR":
            # reference GTR caches EigenSolver results of Q
            # (GTR.cpp:134-145); plain non-symmetric eig here
            Q = np.asarray(params["Q"], dtype=np.float64)
            lam, U = np.linalg.eig(Q)
            self.lam = np.real(lam)
            self.U = np.real(U)
            self.U_1 = np.linalg.inv(self.U)

    @classmethod
    def from_production(cls, model) -> "RefModel":
        kind = model.name
        pi = np.asarray(model.pi, dtype=np.float64)
        params: dict = {}
        if kind in ("K80", "HKY85"):
            params["kappa"] = float(model.kappa)
        elif kind == "TN93":
            params["kr"] = float(model.kr)
            params["ky"] = float(model.ky)
        elif kind == "GTR":
            params["Q"] = np.asarray(model.Q, dtype=np.float64)
        return cls(kind, pi, params)

    # ------------------------------------------------------------------
    def Pr(self, v: float) -> np.ndarray:
        v = float(v)
        if self.kind == "JC69":
            return self._pr_jc69(v)
        if self.kind == "K80":
            return self._pr_k80(v)
        if self.kind == "F81":
            return self._pr_f81(v)
        if self.kind == "HKY85":
            return self._pr_tn93(v, self.params["kappa"],
                                 self.params["kappa"], self._beta_hky85())
        if self.kind == "TN93":
            return self._pr_tn93(v, self.params["kr"], self.params["ky"],
                                 self._beta_tn93())
        if self.kind == "GTR":
            return self._pr_gtr(v)
        raise ValueError(f"unknown model kind {self.kind}")

    # ----- closed forms ------------------------------------------------
    @staticmethod
    def _pr_jc69(v: float) -> np.ndarray:
        # JC69.h:97-101
        off = (1 - math.exp(-4 * v / 3)) / 4
        P = np.full((4, 4), off)
        np.fill_diagonal(P, (1 + 3 * math.exp(-4 * v / 3)) / 4)
        return P

    def _pr_k80(self, v: float) -> np.ndarray:
        # K80.h:110-122; beta = 1 / (2 kappa)  (K80.h:98-100)
        kappa = self.params["kappa"]
        beta = 1.0 / (2 * kappa)
        e = math.exp(-4 * beta * v)
        eV = math.exp(-2 * (1 + kappa) * beta * v)
        P = np.empty((4, 4))
        P[:] = (1.0 - e) / 4
        np.fill_diagonal(P, (1.0 + e + 2 * eV) / 4)
        P[A, G] = P[G, A] = P[C, T] = P[T, C] = (1.0 + e - 2 * eV) / 4
        return P

    def _pr_f81(self, v: float) -> np.ndarray:
        # F81.h:110-119; beta = 1 / (1 - |pi|^2)
        pi = self.pi
        beta = 1.0 / (1.0 - float(pi @ pi))
        e = math.exp(-beta * v)
        P = np.empty((4, 4))
        for i in range(4):
            for j in range(4):
                P[i, j] = e + pi[j] * (1 - e) if i == j else pi[j] * (1 - e)
        return P

    def _beta_hky85(self) -> float:
        # HKY85.h:100-102
        pi = self.pi
        kappa = self.params["kappa"]
        return 1.0 / (2 * (pi[A] + pi[G]) * (pi[C] + pi[T])
                      + 2 * kappa * (pi[A] * pi[G] + pi[C] * pi[T]))

    def _beta_tn93(self) -> float:
        # TN93.h:99-103
        pi = self.pi
        kr, ky = self.params["kr"], self.params["ky"]
        return 1.0 / (2 * (pi[A] * pi[C] + pi[A] * pi[T] + pi[C] * pi[G]
                           + pi[G] * pi[T] + kr * (pi[A] * pi[G])
                           + ky * (pi[C] * pi[T])))

    def _pr_tn93(self, v: float, kr: float, ky: float,
                 beta: float) -> np.ndarray:
        # TN93.h:113-155 (HKY85 is the kr == ky special case)
        a, c, g, t = self.pi
        e = math.exp(-beta * v)
        eR = math.exp(-(1 + (a + g) * (kr - 1)) * beta * v)
        eY = math.exp(-(1 + (c + t) * (ky - 1)) * beta * v)
        P = np.empty((4, 4))
        P[A, A] = (a * (a + g + (c + t) * e) + g * eR) / (a + g)
        P[A, C] = c * (1 - e)
        P[A, G] = (g * (a + g + (c + t) * e) - g * eR) / (a + g)
        P[A, T] = t * (1 - e)
        P[C, A] = a * (1 - e)
        P[C, C] = (c * (c + t + (a + g) * e) + t * eY) / (c + t)
        P[C, G] = g * (1 - e)
        P[C, T] = (t * (c + t + (a + g) * e) - t * eY) / (c + t)
        P[G, A] = (a * (a + g + (c + t) * e) - a * eR) / (a + g)
        P[G, C] = c * (1 - e)
        P[G, G] = (g * (a + g + (c + t) * e) + a * eR) / (a + g)
        P[G, T] = t * (1 - e)
        P[T, A] = a * (1 - e)
        P[T, C] = (c * (c + t + (a + g) * e) - c * eY) / (c + t)
        P[T, G] = g * (1 - e)
        P[T, T] = (t * (c + t + (a + g) * e) + c * eY) / (c + t)
        # clamp the four Ti entries that can underflow below 0
        for (i, j) in ((A, G), (C, T), (G, A), (T, C)):
            if P[i, j] < 0:
                P[i, j] = 0.0
        return P

    def _pr_gtr(self, v: float) -> np.ndarray:
        # GTR.h:116-121
        if v == 0:
            return np.eye(4)
        return self.U @ np.diag(np.exp(self.lam * v)) @ self.U_1
