"""Scalar stats helpers (reference: src/math/Stats.h:225-247,
src/math/LinearAlgebraBasic.h:90-98)."""

from __future__ import annotations

import math

import numpy as np

NAT2BIT = 1.0 / math.log(2.0)


def add_scaled(log_a: float, log_b: float) -> float:
    """log(exp(a) + exp(b)) with underflow-safe scaling."""
    scale = max(log_a, log_b)
    if scale == -math.inf:
        return -math.inf
    return math.log(math.exp(log_a - scale) + math.exp(log_b - scale)) + scale


def p2q(p: float, b: float = 10.0) -> float:
    """Phred-style quality from p-value."""
    if p <= 0:
        return math.inf
    return -b * math.log(p) / math.log(b)


def q2p(q: float, b: float = 10.0) -> float:
    return math.exp(-q / b * math.log(b))


def relative_entropy(p, q) -> float:
    """KL divergence in BITS (reference returns NAT2BIT * nats)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    mask = p > 0
    return float(NAT2BIT * np.sum(p[mask] * np.log(p[mask] / q[mask])))
