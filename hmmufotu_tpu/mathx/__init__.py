"""Numeric helpers mirroring the reference's math library (src/math/)."""

from .stats import add_scaled, p2q, q2p, relative_entropy
from .rootfinder import root_bisection
from .dirichlet import DirichletDensity, DirichletMixture, HmmPrior

__all__ = [
    "add_scaled", "p2q", "q2p", "relative_entropy", "root_bisection",
    "DirichletDensity", "DirichletMixture", "HmmPrior",
]
