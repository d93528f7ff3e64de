"""Bisection root finding (reference: src/math/RootFinder.{h,cpp}).

Used to tune the HMM effective sequence number to the target mean
relative entropy (reference BandedHMMP7.cpp:483-490).
"""

from __future__ import annotations

import math

DEFAULT_ABS_EPS = 1e-10
DEFAULT_REL_EPS = 1e-10
DEFAULT_RES_EPS = 0.0


def root_bisection(f, xl: float, xr: float,
                   abs_eps: float = DEFAULT_ABS_EPS,
                   rel_eps: float = DEFAULT_REL_EPS,
                   res_eps: float = DEFAULT_RES_EPS,
                   max_iter: int = 0) -> float:
    """Find a root of f in [xl, xr]; returns nan if not bracketed.

    Follows reference RootFinder::rootBisection (RootFinder.cpp:22-70)
    including its convergence test so effN tuning matches.
    """
    fxl = f(xl)
    fxr = f(xr)
    if fxl * fxr >= 0:
        return math.nan

    it = 0
    x = xl
    while max_iter == 0 or it < max_iter:
        it += 1
        x = (xl + xr) / 2.0
        fx = f(x)
        if fx == 0:
            break
        xmag = 0.0 if (xl < 0 < xr) else x
        if xr - xl < abs_eps + rel_eps * abs(xmag) or abs(fx) < res_eps:
            break
        if fxl > 0:
            if fx > 0:
                xl, fxl = x, fx
            else:
                xr, fxr = x, fx
        else:
            if fx < 0:
                xl, fxl = x, fx
            else:
                xr, fxr = x, fx
    return x
