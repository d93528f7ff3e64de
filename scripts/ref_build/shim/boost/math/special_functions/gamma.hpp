// Minimal boost::math gamma-family shim: lgamma/tgamma from libm,
// regularized incomplete gamma P/Q via the standard series /
// continued-fraction pair (Abramowitz & Stegun 6.5; written fresh).
#ifndef SHIM_BOOST_MATH_GAMMA_HPP
#define SHIM_BOOST_MATH_GAMMA_HPP
#include <cmath>
#include <limits>
#include <stdexcept>
namespace boost {
namespace math {

inline double lgamma(double x) { return ::lgamma(x); }
inline double tgamma(double x) { return ::tgamma(x); }

namespace detail {

// lower regularized incomplete gamma by power series (x < a+1)
inline double gamma_p_series(double a, double x) {
    double ap = a, sum = 1.0 / a, del = sum;
    for (int i = 0; i < 500; ++i) {
        ap += 1.0;
        del *= x / ap;
        sum += del;
        if (std::fabs(del) < std::fabs(sum) * 1e-16) break;
    }
    return sum * std::exp(-x + a * std::log(x) - ::lgamma(a));
}

// upper regularized incomplete gamma by continued fraction (x >= a+1)
inline double gamma_q_cf(double a, double x) {
    const double tiny = 1e-300;
    double b = x + 1.0 - a, c = 1.0 / tiny, d = 1.0 / b, h = d;
    for (int i = 1; i < 500; ++i) {
        double an = -i * (i - a);
        b += 2.0;
        d = an * d + b;
        if (std::fabs(d) < tiny) d = tiny;
        c = b + an / c;
        if (std::fabs(c) < tiny) c = tiny;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (std::fabs(del - 1.0) < 1e-16) break;
    }
    return std::exp(-x + a * std::log(x) - ::lgamma(a)) * h;
}

}  // namespace detail

inline double gamma_p(double a, double x) {
    if (x < 0 || a <= 0) throw std::domain_error("gamma_p");
    if (x == 0) return 0.0;
    return x < a + 1.0 ? detail::gamma_p_series(a, x)
                       : 1.0 - detail::gamma_q_cf(a, x);
}

inline double gamma_q(double a, double x) {
    return 1.0 - gamma_p(a, x);
}

}
}
#endif
