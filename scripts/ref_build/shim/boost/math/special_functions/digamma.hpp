// digamma via upward recurrence + asymptotic series (A&S 6.3.18).
#ifndef SHIM_BOOST_MATH_DIGAMMA_HPP
#define SHIM_BOOST_MATH_DIGAMMA_HPP
#include <cmath>
namespace boost {
namespace math {

inline double digamma(double x) {
    double result = 0.0;
    while (x < 6.0) {           // shift up into the asymptotic range
        result -= 1.0 / x;
        x += 1.0;
    }
    double inv = 1.0 / x, inv2 = inv * inv;
    result += std::log(x) - 0.5 * inv
        - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252
          - inv2 * (1.0 / 240 - inv2 * (1.0 / 132)))));
    return result;
}

}
}
#endif
