#ifndef SHIM_BOOST_MATH_FACTORIALS_HPP
#define SHIM_BOOST_MATH_FACTORIALS_HPP
#include "gamma.hpp"
namespace boost {
namespace math {
inline double factorial(unsigned n) { return ::tgamma(n + 1.0); }
}
}
#endif
