// gamma_distribution + quantile via bisection on gamma_p.
#ifndef SHIM_BOOST_MATH_DIST_GAMMA_HPP
#define SHIM_BOOST_MATH_DIST_GAMMA_HPP
#include <cmath>
#include "../special_functions/gamma.hpp"
namespace boost {
namespace math {

template <typename RealType = double>
class gamma_distribution {
 public:
    explicit gamma_distribution(RealType shape, RealType scale = 1)
        : shape_(shape), scale_(scale) {}
    RealType shape() const { return shape_; }
    RealType scale() const { return scale_; }
 private:
    RealType shape_, scale_;
};

template <typename RealType>
RealType cdf(const gamma_distribution<RealType>& d, RealType x) {
    return gamma_p(d.shape(), x / d.scale());
}

template <typename RealType>
RealType quantile(const gamma_distribution<RealType>& d, RealType p) {
    if (p <= 0) return 0;
    if (p >= 1) return std::numeric_limits<RealType>::infinity();
    // bracket then bisect to ~1e-12 relative (plenty for the K<=8
    // discrete-gamma category boundaries this backs)
    double lo = 0.0, hi = d.shape() * d.scale() + 1.0;
    while (cdf(d, (RealType)hi) < p) hi *= 2;
    for (int i = 0; i < 200; ++i) {
        double mid = 0.5 * (lo + hi);
        if (cdf(d, (RealType)mid) < p) lo = mid; else hi = mid;
        if (hi - lo <= 1e-14 * hi) break;
    }
    return (RealType)(0.5 * (lo + hi));
}

}
}
#endif
