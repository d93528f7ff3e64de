#ifndef SHIM_BOOST_RANDOM_DISCRETE_HPP
#define SHIM_BOOST_RANDOM_DISCRETE_HPP
#include <random>
namespace boost {
namespace random {
template <typename IntType = int, typename WeightType = double>
using discrete_distribution = std::discrete_distribution<IntType>;
}
}
#endif
