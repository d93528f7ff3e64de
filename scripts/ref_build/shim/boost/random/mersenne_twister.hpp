// shim: mt11213b -> std::mt19937 (only header-level typedefs needed;
// OTUTable.cpp is not part of the benchmark link set)
#ifndef SHIM_BOOST_RANDOM_MT_HPP
#define SHIM_BOOST_RANDOM_MT_HPP
#include <random>
namespace boost {
namespace random {
typedef std::mt19937 mt11213b;
typedef std::mt19937 mt19937;
}
using random::mt11213b;
using random::mt19937;
}
#endif
