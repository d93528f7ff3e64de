#ifndef SHIM_BOOST_UNORDERED_SET_HPP
#define SHIM_BOOST_UNORDERED_SET_HPP
#include <unordered_set>
namespace boost {
using std::unordered_set;
using std::unordered_multiset;
}
#endif
