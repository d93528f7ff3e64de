#ifndef SHIM_BOOST_UNORDERED_MAP_HPP
#define SHIM_BOOST_UNORDERED_MAP_HPP
#include <unordered_map>
namespace boost {
using std::unordered_map;
using std::unordered_multimap;
}
#endif
