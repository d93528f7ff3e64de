#ifndef SHIM_BOOST_MAKE_SHARED_HPP
#define SHIM_BOOST_MAKE_SHARED_HPP
#include <memory>
namespace boost {
using std::make_shared;
}
#endif
