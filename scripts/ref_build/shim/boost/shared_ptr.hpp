// Minimal Boost shim for benchmarking the reference in this image
// (no Boost available; see BASELINE.md).  Maps to std::shared_ptr.
#ifndef SHIM_BOOST_SHARED_PTR_HPP
#define SHIM_BOOST_SHARED_PTR_HPP
#include <memory>
namespace boost {
using std::shared_ptr;
using std::static_pointer_cast;
using std::dynamic_pointer_cast;
using std::const_pointer_cast;
}
#endif
