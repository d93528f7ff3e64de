#ifndef SHIM_BOOST_RANGE_RANDOM_SHUFFLE_HPP
#define SHIM_BOOST_RANGE_RANDOM_SHUFFLE_HPP
#include <algorithm>
namespace boost {
template <typename Range, typename Gen>
Range& random_shuffle(Range& r, Gen& g) {
    typedef typename Range::difference_type D;
    D n = r.end() - r.begin();
    for (D i = n - 1; i > 0; --i)
        std::iter_swap(r.begin() + i, r.begin() + g(i + 1));
    return r;
}
}
#endif
