#ifndef SHIM_BOOST_ITERATOR_HPP
#define SHIM_BOOST_ITERATOR_HPP
#include <iterator>
#endif
