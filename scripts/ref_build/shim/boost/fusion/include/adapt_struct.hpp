// stub: adaptation metadata is only consumed by real Spirit,
// which the shim build never instantiates (see spirit/include/qi.hpp)
#ifndef SHIM_BOOST_FUSION_ADAPT_STRUCT_HPP
#define SHIM_BOOST_FUSION_ADAPT_STRUCT_HPP
#define BOOST_FUSION_ADAPT_STRUCT(...)
#endif
