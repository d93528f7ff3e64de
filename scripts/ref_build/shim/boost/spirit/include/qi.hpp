// DECLARATION-ONLY Spirit/Phoenix stub.
//
// NewickTree.h defines a qi grammar as a class template; the only
// instantiation lives in NewickTree.cpp, which this benchmark build
// replaces with newick_stub.cpp (the assigner never parses Newick
// text — it loads the binary .ptu).  A template definition only needs
// its non-dependent names DECLARED, so one operator-rich `expr` type
// and a handful of placeholder objects are enough to parse the
// grammar without any of Spirit existing.  Nothing here is ever
// linked or executed.
#ifndef SHIM_BOOST_SPIRIT_QI_HPP
#define SHIM_BOOST_SPIRIT_QI_HPP
#include <iostream>

namespace boost {
namespace spirit {
namespace shim {

struct expr {
    template <class T> expr operator[](const T&) const;
    template <class T> expr operator-(const T&) const;
    template <class T> expr operator+(const T&) const;
    template <class T> expr operator>>(const T&) const;
    template <class T> expr operator>(const T&) const;
    template <class T> expr operator%(const T&) const;
    template <class T> expr operator|(const T&) const;
    template <class T> expr operator=(const T&);
    template <class T> expr operator<<(const T&) const;
    expr operator<<(std::ostream& (*)(std::ostream&)) const;
    expr operator+() const;
    expr operator-() const;
    void name(const char*);
};
expr operator>(char, const expr&);
expr operator>>(char, const expr&);
expr operator-(char, const expr&);
expr operator<<(std::ostream&, const expr&);

}  // namespace shim

namespace qi {
using spirit::shim::expr;
template <class Iterator, class Sig> struct grammar;
template <class Iterator, class Sig> struct rule;
extern expr double_, space, lexeme, _val, _1, _2, _3, _4;
enum error_handler_result { fail, retry, accept, rethrow };
template <error_handler_result E, class A, class B>
void on_error(A&, const B&);
template <class It, class G, class Sk, class Attr>
bool phrase_parse(It&, const It&, const G&, const Sk&, Attr&);
}

namespace ascii {
using spirit::shim::expr;
extern expr char_, string, print, space;
}

}  // namespace spirit

namespace phoenix {
using spirit::shim::expr;
template <int I, class T> expr at_c(const T&);
template <class A, class B> expr push_back(A, B);
template <class T, class... A> expr construct(const A&...);
template <class T> expr val(const T&);
}

namespace fusion {}

}  // namespace boost
#endif
