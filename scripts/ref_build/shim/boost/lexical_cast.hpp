#ifndef SHIM_BOOST_LEXICAL_CAST_HPP
#define SHIM_BOOST_LEXICAL_CAST_HPP
#include <sstream>
#include <stdexcept>
#include <string>
namespace boost {
struct bad_lexical_cast : std::runtime_error {
    bad_lexical_cast() : std::runtime_error("bad lexical cast") {}
};
template <typename Target, typename Source>
Target lexical_cast(const Source& s) {
    std::stringstream ss;
    ss.precision(17);
    Target t;
    if (!(ss << s) || !(ss >> t) || !(ss >> std::ws).eof())
        throw bad_lexical_cast();
    return t;
}
template <typename Source>
std::string lexical_cast_str(const Source& s) {
    std::ostringstream ss;
    ss << s;
    return ss.str();
}
template <>
inline std::string lexical_cast<std::string, int>(const int& s)
{ return lexical_cast_str(s); }
template <>
inline std::string lexical_cast<std::string, long>(const long& s)
{ return lexical_cast_str(s); }
template <>
inline std::string lexical_cast<std::string, unsigned>(const unsigned& s)
{ return lexical_cast_str(s); }
template <>
inline std::string lexical_cast<std::string, unsigned long>(
    const unsigned long& s)
{ return lexical_cast_str(s); }
template <>
inline std::string lexical_cast<std::string, double>(const double& s)
{ return lexical_cast_str(s); }
template <>
inline std::string lexical_cast<std::string, std::string>(
    const std::string& s)
{ return s; }
}
#endif
