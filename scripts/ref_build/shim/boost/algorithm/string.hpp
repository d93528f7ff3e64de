// Minimal boost::split/join/is_any_of shim (see ../shared_ptr.hpp).
#ifndef SHIM_BOOST_ALGO_STRING_HPP
#define SHIM_BOOST_ALGO_STRING_HPP
#include <string>
#include <vector>
namespace boost {

struct any_of_pred {
    std::string chars;
    bool operator()(char c) const {
        return chars.find(c) != std::string::npos;
    }
};
inline any_of_pred is_any_of(const std::string& chars) {
    return any_of_pred{chars};
}

enum token_compress_mode_type { token_compress_off, token_compress_on };

template <typename Seq, typename Pred>
Seq& split(Seq& result, const std::string& input, Pred pred,
           token_compress_mode_type compress = token_compress_off) {
    // boost semantics: token_compress_on merges RUNS of separators
    // into one boundary; edge separators still yield empty edge tokens
    result.clear();
    std::string cur;
    bool last_was_sep = false;
    for (char c : input) {
        if (pred(c)) {
            if (compress == token_compress_off || !last_was_sep)
                result.push_back(cur);
            cur.clear();
            last_was_sep = true;
        } else {
            cur += c;
            last_was_sep = false;
        }
    }
    result.push_back(cur);
    return result;
}

template <typename Seq>
std::string join(const Seq& parts, const std::string& sep) {
    std::string out;
    bool first = true;
    for (const auto& p : parts) {
        if (!first) out += sep;
        out += p;
        first = false;
    }
    return out;
}

}
#endif
