// Working NewickTree::read for the shim benchmark build of
// `hmmufotu-build` (the only binary that parses Newick text): a
// recursive-descent parser implementing the same grammar as the
// reference's Boost.Spirit rules (NewickTree.h:195-220):
//   tree            = subtree ';'
//   subtree         = -descendant_list >> -label >> -branch_length
//   descendant_list = '(' subtree % ',' ')'
//   label           = unquoted | '\'' chars '\''
// with whitespace skipped between tokens (phrase_parse w/ qi::space).
#include <cctype>
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

#include "StringUtils.h"
#include "NewickTree.h"

namespace EGriceLab {
namespace HmmUFOtu {

using std::istream;
using std::ostream;
using std::string;

const string& NewickTree::INVALID_CHARS = "()[]':;,";

namespace {

struct Cursor {
    const string& s;
    size_t i = 0;
    explicit Cursor(const string& str) : s(str) {}
    void skip_ws() {
        while (i < s.size() && std::isspace((unsigned char)s[i])) ++i;
    }
    int peek() {
        skip_ws();
        return i < s.size() ? (unsigned char)s[i] : -1;
    }
    bool eat(char c) {
        if (peek() == c) { ++i; return true; }
        return false;
    }
};

bool is_label_char(int c) {
    return c > 0 && std::isprint(c) && !std::isspace(c)
        && string("()[]':;,").find((char)c) == string::npos;
}

bool parse_subtree(Cursor& cur, NewickTree& node);

bool parse_descendants(Cursor& cur, NewickTree& node) {
    if (!cur.eat('(')) return false;
    do {
        NewickTree child;
        if (!parse_subtree(cur, child)) return false;
        node.children.push_back(child);
    } while (cur.eat(','));
    return cur.eat(')');
}

bool parse_subtree(Cursor& cur, NewickTree& node) {
    if (cur.peek() == '(' && !parse_descendants(cur, node))
        return false;
    int c = cur.peek();
    if (c == '\'') {                       // quoted label
        ++cur.i;
        string lab;
        while (cur.i < cur.s.size() && cur.s[cur.i] != '\'')
            lab += cur.s[cur.i++];
        if (cur.i >= cur.s.size()) return false;
        ++cur.i;
        node.name = lab;
    } else if (is_label_char(c)) {         // unquoted label (lexeme)
        string lab;
        while (cur.i < cur.s.size()
               && is_label_char((unsigned char)cur.s[cur.i]))
            lab += cur.s[cur.i++];
        node.name = lab;
    }
    if (cur.eat(':')) {
        cur.skip_ws();
        char* end = nullptr;
        node.length = std::strtod(cur.s.c_str() + cur.i, &end);
        if (end == cur.s.c_str() + cur.i) return false;
        cur.i = end - cur.s.c_str();
    }
    return true;
}

}  // namespace

istream& NewickTree::read(istream& in) {
    std::stringstream buf;
    buf << in.rdbuf();
    const string text = buf.str();
    Cursor cur(text);
    clear();
    name.clear();
    length = 0;
    if (!parse_subtree(cur, *this) || !cur.eat(';')) {
        std::cerr << "newick_parse: malformed Newick input near pos "
                  << cur.i << std::endl;
        in.setstate(std::ios::failbit);
    }
    return in;
}

ostream& NewickTree::write(ostream& out) const {
    if (!children.empty()) {
        out << '(';
        for (size_t i = 0; i < children.size(); ++i) {
            if (i) out << ',';
            children[i].write(out);
        }
        out << ')';
    }
    out << quoteName(name);
    if (length >= 0) out << ':' << length;
    return out;
}

bool NewickTree::isNewickFileExt(const string& fn) {
    return StringUtils::endsWith(fn, ".tree")
        || StringUtils::endsWith(fn, ".tre");
}

}  // namespace HmmUFOtu
}  // namespace EGriceLab
