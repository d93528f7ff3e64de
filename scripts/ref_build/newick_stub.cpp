// Stand-in for reference NewickTree.cpp in the benchmark build: the
// assigner (`hmmufotu`) loads the binary .ptu and never parses Newick
// text, but the library references these symbols.  read() aborts if
// ever reached; write() mirrors the reference recursion (not on the
// timed assign path).
#include <cstdlib>
#include <iostream>
#include <string>

#include "StringUtils.h"
#include "NewickTree.h"

namespace EGriceLab {
namespace HmmUFOtu {

using std::istream;
using std::ostream;
using std::string;

const string& NewickTree::INVALID_CHARS = "()[]':;,";

istream& NewickTree::read(istream& in) {
    std::cerr << "newick_stub: Newick text parsing not available in "
                 "the shim benchmark build" << std::endl;
    std::abort();
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
