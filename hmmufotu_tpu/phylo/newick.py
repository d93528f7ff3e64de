"""Newick tree parser/writer.

reference: src/NewickTree.h:37-116 + Boost.Spirit grammar (:149-220).
Supports quoted labels ('...' with embedded escaping), internal node
labels, branch lengths, and arbitrary polytomies.  Implemented as an
iterative recursive-descent parser (no recursion limits on big trees).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NewickNode:
    name: str = ""
    length: float = 0.0
    children: list["NewickNode"] = field(default_factory=list)

    def add_child(self, child: "NewickNode"):
        self.children.append(child)

    def is_leaf(self) -> bool:
        return not self.children

    def __iter__(self):
        """Pre-order iteration."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def num_nodes(self) -> int:
        return sum(1 for _ in self)


_WS = " \t\r\n"
# characters that terminate an unquoted label
_LABEL_END = set("(),:;[]" + _WS)


def parse_newick(text: str) -> NewickNode:
    s = text.strip()
    if s.endswith(";"):
        s = s[:-1]
    pos = 0
    n = len(s)

    def skip_ws(p):
        while p < n and s[p] in _WS:
            p += 1
        return p

    def parse_label(p):
        p = skip_ws(p)
        if p < n and s[p] == "'":
            # quoted label; '' is an escaped quote
            p += 1
            out = []
            while p < n:
                if s[p] == "'":
                    if p + 1 < n and s[p + 1] == "'":
                        out.append("'")
                        p += 2
                    else:
                        p += 1
                        break
                else:
                    out.append(s[p])
                    p += 1
            return "".join(out), p
        start = p
        while p < n and s[p] not in _LABEL_END:
            p += 1
        return s[start:p], p

    # iterative parse with an explicit stack of open clades
    root = NewickNode()
    stack = [root]
    pos = skip_ws(pos)
    expect_node = True
    while pos < n:
        ch = s[pos]
        if ch == "(":
            node = stack[-1]
            child = NewickNode()
            node.add_child(child)
            stack.append(child)
            pos = skip_ws(pos + 1)
            expect_node = True
        elif ch == ",":
            stack.pop()
            parent = stack[-1]
            child = NewickNode()
            parent.add_child(child)
            stack.append(child)
            pos = skip_ws(pos + 1)
            expect_node = True
        elif ch == ")":
            stack.pop()
            pos = skip_ws(pos + 1)
            # label / length attach to the clade node now on top
            name, pos = parse_label(pos)
            stack[-1].name = name
            pos = skip_ws(pos)
            if pos < n and s[pos] == ":":
                tok, pos = parse_label(skip_ws(pos + 1))
                stack[-1].length = float(tok)
            expect_node = False
        else:
            name, pos = parse_label(pos)
            stack[-1].name = name
            pos = skip_ws(pos)
            if pos < n and s[pos] == ":":
                tok, pos = parse_label(skip_ws(pos + 1))
                stack[-1].length = float(tok)
            expect_node = False
        pos = skip_ws(pos)

    # the artificial wrapper: root was pushed with no parent; if root has a
    # single child holding everything, unwrap it
    if len(root.children) == 1 and not root.name:
        top = root.children[0]
        return top
    return root


def _quote_if_needed(name: str) -> str:
    if name and any(c in _LABEL_END or c == "'" for c in name):
        return "'" + name.replace("'", "''") + "'"
    return name


def write_newick(node: NewickNode, with_length: bool = True,
                 _root: bool = True) -> str:
    parts = []
    if node.children:
        inner = ",".join(write_newick(c, with_length, False)
                         for c in node.children)
        parts.append(f"({inner})")
    parts.append(_quote_if_needed(node.name))
    if with_length and not _root:
        parts.append(f":{node.length:g}")
    out = "".join(parts)
    return out + ";" if _root else out
