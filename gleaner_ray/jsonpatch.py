"""gjson/sjson-style surgical JSON editing over raw strings.

The reference performs all JSON-LD fixups with tidwall/gjson (path reads)
and tidwall/sjson (path writes) so that *untouched* parts of a document
keep their exact original bytes (``internal/summoner/acquire/jsonutils.go``
M14-M17). We reproduce that: a position-tracking, *tolerant* JSON parser
(gjson tolerates missing / trailing commas — exercised by the reference's
own fixId test fixtures, ``jsonutils_test.go:467-527``) plus splice-based
set operations. A value replacement overwrites exactly the old value's
byte span; a missing key is appended at the end of its parent object
(sjson semantics). Replacement values are marshaled Go-style (gojson.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .gojson import marshal

__all__ = ["Node", "ParseError", "parse", "get_node", "get_value", "set_raw", "set_value"]


class ParseError(ValueError):
    pass


@dataclass
class Node:
    kind: str  # 'object' | 'array' | 'string' | 'number' | 'literal'
    start: int
    end: int  # exclusive
    value: object = None  # decoded value for scalars; None for containers
    # object: list of (key, key_start, value_node); array: list of value_node
    members: list = field(default_factory=list)
    raw: str = ""

    def as_python(self):
        if self.kind == "object":
            return {k: v.as_python() for k, _, v in self.members}
        if self.kind == "array":
            return [v.as_python() for v in self.members]
        return self.value

    def gjson_string(self) -> str:
        """gjson Result.String(): scalars -> value text, JSON -> raw bytes."""
        if self.kind == "string":
            return self.value
        if self.kind in ("object", "array"):
            return self.raw
        if self.kind == "literal":
            if self.value is None:
                return ""  # gjson Null -> "" via default case
            return "true" if self.value else "false"
        return self.raw  # number: raw text


_WS = " \t\n\r"


class _Parser:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def _ws(self):
        s, n = self.s, self.n
        i = self.i
        while i < n and s[i] in _WS:
            i += 1
        self.i = i

    def parse(self) -> Node:
        self._ws()
        node = self._value()
        return node

    def _value(self) -> Node:
        self._ws()
        if self.i >= self.n:
            raise ParseError("unexpected end of input")
        c = self.s[self.i]
        if c == "{":
            return self._object()
        if c == "[":
            return self._array()
        if c == '"':
            return self._string()
        if c in "-0123456789":
            return self._number()
        if self.s.startswith("true", self.i):
            node = Node("literal", self.i, self.i + 4, True, raw="true")
            self.i += 4
            return node
        if self.s.startswith("false", self.i):
            node = Node("literal", self.i, self.i + 5, False, raw="false")
            self.i += 5
            return node
        if self.s.startswith("null", self.i):
            node = Node("literal", self.i, self.i + 4, None, raw="null")
            self.i += 4
            return node
        raise ParseError("unexpected character %r at %d" % (c, self.i))

    def _object(self) -> Node:
        start = self.i
        self.i += 1  # consume '{'
        members = []
        while True:
            self._ws()
            if self.i >= self.n:
                raise ParseError("unterminated object")
            c = self.s[self.i]
            if c == "}":
                self.i += 1
                break
            if c == ",":  # tolerant: stray/trailing commas
                self.i += 1
                continue
            if c != '"':
                raise ParseError("expected object key at %d, got %r" % (self.i, c))
            key_start = self.i
            key_node = self._string()
            self._ws()
            if self.i < self.n and self.s[self.i] == ":":
                self.i += 1
            else:
                raise ParseError("expected ':' at %d" % self.i)
            val = self._value()
            members.append((key_node.value, key_start, val))
            # tolerant: comma optional between members
        node = Node("object", start, self.i, members=members)
        node.raw = self.s[start : self.i]
        return node

    def _array(self) -> Node:
        start = self.i
        self.i += 1
        members = []
        while True:
            self._ws()
            if self.i >= self.n:
                raise ParseError("unterminated array")
            c = self.s[self.i]
            if c == "]":
                self.i += 1
                break
            if c == ",":
                self.i += 1
                continue
            members.append(self._value())
        node = Node("array", start, self.i, members=members)
        node.raw = self.s[start : self.i]
        return node

    def _string(self) -> Node:
        # fast scan: jump between quote candidates with str.find (C speed);
        # a quote preceded by an odd number of backslashes is escaped
        s = self.s
        start = self.i
        i = start + 1
        while True:
            q = s.find('"', i)
            if q < 0:
                raise ParseError("unterminated string at %d" % start)
            b = q - 1
            while b >= 0 and s[b] == "\\":
                b -= 1
            if (q - 1 - b) % 2 == 0:
                raw = s[start : q + 1]
                body = raw[1:-1]
                value = self._decode_escapes(body) if "\\" in body else body
                self.i = q + 1
                return Node("string", start, q + 1, value, raw=raw)
            i = q + 1

    @staticmethod
    def _decode_escapes(body: str) -> str:
        out = []
        i = 0
        n = len(body)
        while i < n:
            c = body[i]
            if c != "\\":
                j = body.find("\\", i)
                if j < 0:
                    out.append(body[i:])
                    break
                out.append(body[i:j])
                i = j
                continue
            if i + 1 >= n:
                out.append(c)
                break
            e = body[i + 1]
            if e == "u" and i + 6 <= n:
                cp = int(body[i + 2 : i + 6], 16)
                if 0xD800 <= cp <= 0xDBFF and body[i + 6 : i + 8] == "\\u":
                    lo = int(body[i + 8 : i + 12], 16)
                    if 0xDC00 <= lo <= 0xDFFF:
                        out.append(chr(0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)))
                        i += 12
                        continue
                out.append(chr(cp))
                i += 6
                continue
            out.append({"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "/": "/", "\\": "\\", '"': '"'}.get(e, e))
            i += 2
        return "".join(out)

    def _number(self) -> Node:
        s = self.s
        start = self.i
        i = self.i
        while i < self.n and s[i] in "-+.eE0123456789":
            i += 1
        raw = s[start:i]
        try:
            val = int(raw)
        except ValueError:
            val = float(raw)
        self.i = i
        return Node("number", start, i, val, raw=raw)


def parse(s: str) -> Node:
    return _Parser(s).parse()


def _descend(root: Node, parts: list) -> Node | None:
    node = root
    for p in parts:
        if node.kind == "object":
            nxt = None
            for k, _, v in node.members:
                if k == p:
                    nxt = v
                    break
            if nxt is None:
                return None
            node = nxt
        elif node.kind == "array":
            try:
                idx = int(p)
            except (TypeError, ValueError):
                return None
            if idx < 0 or idx >= len(node.members):
                return None
            node = node.members[idx]
        else:
            return None
    return node


def get_node(s: str, parts: list, root: Node | None = None) -> Node | None:
    """Node at path (list of keys / int indices), or None."""
    if root is None:
        try:
            root = parse(s)
        except ParseError:
            return None
    return _descend(root, parts)


def get_value(s: str, parts: list):
    node = get_node(s, parts)
    return None if node is None else node.as_python()


def set_raw(s: str, parts: list, raw_value: str) -> str:
    """sjson.SetRaw: replace the value at path with ``raw_value`` bytes.

    Existing path -> splice over the old value's span (surrounding bytes
    untouched). Missing final key -> append ``,"key":value`` before the
    parent object's closing brace (sjson's append-at-end semantics;
    intermediate containers must already exist for our call sites).
    """
    root = parse(s)
    node = _descend(root, parts)
    if node is not None:
        return s[: node.start] + raw_value + s[node.end :]
    if not parts:
        return raw_value
    # walk to the deepest existing ancestor; build nested objects for the
    # missing remainder (sjson creates intermediate objects on set)
    depth = len(parts) - 1
    while depth > 0 and _descend(root, parts[:depth]) is None:
        depth -= 1
    anchor = _descend(root, parts[:depth]) if depth else root
    missing = parts[depth:]
    raw = raw_value
    for p in reversed(missing[1:]):
        raw = "{" + marshal(str(p)) + ":" + raw + "}"
    key = marshal(str(missing[0]))
    if anchor is None or anchor.kind != "object":
        if anchor is root:
            raise ParseError("cannot create path %r on non-object root" % (parts,))
        # replace the non-object value wholesale (sjson semantics)
        return s[: anchor.start] + "{" + key + ":" + raw + "}" + s[anchor.end :]
    close = anchor.end - 1  # index of '}'
    insert = ("," if anchor.members else "") + key + ":" + raw
    return s[:close] + insert + s[close:]


def set_value(s: str, parts: list, value) -> str:
    """sjson.Set: marshal ``value`` Go-style, then splice (see set_raw)."""
    return set_raw(s, parts, marshal(value))
