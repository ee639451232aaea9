"""Document identity: SHA-1 naming and JSONPath identifier extraction.

Mirrors ``/root/reference/internal/common/identifier.go``:

- ``get_sha``                (identifier.go:91-96)  hex SHA-1 of text
- ``generate_file_sha``      (identifier.go:98-112) Identifier struct
- ``get_identifier_by_path`` (identifier.go:32-52)  JSONPath -> stable-sorted strings
- ``get_identifier_by_paths``(identifier.go:73-89)  first non-empty path wins

The live pipeline always uses the json-sha identity (``jsonutils.go:332``);
the JSONPath identifiers are the same utility surface the reference tests
but does not wire into ProcessJson.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from .config import JSON_SHA

try:
    from jsonpath_ng.ext import parse as _jp_parse
except ImportError:  # pragma: no cover
    from jsonpath_ng import parse as _jp_parse

import json as _json

__all__ = [
    "Identifier",
    "get_sha",
    "generate_file_sha",
    "get_identifier_by_path",
    "get_identifier_by_paths",
    "go_sprint",
]


@dataclass
class Identifier:
    unique_id: str
    identifier_type: str = JSON_SHA
    matched_path: str = ""
    matched_string: str = ""
    json_sha: str = ""


def get_sha(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def generate_file_sha(jsonld: str) -> Identifier:
    sha = get_sha(jsonld)
    return Identifier(unique_id=sha, identifier_type=JSON_SHA, json_sha=sha)


def go_sprint(v) -> str:
    """fmt.Sprint of a parsed-JSON value (enough for identifier parity)."""
    if v is None:
        return "<nil>"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return "[" + " ".join(go_sprint(x) for x in v) + "]"
    if isinstance(v, dict):
        inner = " ".join("%s:%s" % (k, go_sprint(v[k])) for k in sorted(v))
        return "map[" + inner + "]"
    return str(v)


_PATH_CACHE: dict[str, object] = {}


def _compile(jsonpath: str):
    expr = _PATH_CACHE.get(jsonpath)
    if expr is None:
        expr = _jp_parse(_normalize_path(jsonpath))
        _PATH_CACHE[jsonpath] = expr
    return expr


def _normalize_path(p: str) -> str:
    """Adapt ojg-accepted paths to jsonpath_ng syntax."""
    p = p.strip()
    if p.startswith("@."):  # ojg tolerates '@' as root in these configs
        p = "$." + p[2:]
    if not p.startswith("$"):
        p = "$." + p if not p.startswith(".") else "$" + p
    return p


def get_identifier_by_path(jsonpath: str, jsonld: str) -> list[str]:
    """Evaluate a JSONPath, stringify each match, stable-sort the results."""
    obj = _json.loads(jsonld)
    expr = _compile(jsonpath)
    matches = [m.value for m in expr.find(obj)]
    out = [go_sprint(v) for v in matches]
    out.sort()  # sort.SliceStable with string < (identifier.go:48-50)
    return out


def get_identifier_by_paths(jsonpaths: list[str], jsonld: str) -> tuple[list[str] | str, str]:
    """Try paths in order; return (matches, matched_path); ('', '') if none."""
    for jsonpath in jsonpaths:
        try:
            obj = get_identifier_by_path(jsonpath, jsonld)
        except Exception:
            continue
        if not obj:  # fmt.Sprint(obj) == "[]" skip (identifier.go:79)
            continue
        return obj, jsonpath
    return "", ""
