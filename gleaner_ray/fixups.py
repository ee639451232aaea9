"""JSON-LD context / id fixups — byte-level parity with the reference.

Re-implements the reference's normalization chain
(``/root/reference/internal/summoner/acquire/jsonutils.go``):

- ``fix_context_string``  (M14, jsonutils.go:130-139)
- ``fix_context_array``   (M15, jsonutils.go:176-186 + 231-280)
- ``fix_context_url``     (M16, jsonutils.go:144-171)
- ``fix_id``              (M17, jsonutils.go:192-227)
- ``process_json``        (M18, jsonutils.go:299-338)
- ``is_graph_array`` / ``add_to_json_list_if_valid`` (M13, jsonutils.go:25-66)

All edits are surgical string splices (jsonpatch) so untouched bytes are
preserved exactly; replacement values are marshaled Go-style (gojson).
Known reference quirks reproduced deliberately:

- a valid top-level graph array yields its re-marshaled elements *plus*
  the original string appended (jsonutils.go:29-31);
- ``fix_context_url`` stringifies non-string context members via gjson
  ``Result.String()`` (raw JSON text) before re-setting them as strings;
- the ``len(context) < 20`` heuristic for bare schema.org URLs;
- ``@vocab`` insertion always uses the https context constant
  regardless of the per-source scheme option (jsonutils.go:148).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

from . import jsonpatch
from .config import ContextOption
from .gojson import marshal

__all__ = [
    "HTTP_CONTEXT",
    "HTTPS_CONTEXT",
    "STANDARD_HTTPS_CONTEXT",
    "STANDARD_HTTP_CONTEXT",
    "fix_context_string",
    "fix_context_array",
    "fix_context_url",
    "fix_id",
    "standardize_context",
    "get_options",
    "process_json",
]

HTTP_CONTEXT = "http://schema.org/"
HTTPS_CONTEXT = "https://schema.org/"

# jsonutils.go:231-248
STANDARD_HTTPS_CONTEXT = {
    "@vocab": "https://schema.org/",
    "adms": "https://www.w3.org/ns/adms#",
    "dcat": "https://www.w3.org/ns/dcat#",
    "dct": "https://purl.org/dc/terms/",
    "foaf": "https://xmlns.com/foaf/0.1/",
    "gsp": "https://www.opengis.net/ont/geosparql#",
    "locn": "https://www.w3.org/ns/locn#",
    "owl": "https://www.w3.org/2002/07/owl#",
    "rdf": "https://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "https://www.w3.org/2000/01/rdf-schema#",
    "schema": "https://schema.org/",
    "skos": "https://www.w3.org/2004/02/skos/core#",
    "spdx": "https://spdx.org/rdf/terms#",
    "time": "https://www.w3.org/2006/time",
    "vcard": "https://www.w3.org/2006/vcard/ns#",
    "xsd": "https://www.w3.org/2001/XMLSchema#",
}

# jsonutils.go:250-267
STANDARD_HTTP_CONTEXT = {k: v.replace("https://", "http://", 1) for k, v in STANDARD_HTTPS_CONTEXT.items()}


def fix_context_string(jsonld: str, root=None) -> str:
    """If the top-level @context is a string, wrap it as {"@vocab": s}."""
    node = jsonpatch.get_node(jsonld, ["@context"], root=root)
    if node is not None and node.kind == "string":
        return jsonpatch.set_raw(jsonld, ["@context"], marshal({"@vocab": node.value}))
    return jsonld


def fix_context_array(jsonld: str, option: ContextOption = ContextOption.HTTPS, root=None) -> str:
    """If the top-level @context is an array, replace it wholesale with the
    standardized https context map (the reference always standardizes to
    https here regardless of ``option`` — jsonutils.go:181)."""
    node = jsonpatch.get_node(jsonld, ["@context"], root=root)
    if node is not None and node.kind == "array":
        return standardize_context(jsonld, ContextOption.STANDARDIZED_HTTPS)
    return jsonld


def standardize_context(jsonld: str, option: ContextOption) -> str:
    if option is ContextOption.STANDARDIZED_HTTPS:
        return jsonpatch.set_raw(jsonld, ["@context"], marshal(STANDARD_HTTPS_CONTEXT))
    if option is ContextOption.STANDARDIZED_HTTP:
        return jsonpatch.set_raw(jsonld, ["@context"], marshal(STANDARD_HTTP_CONTEXT))
    return jsonld


def fix_context_url(jsonld: str, ctx: str = HTTPS_CONTEXT, root=None) -> str:
    """Normalize schema.org context member URLs; ensure @vocab exists."""
    node = jsonpatch.get_node(jsonld, ["@context"], root=root)
    members: list[tuple[str, object]] = []
    if node is not None and node.kind == "object":
        members = [(k, v) for k, _, v in node.members]
    has_vocab = any(k == "@vocab" for k, _ in members)
    if not has_vocab:
        # always the https constant, independent of ctx (jsonutils.go:148)
        try:
            jsonld = jsonpatch.set_raw(jsonld, ["@context", "@vocab"], marshal(HTTPS_CONTEXT))
        except jsonpatch.ParseError:
            # reference quirk: sjson.Set on a non-object root (e.g. the
            # original string a graph array appends, jsonutils.go:29-31)
            # errors and returns "" — the empty document then flows to
            # SHA/upload (ProcessJson logs and continues, jsonutils.go:322)
            return ""
    for ns, vnode in members:
        context = vnode.gjson_string()
        if "schema.org" in context:
            if "www." in context:  # fix www.schema.org
                i = context.index("schema.org")
                context = ctx + context[i:]
            if len(context) < 20:  # len("https://schema.org/") == 19
                context = ctx
        raw = marshal(context)
        if raw == vnode.raw and not_changed_since(jsonld, vnode):
            continue  # sjson.Set with identical bytes is a no-op splice
        jsonld = jsonpatch.set_raw(jsonld, ["@context", ns], raw)
    return jsonld


def not_changed_since(jsonld: str, node) -> bool:
    """A node span is still valid iff the document bytes there are
    untouched (cheap check: the raw text still sits at its span)."""
    return jsonld[node.start : node.end] == node.raw


_SCHEME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9+.\-]*:")


def _url_scheme(s: str) -> str:
    # fast path mirrors urlparse's scheme grammar (first char alpha, then
    # [a-zA-Z0-9+.-]*, terminated by ':'); bracketed-IPv6 inputs defer to
    # urlparse so its ValueError behavior (-> "") is preserved
    m = _SCHEME_RE.match(s)
    if m is None:
        return ""
    if "[" in s or "]" in s:
        try:
            return urlparse(s).scheme
        except ValueError:
            return ""
    return m.group(0)[:-1].lower()


def fix_id(jsonld: str, root=None) -> str:
    """Rewrite relative @id values to file:// URLs when no @base exists.

    Applies to top-level ``@type == "Dataset"`` (the @id itself) and
    ``@type == "ItemList"`` (every itemListElement.N.item.@id), exactly
    as jsonutils.go:192-227. Operates tolerantly on malformed JSON the
    same way gjson does (the reference's own fixtures are malformed).
    """
    if root is None:
        try:
            root = jsonpatch.parse(jsonld)
        except jsonpatch.ParseError:
            return jsonld
    base_node = jsonpatch.get_node(jsonld, ["@context", "@base"], root=root)
    if base_node is not None and base_node.gjson_string() != "":
        return jsonld
    type_node = jsonpatch.get_node(jsonld, ["@type"], root=root)
    top_type = type_node.gjson_string() if type_node is not None else ""
    if top_type == "Dataset":
        targets = [["@id"]]
    elif top_type == "ItemList":
        ile = jsonpatch.get_node(jsonld, ["itemListElement"], root=root)
        count = len(ile.members) if ile is not None and ile.kind == "array" else 0
        targets = [["itemListElement", i, "item", "@id"] for i in range(count)]
    else:
        return jsonld
    # batch all splices from the ONE parse: every target is a distinct
    # string VALUE span (disjoint, never nested), and replacing a string
    # value cannot change how any other path resolves — so applying them
    # descending is byte-identical to the reference's splice-then-reparse
    # loop, without the O(items * doc) reparse cost
    splices: list[tuple[int, int, str]] = []
    for path in targets:
        node = jsonpatch.get_node(jsonld, path, root=root)
        if node is None or node.kind != "string":
            continue
        ident = node.value
        if _url_scheme(ident) == "":  # relative URL and no @base in context
            splices.append((node.start, node.end, marshal("file://" + ident)))
    for start, end, raw in sorted(splices, key=lambda s: -s[0]):
        jsonld = jsonld[:start] + raw + jsonld[end:]
    return jsonld


def _fast_no_change(jsonld: str, ctx: str = HTTPS_CONTEXT) -> bool:
    """True only when the fixup chain provably changes nothing.

    Conservative: any escape sequence in the document, non-object
    context, missing @vocab, schema.org-rewritable member, non-string
    member (gjson stringification quirk), or potentially-relative @id
    falls back to the exact splice path. The no-escape precondition
    guarantees every string's raw bytes are '"'+value+'"', so value-level
    checks imply byte-level no-ops."""
    if "\\" in jsonld:
        return False
    import json as _json

    try:
        obj = _json.loads(jsonld)
    except ValueError:
        return False
    if not isinstance(obj, dict):
        return False
    ctx_map = obj.get("@context")
    if not isinstance(ctx_map, dict) or "@vocab" not in ctx_map:
        return False
    for v in ctx_map.values():
        if not isinstance(v, str):
            return False
        if "schema.org" in v:
            v2 = v
            if "www." in v2:
                v2 = ctx + v2[v2.index("schema.org") :]
            if len(v2) < 20:
                v2 = ctx
            if v2 != v:
                return False
    base = ctx_map.get("@base")
    if isinstance(base, str) and base != "":
        return True  # fix_id bails out early with a non-empty @base
    top_type = obj.get("@type")
    if top_type == "Dataset":
        ident = obj.get("@id")
        if ident is not None and (not isinstance(ident, str) or _url_scheme(ident) == ""):
            return False
    elif top_type == "ItemList":
        return False  # itemListElement rewrites take the exact path
    return True


def _unique_value_span(doc: str, key: str) -> tuple[int, int] | None:
    """Byte span of the value of the ONLY occurrence of ``"key"`` in a
    document with no escape sequences (so any occurrence of the quoted
    token IS that key token). None when absent, ambiguous, or malformed."""
    tok = '"%s"' % key
    i = doc.find(tok)
    if i < 0 or doc.find(tok, i + len(tok)) >= 0:
        return None
    j = i + len(tok)
    n = len(doc)
    while j < n and doc[j] in " \t\r\n":
        j += 1
    if j >= n or doc[j] != ":":
        return None
    j += 1
    while j < n and doc[j] in " \t\r\n":
        j += 1
    if j >= n:
        return None
    c = doc[j]
    if c == '"':
        k = doc.find('"', j + 1)
        return (j, k + 1) if k >= 0 else None
    if c in "[{":
        depth, k, in_str = 0, j, False
        while k < n:
            ch = doc[k]
            if in_str:
                if ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch in "[{":
                depth += 1
            elif ch in "]}":
                depth -= 1
                if depth == 0:
                    return (j, k + 1)
            k += 1
        return None
    return None  # literal values never need splicing here


def _rewrite_ctx_member(v: str, ctx: str) -> str:
    """The fix_context_url member rewrite (www + short schema.org)."""
    if "schema.org" in v:
        if "www." in v:
            v = ctx + v[v.index("schema.org") :]
        if len(v) < 20:  # len("https://schema.org/") == 19
            v = ctx
    return v


# sentinel: "no pre-parsed object supplied" (None is a legal parse result)
_UNSET = object()


def _fast_fixups(jsonld: str, ctx: str = HTTPS_CONTEXT, parsed=_UNSET) -> str | None:
    """Analytic fast path: compute the fixup chain's byte splices with
    C-speed json.loads + string finds instead of the pure-Python span
    parser. Returns the fixed document (possibly unchanged) or None to
    fall back to the exact splice path.

    Handled shapes (equivalence with the splice path pinned by tests):
    - object @context with @vocab, string members, no rewrite -> no-op;
    - string @context (no rewrite needed) -> one wrap splice;
    - array @context (https option) -> one standard-map splice;
    - top-level Dataset with a relative string @id -> one @id splice.
    Anything else (escape sequences, ambiguous key tokens, member
    rewrites, @vocab insertion, ItemList item rewrites) falls back."""
    import json as _json

    if parsed is not _UNSET:
        obj = parsed  # one json.loads shared with the validator
        if obj is None:
            return None  # upstream parse failed: exact path decides
    else:
        try:
            obj = _json.loads(jsonld)
        except ValueError:
            return None
    if not isinstance(obj, dict):
        # sjson-on-non-object-root quirk: fix_context_url's @vocab insert
        # errors on an array/scalar root and the chain yields the empty
        # document (jsonutils.go:29-31 behavior, pinned by pipeline tests)
        return ""
    if "\\" in jsonld:
        return None
    # gjson resolves duplicate keys to the FIRST match, json.loads to the
    # LAST — any ambiguous key token falls back to the exact path
    if jsonld.count('"@type"') > 1 or jsonld.count('"@context"') > 1:
        return None
    ctx_val = obj.get("@context")
    splices: list[tuple[tuple[int, int], str]] = []
    if isinstance(ctx_val, str):
        # the wrap splice replaces the whole value span, so the member
        # rewrite folds into it: final bytes are {"@vocab":<rewritten>}
        span = _unique_value_span(jsonld, "@context")
        if span is None or jsonld[span[0]] != '"':
            return None
        v2 = _rewrite_ctx_member(ctx_val, ctx)
        splices.append((span, marshal({"@vocab": v2})))
        ctx_after: dict = {"@vocab": v2}
    elif isinstance(ctx_val, list):
        if ctx != HTTPS_CONTEXT:
            return None  # http option rewrites the standard map's members
        span = _unique_value_span(jsonld, "@context")
        if span is None or jsonld[span[0]] != "[":
            return None
        splices.append((span, marshal(STANDARD_HTTPS_CONTEXT)))
        ctx_after = STANDARD_HTTPS_CONTEXT
    elif isinstance(ctx_val, dict):
        span = _unique_value_span(jsonld, "@context")
        if span is None or jsonld[span[0]] != "{":
            return None
        for k, v in ctx_val.items():
            if jsonld.count('"%s"' % k) > 1:
                return None  # duplicate/shadowed member key token
            if not isinstance(v, str):
                return None  # gjson stringification quirk
            target = marshal(_rewrite_ctx_member(v, ctx))
            if target != '"' + v + '"':
                # fix_context_url splices this member (www/short schema.org
                # rewrite, or Go HTML-safe escaping of the raw bytes)
                mspan = _unique_value_span(jsonld, k)
                if mspan is None or jsonld[mspan[0]] != '"':
                    return None
                splices.append((mspan, target))
        if "@vocab" in ctx_val:
            ctx_after = ctx_val
        else:
            # sjson append-at-end: ,"@vocab":"<https ctx>" before the
            # @context object's closing brace (jsonutils.go:148 always
            # inserts the https constant, independent of the option)
            at = span[1] - 1
            splices.append(((at, at), ("," if ctx_val else "") + '"@vocab":' + marshal(HTTPS_CONTEXT)))
            ctx_after = dict(ctx_val, **{"@vocab": HTTPS_CONTEXT})
    elif ctx_val is None and "@context" not in obj:
        # no @context at all: fix_context_url creates it at the end of the
        # root object (sjson intermediate-object creation)
        at = jsonld.rindex("}")
        splices.append(
            ((at, at), ("," if obj else "") + '"@context":{"@vocab":' + marshal(HTTPS_CONTEXT) + "}")
        )
        ctx_after = {"@vocab": HTTPS_CONTEXT}
    else:
        return None  # e.g. "@context": null -> wholesale replace, exact path

    # fix_id: only when the (post-context-fix) map has no non-empty @base
    base = ctx_after.get("@base")
    if base is None or base == "":
        top_type = obj.get("@type")
        if top_type == "Dataset":
            ident = obj.get("@id")
            if ident is not None and jsonld.count('"@id"') > 1:
                return None  # duplicate/nested @id keys: exact path decides
            if isinstance(ident, str) and _url_scheme(ident) == "":
                if marshal(ident) != '"' + ident + '"':
                    return None
                span = _unique_value_span(jsonld, "@id")
                if span is None or jsonld[span[0]] != '"':
                    return None
                splices.append((span, marshal("file://" + ident)))
        elif top_type == "ItemList":
            if obj.get("itemListElement"):
                return None  # per-item @id rewrites take the exact path
    elif not isinstance(base, str):
        return None  # non-string @base: keep the exact path authoritative

    if not splices:
        return jsonld
    out = jsonld
    for (start, end), raw in sorted(splices, key=lambda s: -s[0][0]):
        out = out[:start] + raw + out[end:]
    return out


def is_graph_array(jsonld: str, validator) -> tuple[bool, list[str]]:
    """jsonutils.go:41-66 — explode a top-level JSON array into its valid
    elements, each re-marshaled Go-style (sorted keys, compact, HTML-safe
    escapes). Returns (is_valid_graph_array, elements)."""
    import json as _json

    jsonlds: list[str] = []
    try:
        arr = _json.loads(jsonld)
    except ValueError:
        return False, jsonlds
    if not isinstance(arr, list) or not all(isinstance(x, dict) for x in arr):
        return False, jsonlds
    for element in arr:
        text = marshal(element)  # Go json.Marshal re-serialization (go:51)
        valid, err = validator.is_valid(text)
        if valid and err is None:
            jsonlds.append(text)
    return (len(jsonlds) > 0), jsonlds


def add_to_json_list_if_valid(jsonlds: list[str], new_json: str, validator) -> tuple[list[str], str | None]:
    """jsonutils.go:25-39 — append ``new_json`` when valid; on validation
    *error*, try the graph-array path, which (reference quirk) returns the
    exploded elements PLUS the original string, replacing the running list
    (jsonutils.go:29-31). Returns (list, error_message_or_None)."""
    pairs, err = add_to_json_list_if_valid_parsed([(d, _UNSET) for d in jsonlds], new_json, validator)
    return [d for d, _ in pairs], err


def add_to_json_list_if_valid_parsed(
    pairs: list[tuple], new_json: str, validator
) -> tuple[list[tuple], str | None]:
    """``add_to_json_list_if_valid`` over (document, parsed_obj) pairs:
    the ONE ``json.loads`` done for validation is handed onward so the
    fixup chain never re-parses the same bytes (the crawl hot path).
    Graph-array elements carry their already-parsed dicts; validation
    of each element checks the dict directly (the marshal round trip
    preserves every type the structural checks look at)."""
    valid, err, obj = validator.is_valid_parsed(new_json)
    if err is not None:
        if isinstance(obj, list) and all(isinstance(x, dict) for x in obj):
            exploded = []
            for element in obj:
                el_ok, el_err = validator.check_obj(element)
                if el_ok and el_err is None:
                    # Go json.Marshal re-serialization (jsonutils.go:51)
                    exploded.append((marshal(element), element))
            if exploded:
                return exploded + [(new_json, obj)], None
        return pairs, "error checking for valid json: %s" % err
    if not valid:
        return pairs, "invalid json; continuing"
    return pairs + [(new_json, obj)], None


def get_options(ctx_option: ContextOption) -> tuple[ContextOption, str]:
    """jsonutils.go:283-296 — collapse per-source option to (mode, scheme)."""
    if ctx_option is not ContextOption.STRICT:
        if ctx_option in (ContextOption.HTTPS, ContextOption.STANDARDIZED_HTTPS):
            ctx_string = HTTPS_CONTEXT
        else:
            ctx_string = HTTP_CONTEXT
        return ContextOption.HTTPS, ctx_string
    return ContextOption.STRICT, HTTPS_CONTEXT


def process_json(
    jsonld: str,
    fix_context_option: ContextOption = ContextOption.HTTPS,
    context_strict: bool = False,
    parsed=_UNSET,
) -> str:
    """ProcessJson (jsonutils.go:299-331) minus the SHA step.

    Fixups are skipped only when the run-level ``context.strict`` is true
    AND the source option resolves to STRICT (the Go condition
    ``!(ok && strict=="true") || (srcFixOption != Strict)`` at :310).
    Returns the (possibly) fixed-up document text; identity is computed
    separately (identifier.generate_file_sha).
    """
    src_fix_option, src_http_option = get_options(fix_context_option)
    if (not context_strict) or (src_fix_option is not ContextOption.STRICT):
        # fast path: a C-speed json.loads + value inspection computes the
        # chain's splices analytically (no-op, string-@context wrap,
        # array-@context standardization, relative-@id rewrite); any
        # non-provable shape returns None and takes the exact splice path
        # (equivalence pinned by tests)
        fast = _fast_fixups(jsonld, src_http_option, parsed=parsed)
        if fast is not None:
            return fast
        # parse once; re-parse only after a fixup actually changed bytes
        try:
            root = jsonpatch.parse(jsonld)
        except jsonpatch.ParseError:
            root = None

        def step(fn, *args):
            nonlocal jsonld, root
            new = fn(jsonld, *args, root=root)
            if new != jsonld:
                jsonld = new
                try:
                    root = jsonpatch.parse(jsonld)
                except jsonpatch.ParseError:
                    root = None

        step(fix_context_string)
        step(fix_context_array, src_fix_option)
        step(fix_context_url, src_http_option)
        step(fix_id)
    return jsonld
