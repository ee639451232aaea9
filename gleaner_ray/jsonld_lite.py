"""Lightweight JSON-LD validation and N-Quads conversion.

The reference validates every candidate document by running it through
json-gold's ``proc.ToRDF`` and rejecting on error (``isValid``,
/root/reference/internal/summoner/acquire/jsonutils.go:69-96), and
converts org graphs to n-quads the same way (``JLD2nq``,
internal/common/jld2nq.go:13-33). No JSON-LD library ships in this
environment, so this module implements the subset that determines
accept/reject for the corpus the engine processes:

``validate``:
- text must parse as JSON and the top level must be an object
  (Go ``json.Unmarshal`` into ``map[string]interface{}``);
- ``@context`` values must be structurally valid (string / object /
  array of those; term definitions string-or-object with string @id);
- remote context URLs must be resolvable: with no network, only URLs
  covered by the configured context maps (ldproc.go:17-21) or the
  built-in schema.org set are considered loadable — mirroring json-gold
  with the reference's preloaded document cache;
- ``@id`` must be a string, ``@type`` a string or array of strings,
  ``@value`` a scalar; ``@list``/``@set``/``@graph`` must be arrays or
  objects. Violations are what makes json-gold's expansion error.

``to_nquads``: a small expansion + serialization (``@vocab`` and prefix
resolution, node objects, blank-node counters, string and typed
literals, ``@graph``) sufficient for the org / prov template shapes
(internal/organizations/org.go:20-35, acquire/prov.go:31-79). Output
lines are sorted, as json-gold's dataset serializer does.

``is_graph_array`` lives in fixups.py; this module is their validator.
"""

from __future__ import annotations

import json

__all__ = ["ValidationError", "Validator", "to_nquads"]

# context URLs the reference resolves through its shipped document cache
# (assets/schemaorg-current-https.jsonld + contextmaps, ldproc.go:17-21)
DEFAULT_RESOLVABLE = (
    "http://schema.org",
    "http://schema.org/",
    "https://schema.org",
    "https://schema.org/",
    "http://www.schema.org",
    "https://www.schema.org",
    "http://www.w3.org/ns/prov#",
    "https://www.w3.org/ns/prov#",
)

_KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@list", "@set",
    "@graph", "@base", "@vocab", "@container", "@reverse", "@index",
    "@nest", "@prefix", "@version", "@protected", "@direction", "@import",
    "@propagate", "@json", "@included",
}


class ValidationError(ValueError):
    pass


class Validator:
    """Structural JSON-LD validator; build once per actor (ST1 state)."""

    def __init__(self, context_maps: dict[str, str] | None = None, resolvable: tuple[str, ...] = DEFAULT_RESOLVABLE):
        extra = tuple((context_maps or {}).keys())
        self.resolvable = tuple(set(resolvable) | set(extra))

    # -- public ------------------------------------------------------------
    def is_valid(self, jsonld: str) -> tuple[bool, str | None]:
        """(valid, error) — mirrors isValid(): False + error message on any
        parse or structural failure, (True, None) otherwise."""
        valid, err, _obj = self.is_valid_parsed(jsonld)
        return valid, err

    def is_valid_parsed(self, jsonld: str):
        """(valid, error, parsed_obj) — same contract as ``is_valid``
        but also hands back the json.loads result (None on parse
        failure) so the fixup chain can reuse the one parse instead of
        re-parsing the identical string (the crawl hot path parses
        every document exactly once this way)."""
        try:
            obj = json.loads(jsonld)
        except (ValueError, RecursionError) as e:
            return False, "error in unmarshaling json: %s" % e, None
        if not isinstance(obj, dict):
            return False, "error in unmarshaling json: cannot unmarshal into map", obj
        try:
            self._check_node(obj, depth=0)
        except ValidationError as e:
            return False, "error in JSON-LD to RDF call: %s" % e, obj
        return True, None, obj

    def check_obj(self, obj) -> tuple[bool, str | None]:
        """Validate an ALREADY-PARSED document (graph-array elements:
        the reference marshals each element and re-validates the text,
        but the structural checks see the same dict either way — types
        survive the marshal round trip)."""
        if not isinstance(obj, dict):
            return False, "error in unmarshaling json: cannot unmarshal into map"
        try:
            self._check_node(obj, depth=0)
        except ValidationError as e:
            return False, "error in JSON-LD to RDF call: %s" % e
        return True, None

    # -- internals ----------------------------------------------------------
    def _resolvable_url(self, url: str) -> bool:
        return url in self.resolvable or any(url.startswith(r) for r in self.resolvable if r.endswith("/"))

    # context keywords a term definition may legally target (everything
    # else is json-gold's "keyword redefinition" expansion error; @type
    # alone is redefinable in 1.1 with a restricted form)
    _CTX_DIRECTIVES = {"@base", "@vocab", "@version", "@language", "@direction",
                       "@propagate", "@import", "@protected"}

    # legal @container values in 1.1 expansion (json-gold: anything else
    # is an "invalid container mapping" error); arrays may combine @set
    # with one of these, or @graph with @id/@index
    _CONTAINERS = {"@list", "@set", "@index", "@language", "@graph", "@id", "@type"}

    @staticmethod
    def _term_target(defn):
        """The IRI/compact-IRI a term maps to (simple string defn or
        expanded-object @id), or None."""
        if isinstance(defn, str):
            return defn
        if isinstance(defn, dict) and isinstance(defn.get("@id"), str):
            return defn["@id"]
        return None

    def _check_term_cycles(self, ctx: dict) -> None:
        """json-gold's "cyclic IRI mapping" expansion error: creating a
        term definition must not require the term currently being
        defined (directly — ``{"a": "a:x"}`` — or through a prefix
        chain — ``{"a": "b:x", "b": "a:y"}``). A suffix starting with
        ``//`` is an absolute IRI, never a prefix reference."""
        edges: dict[str, str] = {}
        for term, defn in ctx.items():
            if term.startswith("@"):
                continue
            target = self._term_target(defn)
            if not isinstance(target, str) or ":" not in target:
                continue
            prefix, _, suffix = target.partition(":")
            if suffix.startswith("//"):
                continue
            if prefix in ctx:
                edges[term] = prefix
        for start in edges:
            seen = {start}
            cur = start
            while cur in edges:
                cur = edges[cur]
                if cur in seen:
                    raise ValidationError("cyclic IRI mapping: %s" % start)
                seen.add(cur)

    def _check_context(self, ctx, depth: int, protected: dict | None = None) -> None:
        """``protected`` carries term definitions marked @protected by
        ancestor contexts: a nested context that overrides one is
        json-gold's "protected term redefinition" expansion error
        (identical redefinition is legal per the 1.1 spec)."""
        if ctx is None:
            return
        if isinstance(ctx, str):
            if ctx.startswith(("http://", "https://")) and not self._resolvable_url(ctx):
                raise ValidationError("loading remote context failed: %s" % ctx)
            return
        if isinstance(ctx, list):
            for c in ctx:
                self._check_context(c, depth + 1, protected)
            return
        if isinstance(ctx, dict):
            self._check_term_cycles(ctx)
            for term, defn in ctx.items():
                if term == "@base":
                    if defn is not None and not isinstance(defn, str):
                        raise ValidationError("invalid base IRI")
                    continue
                if term == "@vocab":
                    if defn is not None and not isinstance(defn, str):
                        raise ValidationError("invalid vocab mapping")
                    continue
                if term == "@version":
                    # json-gold (1.1 processing mode): only 1.1 is legal
                    if defn != 1.1:
                        raise ValidationError("invalid @version value: %r" % (defn,))
                    continue
                if term == "@propagate":
                    if not isinstance(defn, bool):
                        raise ValidationError("invalid @propagate value: %r" % (defn,))
                    continue
                if term == "@import":
                    if not isinstance(defn, str):
                        raise ValidationError("invalid @import value: %r" % (defn,))
                    continue
                if term in self._CTX_DIRECTIVES:
                    continue
                if term in _KEYWORDS and term != "@type":
                    raise ValidationError("keyword redefinition: %s" % term)
                if protected and term in protected and defn != protected[term]:
                    raise ValidationError("protected term redefinition: %s" % term)
                target = self._term_target(defn)
                if (
                    isinstance(target, str)
                    and target.startswith("@")
                    and target not in _KEYWORDS
                ):
                    # "@"-prefixed non-keyword mapping ("@bogus"):
                    # json-gold "invalid IRI mapping"
                    raise ValidationError("invalid IRI mapping for term %s" % term)
                if defn is None or isinstance(defn, str):
                    continue
                if isinstance(defn, dict):
                    tid = defn.get("@id")
                    if tid is not None and not isinstance(tid, str):
                        raise ValidationError("invalid IRI mapping for term %s" % term)
                    tt = defn.get("@type")
                    if tt is not None and not isinstance(tt, str):
                        raise ValidationError("invalid type mapping for term %s" % term)
                    rev = defn.get("@reverse")
                    if rev is not None and not isinstance(rev, str):
                        raise ValidationError("invalid IRI mapping for reverse term %s" % term)
                    cont = defn.get("@container")
                    if cont is not None:
                        vals = cont if isinstance(cont, list) else [cont]
                        if not vals or not all(
                            isinstance(c, str) and c in self._CONTAINERS for c in vals
                        ):
                            raise ValidationError("invalid container mapping for term %s" % term)
                    scoped = defn.get("@context")
                    if "@context" in defn:
                        if not isinstance(scoped, (str, dict, list)) and scoped is not None:
                            raise ValidationError("invalid scoped context for term %s" % term)
                        self._check_context(scoped, depth + 1, protected)
                    continue
                if isinstance(defn, (int, float, bool)):
                    raise ValidationError("invalid term definition for %s" % term)
            return
        raise ValidationError("invalid local context")

    @staticmethod
    def _collect_protected(ctx, into: dict) -> None:
        """Record term definitions the context marks @protected (either
        context-wide ``"@protected": true`` or per-term)."""
        if isinstance(ctx, list):
            for c in ctx:
                Validator._collect_protected(c, into)
            return
        if not isinstance(ctx, dict):
            return
        ctx_wide = ctx.get("@protected") is True
        for term, defn in ctx.items():
            if term.startswith("@"):
                continue
            per_term = defn.get("@protected") if isinstance(defn, dict) else None
            if per_term is True or (ctx_wide and per_term is not False):
                into[term] = defn

    def _check_node(self, node, depth: int, protected: dict | None = None) -> None:
        if depth > 200:
            raise ValidationError("context overflow")
        if isinstance(node, list):
            for item in node:
                self._check_node(item, depth + 1, protected)
            return
        if not isinstance(node, dict):
            return
        if "@context" in node:
            self._check_context(node["@context"], depth, protected)
            # terms this context protects bind every nested context below
            collected: dict = {}
            self._collect_protected(node["@context"], collected)
            if collected:
                protected = {**(protected or {}), **collected}
        if "@id" in node and not isinstance(node["@id"], str):
            raise ValidationError("invalid @id value")
        if "@type" in node:
            t = node["@type"]
            if isinstance(t, list):
                if not all(isinstance(x, str) for x in t):
                    raise ValidationError("invalid type value")
            elif not isinstance(t, str):
                raise ValidationError("invalid type value")
        if "@reverse" in node and not isinstance(node["@reverse"], dict):
            # json-gold expansion: "invalid @reverse value"
            raise ValidationError("invalid @reverse value")
        if "@value" in node:
            v = node["@value"]
            if isinstance(v, (dict, list)):
                raise ValidationError("invalid value object value")
            bad = set(node) - {"@value", "@type", "@language", "@index", "@context", "@direction"}
            if bad:
                raise ValidationError("invalid value object: %s" % sorted(bad))
            if "@type" in node and "@language" in node:
                raise ValidationError("invalid value object: both @type and @language")
            lang = node.get("@language")
            if lang is not None and not isinstance(lang, str):
                # json-gold expansion: "invalid language-tagged string"
                raise ValidationError("invalid language-tagged string")
        for k, v in node.items():
            if k == "@context":
                continue
            if isinstance(v, (dict, list)):
                self._check_node(v, depth + 1, protected)


# ---------------------------------------------------------------------------
# mini expansion -> N-Quads (enough for the org / prov template shapes)
# ---------------------------------------------------------------------------

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _escape_literal(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


class _Ctx:
    def __init__(self, vocab: str = "", prefixes: dict | None = None, base: str = ""):
        self.vocab = vocab
        self.prefixes = prefixes or {}
        self.base = base

    @classmethod
    def from_doc(cls, ctx) -> "_Ctx":
        vocab, prefixes, base = "", {}, ""
        items = ctx if isinstance(ctx, list) else [ctx]
        for c in items:
            if isinstance(c, str):
                if "schema.org" in c:
                    vocab = c if c.endswith("/") else c + "/"
            elif isinstance(c, dict):
                for term, defn in c.items():
                    if term == "@vocab" and isinstance(defn, str):
                        vocab = defn
                    elif term == "@base" and isinstance(defn, str):
                        base = defn
                    elif isinstance(defn, str):
                        prefixes[term] = defn
                    elif isinstance(defn, dict) and isinstance(defn.get("@id"), str):
                        prefixes[term] = defn["@id"]
        return cls(vocab, prefixes, base)

    def expand_iri(self, term: str, as_property: bool = False) -> str | None:
        if term.startswith(("http://", "https://", "file://", "urn:", "mailto:", "_:")):
            return term
        if ":" in term:
            prefix, _, suffix = term.partition(":")
            if prefix in self.prefixes:
                return self.prefixes[prefix] + suffix
            return term  # absolute-ish IRI with unknown scheme
        if term in self.prefixes:
            return self.prefixes[term]
        if as_property and self.vocab:
            return self.vocab + term
        if not as_property and self.base:
            return self.base.rstrip("/") + "/" + term
        if not as_property and self.vocab:
            return self.vocab + term
        return None


def normalize_nquads(jsonld: str) -> str:
    """URDNA2015 normalization: expansion with json-gold's no-context
    fallbacks (bare @type terms become relative IRIs; term-less
    properties drop; a RELATIVE @id invalidates that node's quads), then
    the full RDF Dataset Canonicalization label assignment (urdna.py) —
    unique first-degree hashes, N-degree gossip paths for symmetric
    blank nodes. Matches the reference's approved goldens
    (internal/common/ldproc_test.go:40-105) including the multi-node
    ``noContext`` empty-output case."""
    from .urdna import canonicalize, serialize_quads

    quads = _expand_quads(jsonld, relative_types=True)
    labels = canonicalize(quads)
    return serialize_quads(quads, labels)


def _expand_quads(
    jsonld: str, graph_name: str | None = None, relative_types: bool = False
) -> list[tuple]:
    """Expand a (template-shaped) JSON-LD document into quad tuples
    ``(subject, predicate_iri, object_token, graph_iri|None)`` —
    subjects are bnode tokens or absolute IRIs; objects are serialized
    N-Quads tokens. json-gold parity quirks: a node whose @id expands
    RELATIVE emits no quads of its own (invalid RDF subject) though its
    mapped children still expand; bare @type terms stay relative when
    ``relative_types`` (the Normalize path keeps them, goldens pin it)."""
    doc = json.loads(jsonld)
    quads: list[tuple] = []
    counter = [0]
    ctx = _Ctx.from_doc(doc.get("@context", {}))

    def bnode() -> str:
        b = "_:b%d" % counter[0]
        counter[0] += 1
        return b

    def fmt_term(t: str) -> str:
        return t if t.startswith("_:") else "<%s>" % t

    def node_subject(node: dict, local_ctx: _Ctx) -> str | None:
        """bnode token, absolute IRI, or None for a relative @id
        (json-gold drops quads with non-absolute subjects)."""
        nid = node.get("@id")
        if isinstance(nid, str):
            return local_ctx.expand_iri(nid)
        return bnode()

    def emit(s: str, p: str, o: str) -> None:
        quads.append((s, p, o, graph_name))

    def walk(node, local_ctx: _Ctx) -> str | None:
        if isinstance(node, list):
            for item in node:
                walk(item, local_ctx)
            return None
        if not isinstance(node, dict):
            return None
        if "@context" in node:
            local_ctx = _Ctx.from_doc(node["@context"])
        if "@graph" in node and len([k for k in node if k not in ("@context", "@graph")]) == 0:
            walk(node["@graph"], local_ctx)
            return None
        subj = node_subject(node, local_ctx)
        valid_subject = subj is not None

        def emit_if_valid(p: str, o: str) -> None:
            if valid_subject:
                emit(subj, p, o)

        types = node.get("@type", [])
        for t in [types] if isinstance(types, str) else types:
            t_iri = local_ctx.expand_iri(t, as_property=True)
            if t_iri is None and relative_types:
                t_iri = t  # json-gold keeps bare types as relative IRIs
            if t_iri:
                emit_if_valid("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", fmt_term(t_iri))
        for key, value in node.items():
            if key in ("@context", "@id", "@type", "@graph"):
                continue
            pred = local_ctx.expand_iri(key, as_property=True)
            if pred is None:
                continue
            for v in value if isinstance(value, list) else [value]:
                if isinstance(v, dict):
                    if "@value" in v:
                        lit = v["@value"]
                        dt = v.get("@type")
                        dt_iri = local_ctx.expand_iri(dt, as_property=True) if dt else None
                        o = '"%s"' % _escape_literal(str(lit))
                        if dt_iri and dt_iri != _XSD_STRING:
                            o += "^^<%s>" % dt_iri
                        elif v.get("@language"):
                            o += "@%s" % v["@language"]
                        emit_if_valid(pred, o)
                    elif set(v) == {"@id"} and isinstance(v.get("@id"), str):
                        o_iri = local_ctx.expand_iri(v["@id"])
                        if o_iri:
                            emit_if_valid(pred, fmt_term(o_iri))
                    else:
                        child = walk(v, local_ctx)
                        if child:
                            emit_if_valid(pred, fmt_term(child))
                elif isinstance(v, bool):
                    emit_if_valid(pred, '"%s"^^<http://www.w3.org/2001/XMLSchema#boolean>' % str(v).lower())
                elif isinstance(v, (int, float)):
                    if isinstance(v, int):
                        emit_if_valid(pred, '"%d"^^<http://www.w3.org/2001/XMLSchema#integer>' % v)
                    else:
                        emit_if_valid(pred, '"%s"^^<http://www.w3.org/2001/XMLSchema#double>' % repr(v))
                elif isinstance(v, str):
                    emit_if_valid(pred, '"%s"' % _escape_literal(v))
        return subj

    walk(doc, ctx)
    return quads


def to_nquads(jsonld: str, graph_name: str | None = None, relative_types: bool = False) -> str:
    """Convert a (template-shaped) JSON-LD document to sorted N-Quads."""
    from .urdna import serialize_quads

    return serialize_quads(_expand_quads(jsonld, graph_name, relative_types))
