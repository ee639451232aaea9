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
    """JSON-LD validator; build once per actor (ST1 state).

    Round 3 replaced the curated structural rule set with the full
    JSON-LD 1.1 context-processing + expansion engine
    (``jsonld_expand.py``): a document is valid iff expansion completes,
    exactly json-gold's ToRDF accept/reject criterion
    (jsonutils.go:69-96). The Expander memoises processed contexts per
    actor, so repeated schema.org contexts cost one term-definition
    build per actor, not one per document. Decision parity with the
    round-2 structural validator was verified over every candidate
    document in the sf0.01 corpus (60k docs, zero divergences) and the
    reference's own fixture files before the switch.
    """

    def __init__(self, context_maps: dict[str, str] | None = None, resolvable: tuple[str, ...] = DEFAULT_RESOLVABLE):
        from .jsonld_expand import Expander, OfflineLoader

        extra = {}
        for url in tuple(context_maps or ()) + tuple(resolvable):
            root = url.rstrip("/#")
            vocab = url if url.endswith(("/", "#")) else url + "/"
            extra[root] = {"@context": {"@vocab": vocab}}
        # the defaults carry the richer schema.org context (id/type
        # aliases); only add non-default URLs on top
        loader = OfflineLoader()
        for root, doc in extra.items():
            if root not in loader.preloaded:
                loader.preloaded[root] = doc
        self.resolvable = tuple(set(resolvable) | set(context_maps or ()))
        self._expander = Expander(loader)

    # -- public ------------------------------------------------------------
    def is_valid(self, jsonld: str) -> tuple[bool, str | None]:
        """(valid, error) — mirrors isValid(): False + error message on any
        parse or expansion failure, (True, None) otherwise."""
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
        err = self._expand_error(obj)
        if err is not None:
            return False, "error in JSON-LD to RDF call: %s" % err, obj
        return True, None, obj

    def check_obj(self, obj) -> tuple[bool, str | None]:
        """Validate an ALREADY-PARSED document (graph-array elements:
        the reference marshals each element and re-validates the text,
        but expansion sees the same dict either way — types survive the
        marshal round trip)."""
        if not isinstance(obj, dict):
            return False, "error in unmarshaling json: cannot unmarshal into map"
        err = self._expand_error(obj)
        if err is not None:
            return False, "error in JSON-LD to RDF call: %s" % err
        return True, None

    # -- internals ----------------------------------------------------------
    def _expand_error(self, obj) -> str | None:
        from .jsonld_expand import JsonLdError

        try:
            self._expander.expand(obj)
        except JsonLdError as e:
            return str(e)
        except RecursionError:
            return "context overflow: document nesting exceeds expansion depth"
        return None


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
