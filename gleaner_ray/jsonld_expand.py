"""Full JSON-LD 1.1 context processing + expansion.

The reference validates every candidate document by running json-gold's
``proc.ToRDF`` and rejecting on error (isValid,
/root/reference/internal/summoner/acquire/jsonutils.go:69-96, processor
built in internal/common/ldproc.go:27-62). json-gold reports problems as
JSON-LD 1.1 API expansion error codes raised during context processing
and expansion; RDF serialization itself silently drops what it cannot
convert. ``expand`` here is therefore the accept/reject authority: a
document is valid iff expansion completes.

This is a from-scratch implementation of the W3C "JSON-LD 1.1
Processing Algorithms and API" Recommendation (2020-07-16) §4 Context
Processing and §5 Expansion, in json-ld-1.1 processing mode (json-gold's
default), with the documented json-gold deviations:

- a term whose ``@id`` has the form of a keyword (``"@bogus"``) raises
  ``invalid IRI mapping`` where the spec says warn-and-ignore — json-gold
  raises, and the engine's rejection fixtures pin that behavior;
- remote contexts resolve only through the offline preloaded loader
  (mirroring the reference's CachingDocumentLoader with PreloadWithMapping,
  ldproc.go:40-56); anything else is ``loading remote context failed``.

No code is derived from json-gold; the algorithms are implemented from
the public spec text.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin

__all__ = ["JsonLdError", "OfflineLoader", "expand"]


class JsonLdError(ValueError):
    """Expansion/context-processing error; ``code`` is the spec's error
    code string (e.g. "invalid IRI mapping")."""

    def __init__(self, code: str, detail: str = ""):
        self.code = code
        super().__init__("%s: %s" % (code, detail) if detail else code)


KEYWORDS = {
    "@base", "@container", "@context", "@direction", "@graph", "@id",
    "@import", "@included", "@index", "@json", "@language", "@list",
    "@nest", "@none", "@prefix", "@propagate", "@protected", "@reverse",
    "@set", "@type", "@value", "@version", "@vocab",
}

_KEYWORD_FORM = re.compile(r"^@[A-Za-z]+$")
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
# IRI general delimiters (RFC 3987 gen-delims) — a simple term mapping to
# an IRI ending in one of these becomes a prefix (spec §4.2.2 step 14.3)
_GEN_DELIMS = ":/?#[]@"

_CONTEXT_DIRECTIVES = {
    "@base", "@direction", "@import", "@language", "@propagate",
    "@protected", "@version", "@vocab",
}


def _is_abs_iri(value: str) -> bool:
    return bool(_ABS_IRI.match(value)) and " " not in value


def _is_keyword(value) -> bool:
    return isinstance(value, str) and value in KEYWORDS


def _has_keyword_form(value) -> bool:
    return (
        isinstance(value, str)
        and value[:1] == "@"
        and value not in KEYWORDS
        and bool(_KEYWORD_FORM.match(value))
    )


class TermDef:
    __slots__ = (
        "iri", "reverse", "type_mapping", "language", "has_language",
        "direction", "has_direction", "container", "context", "has_context",
        "nest", "prefix", "protected", "index", "base_url",
    )

    def __init__(self):
        self.iri = None
        self.reverse = False
        self.type_mapping = None
        self.language = None
        self.has_language = False
        self.direction = None
        self.has_direction = False
        self.container: frozenset = frozenset()
        self.context = None
        self.has_context = False
        self.nest = None
        self.prefix = False
        self.protected = False
        self.index = None
        self.base_url = None

    def _key(self):
        # equality modulo @protected (spec: identical redefinition of a
        # protected term is legal; the protected flag itself is excluded)
        return (
            self.iri, self.reverse, self.type_mapping, self.language,
            self.has_language, self.direction, self.has_direction,
            self.container, json.dumps(self.context, sort_keys=True),
            self.has_context, self.nest, self.prefix, self.index,
        )

    def same_as(self, other: "TermDef") -> bool:
        return self._key() == other._key()

    def copy(self) -> "TermDef":
        new = TermDef()
        for s in self.__slots__:
            setattr(new, s, getattr(self, s))
        return new


class ActiveContext:
    __slots__ = (
        "terms", "base", "original_base", "vocab", "default_language",
        "default_direction", "previous_context",
    )

    def __init__(self, base: str | None = None):
        self.terms: dict[str, TermDef] = {}
        self.base = base
        self.original_base = base
        self.vocab = None
        self.default_language = None
        self.default_direction = None
        self.previous_context: "ActiveContext | None" = None

    def copy(self) -> "ActiveContext":
        new = ActiveContext()
        new.terms = dict(self.terms)
        new.base = self.base
        new.original_base = self.original_base
        new.vocab = self.vocab
        new.default_language = self.default_language
        new.default_direction = self.default_direction
        new.previous_context = self.previous_context
        return new

    def has_protected(self) -> bool:
        return any(t.protected for t in self.terms.values())


class OfflineLoader:
    """Document loader resolving ONLY preloaded context URLs, as the
    reference preloads its shipped schema.org/context files into
    json-gold's caching loader (ldproc.go:40-56). ``preloaded`` maps a
    URL prefix to a parsed context document (a dict with "@context").
    Unknown URLs raise ``loading remote context failed``, exactly what
    json-gold raises with no network path to the context."""

    SCHEMA_ORG = {
        "@context": {
            "@vocab": "https://schema.org/",
            "id": "@id",
            "type": "@type",
        }
    }
    PROV = {"@context": {"@vocab": "http://www.w3.org/ns/prov#"}}

    DEFAULT_PRELOADED = {
        "http://schema.org": SCHEMA_ORG,
        "https://schema.org": SCHEMA_ORG,
        "http://www.schema.org": SCHEMA_ORG,
        "https://www.schema.org": SCHEMA_ORG,
        "http://www.w3.org/ns/prov": PROV,
        "https://www.w3.org/ns/prov": PROV,
    }

    def __init__(self, extra: dict | None = None):
        self.preloaded = dict(self.DEFAULT_PRELOADED)
        for url, doc in (extra or {}).items():
            self.preloaded[url.rstrip("/#")] = doc

    def load(self, url: str):
        key = url.rstrip("/#")
        # strip a trailing /docs/jsonldcontext.json[ld]-style path down
        # to the registered root if the exact URL isn't preloaded
        if key in self.preloaded:
            return self.preloaded[key]
        for root, doc in self.preloaded.items():
            if key.startswith(root + "/"):
                return doc
        raise JsonLdError("loading remote context failed", url)


# ---------------------------------------------------------------------------
# §4.1 Context Processing Algorithm
# ---------------------------------------------------------------------------

def process_context(
    active: ActiveContext,
    local,
    base_url: str | None,
    loader: OfflineLoader,
    remote_contexts: tuple = (),
    override_protected: bool = False,
    propagate: bool = True,
    validate_scoped: bool = True,
) -> ActiveContext:
    result = active.copy()

    if not propagate and result.previous_context is None:
        result.previous_context = active

    for context in local if isinstance(local, list) else [local]:
        if context is None:
            # protected terms accumulated SO FAR (earlier array elements
            # included) block nullification
            if not override_protected and result.has_protected():
                raise JsonLdError("invalid context nullification")
            result = ActiveContext(base=active.original_base)
            if not propagate:
                result.previous_context = active
            continue
        if isinstance(context, str):
            url = urljoin(base_url, context) if base_url else context
            if url in remote_contexts:
                raise JsonLdError("recursive context inclusion", url)
            if len(remote_contexts) > 32:
                raise JsonLdError("context overflow", url)
            loaded = loader.load(url)
            if not isinstance(loaded, dict) or "@context" not in loaded:
                raise JsonLdError("invalid remote context", url)
            result = process_context(
                result, loaded["@context"], url, loader,
                remote_contexts + (url,), validate_scoped=validate_scoped,
            )
            continue
        if not isinstance(context, dict):
            raise JsonLdError("invalid local context", repr(context)[:80])

        if "@propagate" in context:
            pv = context["@propagate"]
            if not isinstance(pv, bool):
                raise JsonLdError("invalid @propagate value", repr(pv))
            if pv is False and result.previous_context is None:
                # freeze the context as it stands BEFORE this element:
                # expansion reverts to it for nested nodes
                result.previous_context = result.copy()
        if "@version" in context and context["@version"] != 1.1:
            raise JsonLdError("invalid @version value", repr(context["@version"]))
        if "@import" in context:
            imp = context["@import"]
            if not isinstance(imp, str):
                raise JsonLdError("invalid @import value", repr(imp))
            url = urljoin(base_url, imp) if base_url else imp
            loaded = loader.load(url)
            if not isinstance(loaded, dict) or "@context" not in loaded:
                raise JsonLdError("invalid remote context", url)
            imported = loaded["@context"]
            if not isinstance(imported, dict):
                raise JsonLdError("invalid remote context", url)
            if "@import" in imported:
                raise JsonLdError("invalid context entry", "@import inside @import")
            context = {**imported, **context}

        if "@base" in context and not remote_contexts:
            b = context["@base"]
            if b is None:
                result.base = None
            elif not isinstance(b, str):
                raise JsonLdError("invalid base IRI", repr(b))
            elif _is_abs_iri(b):
                result.base = b
            elif result.base is not None:
                result.base = urljoin(result.base, b)
            else:
                raise JsonLdError("invalid base IRI", b)
        if "@vocab" in context:
            v = context["@vocab"]
            if v is None:
                result.vocab = None
            elif not isinstance(v, str):
                raise JsonLdError("invalid vocab mapping", repr(v))
            else:
                result.vocab = expand_iri(result, v, vocab=True, doc_relative=True)
        if "@language" in context:
            lang = context["@language"]
            if lang is None:
                result.default_language = None
            elif not isinstance(lang, str):
                raise JsonLdError("invalid default language", repr(lang))
            else:
                result.default_language = lang.lower()
        if "@direction" in context:
            d = context["@direction"]
            if d is None:
                result.default_direction = None
            elif d not in ("ltr", "rtl"):
                raise JsonLdError("invalid base direction", repr(d))
            else:
                result.default_direction = d
        if "@protected" in context and not isinstance(context["@protected"], bool):
            raise JsonLdError("invalid @protected value", repr(context["@protected"]))

        defined: dict[str, bool] = {}
        ctx_protected = context.get("@protected", False) is True
        for term in context:
            if term in _CONTEXT_DIRECTIVES:
                continue
            create_term_definition(
                result, context, term, defined, base_url, loader,
                protected=ctx_protected, override_protected=override_protected,
                remote_contexts=remote_contexts, validate_scoped=validate_scoped,
            )
    return result


_TERM_DEF_KEYS = {
    "@id", "@reverse", "@type", "@language", "@container", "@context",
    "@prefix", "@nest", "@index", "@direction", "@protected",
}

_CONTAINER_SINGLE = {"@graph", "@id", "@index", "@language", "@list", "@set", "@type"}


def _validate_container(value, term: str) -> frozenset:
    vals = value if isinstance(value, list) else [value]
    if not vals or not all(isinstance(c, str) and c in _CONTAINER_SINGLE for c in vals):
        raise JsonLdError("invalid container mapping for term %s" % term, repr(value))
    s = frozenset(vals)
    if len(s) == 1:
        return s
    rest = s - {"@set"}
    if "@set" in s and len(rest) == 1 and rest <= {"@index", "@graph", "@id", "@type", "@language"}:
        return s
    if rest in ({"@graph", "@id"}, {"@graph", "@index"}) and s - rest <= {"@set"}:
        return s
    raise JsonLdError("invalid container mapping for term %s" % term, repr(value))


def create_term_definition(
    active: ActiveContext,
    local_ctx: dict,
    term: str,
    defined: dict,
    base_url: str | None,
    loader: OfflineLoader,
    protected: bool = False,
    override_protected: bool = False,
    remote_contexts: tuple = (),
    validate_scoped: bool = True,
) -> None:
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError("cyclic IRI mapping", term)
    if term == "":
        raise JsonLdError("invalid term definition", "empty term")
    defined[term] = False
    value = local_ctx[term]

    if term == "@type":
        # 1.1: @type may be redefined only as {"@container": "@set"}
        # (optionally @protected)
        if not (
            isinstance(value, dict)
            and set(value) <= {"@container", "@protected"}
            and value.get("@container", "@set") == "@set"
        ):
            raise JsonLdError("keyword redefinition", term)
    elif term in KEYWORDS:
        raise JsonLdError("keyword redefinition", term)
    elif _has_keyword_form(term):
        # spec: terms that look like keywords are ignored with a warning
        defined[term] = True
        return

    previous = active.terms.pop(term, None)

    simple_term = False
    if value is None:
        value = {"@id": None}
    elif isinstance(value, str):
        value = {"@id": value}
        simple_term = True
    elif not isinstance(value, dict):
        raise JsonLdError("invalid term definition", "%s: %r" % (term, value))

    definition = TermDef()
    definition.base_url = base_url

    if "@protected" in value:
        if not isinstance(value["@protected"], bool):
            raise JsonLdError("invalid @protected value", term)
        definition.protected = value["@protected"]
    else:
        definition.protected = protected

    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError("invalid type mapping for term %s" % term, repr(t))
        t_exp = expand_iri(active, t, vocab=True, local_ctx=local_ctx, defined=defined,
                           loader=loader, base_url=base_url)
        if t_exp not in ("@id", "@vocab", "@json", "@none") and not (
            isinstance(t_exp, str) and _is_abs_iri(t_exp)
        ):
            raise JsonLdError("invalid type mapping for term %s" % term, repr(t))
        definition.type_mapping = t_exp

    if "@reverse" in value:
        if "@id" in value or "@nest" in value:
            raise JsonLdError("invalid reverse property", term)
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("invalid IRI mapping for reverse term %s" % term, repr(rev))
        if _has_keyword_form(rev):
            defined[term] = True
            return
        iri = expand_iri(active, rev, vocab=True, local_ctx=local_ctx, defined=defined,
                         loader=loader, base_url=base_url)
        if not (isinstance(iri, str) and (_is_abs_iri(iri) or iri.startswith("_:"))):
            raise JsonLdError("invalid IRI mapping for reverse term %s" % term, repr(rev))
        definition.iri = iri
        definition.reverse = True
        if "@container" in value:
            c = value["@container"]
            if c not in ("@set", "@index", None):
                raise JsonLdError("invalid reverse property", term)
            if isinstance(c, str):
                definition.container = frozenset((c,))
        _finish_term(active, term, definition, previous, override_protected)
        defined[term] = True
        return

    if "@id" in value and value["@id"] != term:
        tid = value["@id"]
        if tid is None:
            pass  # term maps to nothing; keeps key from expanding
        elif not isinstance(tid, str):
            raise JsonLdError("invalid IRI mapping for term %s" % term, repr(tid))
        elif tid not in KEYWORDS and _has_keyword_form(tid):
            # spec says warn-and-ignore; json-gold raises — pinned by the
            # engine's rejection fixtures (invalid_iri_mapping_keyword_like)
            raise JsonLdError("invalid IRI mapping for term %s" % term, repr(tid))
        else:
            iri = expand_iri(active, tid, vocab=True, local_ctx=local_ctx, defined=defined,
                             loader=loader, base_url=base_url)
            if iri == "@context":
                raise JsonLdError("invalid keyword alias", term)
            if not (_is_keyword(iri) or (isinstance(iri, str) and (_is_abs_iri(iri) or iri.startswith("_:")))):
                raise JsonLdError("invalid IRI mapping for term %s" % term, repr(tid))
            definition.iri = iri
            if (":" in term[1:-1] or "/" in term) and defined.get(term) is False:
                # term is itself compact-IRI/path shaped: its expansion must
                # agree with the mapping (spec step 14.2.4.2)
                defined[term] = True
                check = expand_iri(active, term, vocab=True, local_ctx=local_ctx,
                                   defined=defined, loader=loader, base_url=base_url)
                defined[term] = False
                if check != iri:
                    raise JsonLdError("invalid IRI mapping for term %s" % term, repr(tid))
            if "/" not in term and ":" not in term[1:-1]:
                if simple_term and isinstance(iri, str) and iri and (
                    iri[-1] in _GEN_DELIMS or iri.startswith("_:")
                ):
                    definition.prefix = True
    elif ":" in term[1:]:
        prefix, _, suffix = term.partition(":")
        if prefix in local_ctx:
            create_term_definition(active, local_ctx, prefix, defined, base_url, loader,
                                   protected, override_protected, remote_contexts,
                                   validate_scoped)
        ptd = active.terms.get(prefix)
        if ptd is not None and ptd.iri is not None and not suffix.startswith("//"):
            definition.iri = ptd.iri + suffix
        else:
            definition.iri = term  # term is itself an (absolute) IRI
    elif "/" in term:
        iri = expand_iri(active, term, vocab=True, loader=loader, base_url=base_url)
        if not (isinstance(iri, str) and _is_abs_iri(iri)):
            raise JsonLdError("invalid IRI mapping for term %s" % term)
        definition.iri = iri
    elif term == "@type":
        definition.iri = "@type"
    else:
        if active.vocab is None:
            raise JsonLdError(
                "invalid IRI mapping for term %s" % term,
                "term has no @id and no @vocab is in scope",
            )
        definition.iri = active.vocab + term

    if "@container" in value:
        definition.container = _validate_container(value["@container"], term)
        if "@type" in definition.container:
            if definition.type_mapping is None:
                definition.type_mapping = "@id"
            if definition.type_mapping not in ("@id", "@vocab"):
                raise JsonLdError("invalid type mapping for term %s" % term)

    if "@index" in value:
        if "@index" not in definition.container:
            raise JsonLdError("invalid term definition", "%s: @index without @container:@index" % term)
        idx = value["@index"]
        if not isinstance(idx, str):
            raise JsonLdError("invalid term definition", "%s: non-string @index" % term)
        definition.index = idx

    if "@context" in value:
        scoped = value["@context"]
        if validate_scoped:
            try:
                process_context(
                    active, scoped, base_url, loader, remote_contexts,
                    override_protected=True, validate_scoped=False,
                )
            except JsonLdError as e:
                raise JsonLdError("invalid scoped context for term %s" % term, str(e))
        definition.context = scoped
        definition.has_context = True

    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError("invalid language mapping for term %s" % term, repr(lang))
        definition.language = lang.lower() if isinstance(lang, str) else None
        definition.has_language = True

    if "@direction" in value and "@type" not in value:
        d = value["@direction"]
        if d is not None and d not in ("ltr", "rtl"):
            raise JsonLdError("invalid base direction", repr(d))
        definition.direction = d
        definition.has_direction = True

    if "@nest" in value:
        nv = value["@nest"]
        if not isinstance(nv, str) or (nv != "@nest" and nv in KEYWORDS):
            raise JsonLdError("invalid @nest value", term)
        definition.nest = nv

    if "@prefix" in value:
        if ":" in term[1:] or "/" in term:
            raise JsonLdError("invalid term definition", "%s: @prefix on compact-IRI term" % term)
        pv = value["@prefix"]
        if not isinstance(pv, bool):
            raise JsonLdError("invalid @prefix value", term)
        definition.prefix = pv
        if definition.prefix and _is_keyword(definition.iri):
            raise JsonLdError("invalid term definition", term)

    extra = set(value) - _TERM_DEF_KEYS
    if extra:
        raise JsonLdError("invalid term definition", "%s: %s" % (term, sorted(extra)))

    _finish_term(active, term, definition, previous, override_protected)
    defined[term] = True


def _finish_term(active, term, definition, previous, override_protected):
    if previous is not None and previous.protected:
        if definition.same_as(previous):
            # identical redefinition of a protected term is legal and
            # keeps the protection (spec §4.2.2 step 26)
            definition.protected = True
        elif not override_protected:
            raise JsonLdError("protected term redefinition", term)
    active.terms[term] = definition


# ---------------------------------------------------------------------------
# §5.1 IRI Expansion
# ---------------------------------------------------------------------------

def expand_iri(
    active: ActiveContext,
    value,
    vocab: bool = False,
    doc_relative: bool = False,
    local_ctx: dict | None = None,
    defined: dict | None = None,
    loader: OfflineLoader | None = None,
    base_url: str | None = None,
):
    if value is None:
        return None
    # fast path: a defined term (never keyword-shaped — those are dropped
    # at definition time) resolves straight from the term map
    if local_ctx is None:
        td = active.terms.get(value)
        if td is not None:
            iri = td.iri
            if isinstance(iri, str) and iri in KEYWORDS:
                return iri
            if vocab:
                return iri
        if value in KEYWORDS:
            return value
        if _has_keyword_form(value):
            return None
    else:
        if value in KEYWORDS:
            return value
        if _has_keyword_form(value):
            return None
        if value in local_ctx and defined is not None and not defined.get(value):
            create_term_definition(active, local_ctx, value, defined, base_url, loader)
        td = active.terms.get(value)
        if td is not None and _is_keyword(td.iri):
            return td.iri
        if vocab and td is not None:
            return td.iri
    if ":" in value[1:]:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        if local_ctx is not None and prefix in local_ctx and defined is not None and not defined.get(prefix):
            create_term_definition(active, local_ctx, prefix, defined, base_url, loader)
        ptd = active.terms.get(prefix)
        if ptd is not None and ptd.iri is not None and ptd.prefix:
            return ptd.iri + suffix
        if _is_abs_iri(value):
            return value
    if vocab and active.vocab is not None:
        return active.vocab + value
    if doc_relative and active.base is not None:
        return urljoin(active.base, value)
    return value


# ---------------------------------------------------------------------------
# §5.3 Value Expansion
# ---------------------------------------------------------------------------

def _expand_value(active: ActiveContext, prop: str | None, value):
    td = active.terms.get(prop) if prop else None
    tm = td.type_mapping if td else None
    if tm == "@id" and isinstance(value, str):
        return {"@id": expand_iri(active, value, doc_relative=True)}
    if tm == "@vocab" and isinstance(value, str):
        return {"@id": expand_iri(active, value, vocab=True, doc_relative=True)}
    result = {"@value": value}
    if tm not in (None, "@id", "@vocab", "@none"):
        result["@type"] = tm
    elif isinstance(value, str):
        if td is not None and td.has_language:
            if td.language is not None:
                result["@language"] = td.language
        elif active.default_language is not None:
            result["@language"] = active.default_language
        if td is not None and td.has_direction:
            if td.direction is not None:
                result["@direction"] = td.direction
        elif active.default_direction is not None:
            result["@direction"] = active.default_direction
    return result


# ---------------------------------------------------------------------------
# §5.1 Expansion Algorithm
# ---------------------------------------------------------------------------

def _is_node_object(v) -> bool:
    return isinstance(v, dict) and "@value" not in v and "@list" not in v and "@set" not in v


def _is_list_object(v) -> bool:
    return isinstance(v, dict) and "@list" in v


def expansion(
    active: ActiveContext,
    prop: str | None,
    element,
    base_url: str | None,
    loader: OfflineLoader,
    from_map: bool = False,
):
    if element is None:
        return None

    td = active.terms.get(prop) if prop else None

    if not isinstance(element, (dict, list)):
        if prop is None or prop == "@graph":
            return None
        if td is not None and td.has_context:
            active = process_context(active, td.context, td.base_url, loader,
                                     override_protected=True)
        return _expand_value(active, prop, element)

    if isinstance(element, list):
        result = []
        for item in element:
            expanded = expansion(active, prop, item, base_url, loader, from_map)
            container = td.container if td else frozenset()
            if "@list" in container and isinstance(expanded, list):
                expanded = {"@list": expanded}
            if isinstance(expanded, list):
                result.extend(expanded)
            elif expanded is not None:
                result.append(expanded)
        return result

    # element is a dict ------------------------------------------------------
    # expand every key ONCE; the map is reused by the previous-context
    # check, the type-scope scan, and the entry loop (unless a
    # type-scoped context changes the active context mid-way)
    key_iri = {k: expand_iri(active, k, vocab=True) for k in element if k != "@context"}

    if active.previous_context is not None and not from_map:
        expanded_keys = set(key_iri.values())
        is_subject_ref = len(key_iri) == 1 and len(element) == 1 and expanded_keys == {"@id"}
        if "@value" not in expanded_keys and not is_subject_ref:
            active = active.previous_context
            key_iri = {k: expand_iri(active, k, vocab=True) for k in element if k != "@context"}

    if td is not None and td.has_context:
        active = process_context(active, td.context, td.base_url, loader,
                                 override_protected=True)
        key_iri = {k: expand_iri(active, k, vocab=True) for k in element if k != "@context"}

    if "@context" in element:
        active = process_context(active, element["@context"], base_url, loader)
        key_iri = {k: expand_iri(active, k, vocab=True) for k in element if k != "@context"}

    # type-scoped contexts
    type_scoped = active
    input_type = None
    type_keys = sorted(k for k, e in key_iri.items() if e == "@type")
    for tk in type_keys:
        tv = element[tk]
        # non-string entries are "invalid type value" later in the entry
        # loop; the scoped-context scan must not trip over them first
        for t in (
            sorted(x for x in tv if isinstance(x, str)) if isinstance(tv, list) else [tv]
        ):
            if isinstance(t, str):
                ttd = active.terms.get(t)
                if ttd is not None and ttd.has_context:
                    active = process_context(active, ttd.context, ttd.base_url, loader,
                                             propagate=False)
    if active is not type_scoped:
        key_iri = {k: expand_iri(active, k, vocab=True) for k in element if k != "@context"}
    if type_keys:
        last_key = type_keys[-1]
        lv = element[last_key]
        vals = [v for v in (lv if isinstance(lv, list) else [lv]) if isinstance(v, str)]
        if vals:
            input_type = expand_iri(active, sorted(vals)[-1], vocab=True)

    result: dict = {}
    _expand_entries(active, type_scoped, prop, element, result, base_url, loader, input_type,
                    key_iri)

    if "@value" in result:
        allowed = {"@value", "@language", "@type", "@index", "@direction"}
        if not set(result) <= allowed:
            raise JsonLdError("invalid value object", str(sorted(result)))
        if "@type" in result and ("@language" in result or "@direction" in result):
            raise JsonLdError("invalid value object", "@type with @language/@direction")
        if result.get("@type") == "@json":
            pass
        elif result["@value"] is None:
            return None
        elif "@language" in result and not isinstance(result["@value"], str):
            raise JsonLdError("invalid language-tagged value", repr(result["@value"]))
        elif "@type" in result and not (
            isinstance(result["@type"], str) and _is_abs_iri(result["@type"])
        ):
            raise JsonLdError("invalid typed value", repr(result.get("@type")))
    elif "@type" in result and not isinstance(result["@type"], list):
        result["@type"] = [result["@type"]]
    elif "@set" in result or "@list" in result:
        if not set(result) <= {"@set", "@list", "@index"}:
            raise JsonLdError("invalid set or list object", str(sorted(result)))
        if "@set" in result:
            return result["@set"]

    if isinstance(result, dict):
        if set(result) == {"@language"}:
            return None
        if prop is None or prop == "@graph":
            if not result or "@value" in result or "@list" in result:
                return None
            if set(result) == {"@id"}:
                return None
    return result


def _expand_entries(active, type_scoped, prop, element, result, base_url, loader, input_type,
                    key_iri=None):
    nests = []
    for key in sorted(element):
        if key == "@context":
            continue
        if key_iri is not None:
            expanded_property = key_iri[key]
        else:
            expanded_property = expand_iri(active, key, vocab=True)
        value = element[key]
        if expanded_property is None or not (
            ":" in expanded_property[1:] or _is_keyword(expanded_property)
        ):
            # json-gold drops a term-less key without looking at its value;
            # the engine walks the dropped branch validate-only so structural
            # errors (bad nested contexts, protected redefinitions, malformed
            # value objects) inside it still reject — the stricter behavior
            # the round-2 fixtures pin (a crawl validator should not accept a
            # document whose unreachable half is malformed).
            if isinstance(value, (dict, list)):
                expansion(active, key, value, base_url, loader)
            continue

        if _is_keyword(expanded_property):
            if prop == "@reverse":
                raise JsonLdError("invalid reverse property map", key)
            if expanded_property in result and expanded_property not in ("@included", "@type"):
                raise JsonLdError("colliding keywords", expanded_property)

            if expanded_property == "@id":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @id value", repr(value)[:80])
                result["@id"] = expand_iri(active, value, doc_relative=True)
            elif expanded_property == "@type":
                if not (
                    isinstance(value, str)
                    or (isinstance(value, list) and all(isinstance(v, str) for v in value))
                ):
                    raise JsonLdError("invalid type value", repr(value)[:80])
                vals = value if isinstance(value, list) else [value]
                expanded = [
                    expand_iri(type_scoped, v, vocab=True, doc_relative=True) for v in vals
                ]
                expanded = [e for e in expanded if e is not None]
                if "@type" in result:
                    prev = result["@type"]
                    expanded = (prev if isinstance(prev, list) else [prev]) + expanded
                result["@type"] = expanded if isinstance(value, list) or len(expanded) != 1 else expanded[0]
            elif expanded_property == "@included":
                raw = value if isinstance(value, list) else [value]
                if any(not isinstance(r, dict) for r in raw):
                    raise JsonLdError("invalid @included value")
                included = expansion(active, None, value, base_url, loader)
                included = included if isinstance(included, list) else [included]
                included = [i for i in included if i is not None]
                if not all(_is_node_object(i) for i in included):
                    raise JsonLdError("invalid @included value")
                result.setdefault("@included", []).extend(included)
            elif expanded_property == "@graph":
                g = expansion(active, "@graph", value, base_url, loader)
                result["@graph"] = g if isinstance(g, list) else ([] if g is None else [g])
            elif expanded_property == "@value":
                if input_type == "@json":
                    result["@value"] = value
                elif isinstance(value, (dict, list)):
                    raise JsonLdError("invalid value object value", repr(value)[:80])
                else:
                    result["@value"] = value
            elif expanded_property == "@language":
                if not isinstance(value, str):
                    raise JsonLdError("invalid language-tagged string", repr(value)[:80])
                result["@language"] = value.lower()
            elif expanded_property == "@direction":
                if value not in ("ltr", "rtl"):
                    raise JsonLdError("invalid base direction", repr(value)[:80])
                result["@direction"] = value
            elif expanded_property == "@index":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @index value", repr(value)[:80])
                result["@index"] = value
            elif expanded_property == "@list":
                if prop is None or prop == "@graph":
                    continue
                lst = expansion(active, prop, value, base_url, loader)
                result["@list"] = lst if isinstance(lst, list) else ([] if lst is None else [lst])
            elif expanded_property == "@set":
                result["@set"] = expansion(active, prop, value, base_url, loader)
            elif expanded_property == "@reverse":
                if not isinstance(value, dict):
                    raise JsonLdError("invalid @reverse value", repr(value)[:80])
                rev = expansion(active, "@reverse", value, base_url, loader)
                if isinstance(rev, dict):
                    if "@reverse" in rev:
                        for p, items in rev["@reverse"].items():
                            result.setdefault(p, []).extend(items)
                    rmap = result.setdefault("@reverse", {})
                    for p, items in rev.items():
                        if p == "@reverse":
                            continue
                        for item in items if isinstance(items, list) else [items]:
                            if not _is_node_object(item):
                                raise JsonLdError("invalid reverse property value", p)
                            rmap.setdefault(p, []).append(item)
                    if not result["@reverse"]:
                        del result["@reverse"]
            elif expanded_property == "@nest":
                nests.append(key)
            # @protected/@version etc. inside a node are dropped
            continue

        td = active.terms.get(key)
        container = td.container if td else frozenset()

        if td is not None and td.type_mapping == "@json":
            expanded_value = {"@value": value, "@type": "@json"}
        elif "@language" in container and isinstance(value, dict):
            expanded_value = []
            for lang in sorted(value):
                items = value[lang]
                for item in items if isinstance(items, list) else [items]:
                    if item is None:
                        continue
                    if not isinstance(item, str):
                        raise JsonLdError("invalid language map value", repr(item)[:80])
                    v = {"@value": item}
                    if lang != "@none" and expand_iri(active, lang, vocab=True) != "@none":
                        v["@language"] = lang.lower()
                    if td.has_direction:
                        if td.direction is not None:
                            v["@direction"] = td.direction
                    elif active.default_direction is not None:
                        v["@direction"] = active.default_direction
                    expanded_value.append(v)
        elif container & {"@index", "@type", "@id"} and isinstance(value, dict):
            expanded_value = []
            for k in sorted(value):
                items = value[k]
                map_ctx = active
                if "@type" in container:
                    ktd = active.terms.get(k)
                    if ktd is not None and ktd.has_context:
                        map_ctx = process_context(active, ktd.context, ktd.base_url, loader)
                elif "@id" in container:
                    ktd = active.terms.get(k)
                    if ktd is not None and ktd.has_context:
                        map_ctx = process_context(active, ktd.context, ktd.base_url, loader)
                items = items if isinstance(items, list) else [items]
                expanded_items = expansion(map_ctx, key, items, base_url, loader, from_map=True)
                for item in expanded_items if isinstance(expanded_items, list) else [expanded_items]:
                    if item is None:
                        continue
                    if "@graph" in container and not (isinstance(item, dict) and "@graph" in item):
                        item = {"@graph": item if isinstance(item, list) else [item]}
                    k_exp = expand_iri(map_ctx, k, vocab=True)
                    if "@index" in container and k_exp != "@none":
                        if td.index is not None:
                            # property-valued index (1.1)
                            idx_val = expansion(map_ctx, td.index, k, base_url, loader)
                            idx_prop = expand_iri(map_ctx, td.index, vocab=True)
                            if isinstance(item, dict):
                                prev = item.get(idx_prop, [])
                                item[idx_prop] = ([idx_val] if not isinstance(idx_val, list) else idx_val) + (
                                    prev if isinstance(prev, list) else [prev]
                                )
                        elif isinstance(item, dict) and "@index" not in item:
                            item["@index"] = k
                    elif "@id" in container and k_exp != "@none":
                        if isinstance(item, dict) and "@id" not in item:
                            item["@id"] = expand_iri(map_ctx, k, doc_relative=True)
                    elif "@type" in container and k_exp != "@none":
                        if isinstance(item, dict):
                            prev = item.get("@type", [])
                            item["@type"] = [k_exp] + (prev if isinstance(prev, list) else [prev])
                    expanded_value.append(item)
        elif value is None:
            continue
        elif not isinstance(value, (dict, list)) and not (td is not None and td.has_context):
            # inline scalar fast path — identical to expansion()'s scalar
            # branch with a non-null active property and no scoped context
            expanded_value = _expand_value(active, key, value)
        else:
            expanded_value = expansion(active, key, value, base_url, loader)

        if expanded_value is None:
            continue

        if "@list" in container and not _is_list_object(expanded_value):
            expanded_value = {"@list": expanded_value if isinstance(expanded_value, list) else [expanded_value]}
        if "@graph" in container and not container & {"@id", "@index"}:
            items = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            expanded_value = [{"@graph": i if isinstance(i, list) else [i]} for i in items]

        if td is not None and td.reverse:
            rmap = result.setdefault("@reverse", {})
            items = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            for item in items:
                if not _is_node_object(item):
                    raise JsonLdError("invalid reverse property value", key)
                rmap.setdefault(td.iri, []).append(item)
        else:
            items = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            result.setdefault(expanded_property, []).extend(items)

    for nkey in sorted(nests):
        nvs = element[nkey]
        for nv in nvs if isinstance(nvs, list) else [nvs]:
            if not isinstance(nv, dict) or any(
                expand_iri(active, k, vocab=True) == "@value" for k in nv
            ):
                raise JsonLdError("invalid @nest value", nkey)
            _expand_entries(active, type_scoped, prop, nv, result, base_url, loader, input_type)


def expand(doc, loader: OfflineLoader | None = None, base: str | None = None) -> list:
    """Expand a parsed JSON-LD document; raises JsonLdError on any
    context-processing or expansion error (= json-gold ToRDF rejection)."""
    loader = loader or OfflineLoader()
    active = ActiveContext(base=base)
    result = expansion(active, None, doc, base, loader)
    if isinstance(result, dict) and set(result) == {"@graph"}:
        result = result["@graph"]
    if result is None:
        return []
    return result if isinstance(result, list) else [result]


class Expander:
    """Per-actor expansion engine with a processed-context cache.

    A crawl batch is thousands of documents sharing a handful of
    distinct ``@context`` values (every schema.org page carries the same
    one), so the context-processing half of expansion — remote load +
    term-definition creation — is memoised on the canonical JSON of the
    top-level context value. The cached ``ActiveContext`` is never
    mutated by later expansions (``process_context`` always works on a
    copy), so sharing it across documents is safe. Build once per actor
    (ST1 state, the reference's processor-factory fix at
    jsonutils.go:69: json-gold rebuilds its processor per call)."""

    def __init__(self, loader: OfflineLoader | None = None, base: str | None = None,
                 cache_size: int = 512):
        self.loader = loader or OfflineLoader()
        self.base = base
        self.cache_size = cache_size
        self._cache: dict[str, ActiveContext] = {}

    def _top_context(self, ctx) -> ActiveContext:
        # repr preserves insertion order and is C-speed; two docs spelling
        # the same context in a different key order just occupy two cache
        # slots, which is harmless
        key = ctx if isinstance(ctx, str) else repr(ctx)
        if key is not None and key in self._cache:
            return self._cache[key]
        active = process_context(ActiveContext(base=self.base), ctx, self.base, self.loader)
        if key is not None:
            if len(self._cache) >= self.cache_size:
                self._cache.clear()
            self._cache[key] = active
        return active

    def expand(self, doc) -> list:
        if isinstance(doc, dict) and "@context" in doc:
            active = self._top_context(doc["@context"])
            body = {k: v for k, v in doc.items() if k != "@context"}
            result = expansion(active, None, body, self.base, self.loader)
        else:
            result = expansion(ActiveContext(base=self.base), None, doc, self.base, self.loader)
        if isinstance(result, dict) and set(result) == {"@graph"}:
            result = result["@graph"]
        if result is None:
            return []
        return result if isinstance(result, list) else [result]


# ---------------------------------------------------------------------------
# §8 Deserialize JSON-LD to RDF (node map generation + RDF emission)
# ---------------------------------------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _escape_nq(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        .replace("\r", "\\r").replace("\t", "\\t")
    )


def _canonical_double(v: float) -> str:
    """xsd:double canonical lexical form (what json-gold emits):
    mantissa with no trailing zeros, E exponent with no leading zeros."""
    m, _, e = ("%1.15E" % v).partition("E")
    m = m.rstrip("0").rstrip(".")
    if "." not in m:
        m += ".0"
    exp = int(e)
    return "%sE%d" % (m, exp)


def _literal_token(value_obj: dict) -> str | None:
    v = value_obj.get("@value")
    dt = value_obj.get("@type")
    lang = value_obj.get("@language")
    if dt == "@json":
        return '"%s"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>' % _escape_nq(
            json.dumps(v, sort_keys=True, separators=(",", ":"))
        )
    if isinstance(v, bool):
        s = "true" if v else "false"
        return '"%s"^^<%sboolean>' % (s, dt or _XSD + "boolean") if dt in (None, _XSD + "boolean") else '"%s"^^<%s>' % (s, dt)
    if isinstance(v, int):
        return '"%d"^^<%s>' % (v, dt or _XSD + "integer")
    if isinstance(v, float):
        if v.is_integer() and dt in (None, _XSD + "integer"):
            # JSON numbers with no fraction and integer value are xsd:integer
            return '"%d"^^<%s>' % (int(v), dt or _XSD + "integer")
        return '"%s"^^<%s>' % (_canonical_double(v), dt or _XSD + "double")
    if v is None:
        return None
    s = _escape_nq(str(v))
    if dt is not None and dt != _XSD + "string":
        return '"%s"^^<%s>' % (s, dt)
    if lang:
        return '"%s"@%s' % (s, lang)
    return '"%s"' % s


class _NodeMap:
    def __init__(self):
        self.graphs: dict[str, dict] = {"@default": {}}
        self._n = 0
        self._bnode_map: dict[str, str] = {}

    def bnode(self, old: str | None = None) -> str:
        if old is not None:
            if old not in self._bnode_map:
                self._bnode_map[old] = "_:b%d" % self._n
                self._n += 1
            return self._bnode_map[old]
        b = "_:b%d" % self._n
        self._n += 1
        return b

    def node(self, graph: str, nid: str) -> dict:
        g = self.graphs.setdefault(graph, {})
        return g.setdefault(nid, {"@id": nid})


def _nm_generate(element, nm: _NodeMap, graph: str = "@default",
                 subject=None, prop=None, lst: list | None = None):
    """Node Map Generation (spec §8.1) over EXPANDED input."""
    if isinstance(element, list):
        for item in element:
            _nm_generate(item, nm, graph, subject, prop, lst)
        return
    if not isinstance(element, dict):
        return
    if "@type" in element and "@value" not in element:
        # node-object @type is a list post-expansion; a value object's
        # @type is a scalar ("@json" or a datatype IRI) and must not be
        # touched here
        ts = element["@type"]
        element["@type"] = [
            nm.bnode(t) if isinstance(t, str) and t.startswith("_:") else t
            for t in (ts if isinstance(ts, list) else [ts])
        ]
    if "@value" in element:
        if lst is not None:
            lst.append(element)
        elif subject is not None:
            node = nm.node(graph, subject)
            node.setdefault(prop, [])
            if element not in node[prop]:
                node[prop].append(element)
        return
    if "@list" in element:
        sub: list = []
        _nm_generate(element["@list"], nm, graph, subject, prop, sub)
        entry = {"@list": sub}
        if lst is not None:
            lst.append(entry)
        elif subject is not None:
            nm.node(graph, subject).setdefault(prop, []).append(entry)
        return
    # node object
    nid = element.get("@id")
    if nid is None:
        nid = nm.bnode()
    elif isinstance(nid, str) and nid.startswith("_:"):
        nid = nm.bnode(nid)
    node = nm.node(graph, nid)
    if subject is not None:
        ref = {"@id": nid}
        if lst is not None:
            lst.append(ref)
        else:
            p = nm.node(graph, subject).setdefault(prop, [])
            if ref not in p:
                p.append(ref)
    if "@type" in element:
        for t in element["@type"]:
            ts = node.setdefault("@type", [])
            if t not in ts:
                ts.append(t)
    if "@index" in element:
        node["@index"] = element["@index"]
    if "@reverse" in element:
        for rp, rvals in element["@reverse"].items():
            for rv in rvals:
                _nm_generate(rv, nm, graph, None, None)
                rv_id = rv.get("@id")
                if rv_id is None:
                    continue
                rv_node = nm.node(graph, nm.bnode(rv_id) if rv_id.startswith("_:") else rv_id)
                p = rv_node.setdefault(rp, [])
                ref = {"@id": nid}
                if ref not in p:
                    p.append(ref)
    if "@graph" in element:
        _nm_generate(element["@graph"], nm, nid, None, None)
    if "@included" in element:
        _nm_generate(element["@included"], nm, graph, None, None)
    for key in sorted(element):
        if key in ("@id", "@type", "@index", "@reverse", "@graph", "@included"):
            continue
        if key.startswith("@") and key not in ("@id",):
            if key in ("@value", "@list"):
                continue
            if not (":" in key[1:]):
                continue
        _nm_generate(element[key], nm, graph, nid, key)


def _emit_quads(nm: _NodeMap, keep_relative: bool, graph_name: str | None = None):
    """RDF emission over the node map — quad tuples in urdna format:
    (subject_token, predicate_iri, object_token, graph). json-gold
    parity: subjects must be absolute IRIs or blank nodes (a relative
    @id silently drops the node's quads); relative OBJECT IRIs (bare
    @type terms with no vocab) survive only in ``keep_relative`` mode —
    the reference's Normalize goldens pin both behaviors."""
    quads: list[tuple] = []
    counter = [0]

    def list_bnode() -> str:
        b = "_:l%d" % counter[0]
        counter[0] += 1
        return b

    def ok_subject(s: str) -> bool:
        return s.startswith("_:") or _is_abs_iri(s)

    def fmt(t: str) -> str:
        return t if t.startswith("_:") else "<%s>" % t

    def object_token(v, out: list) -> str | None:
        """Token for an object value; list objects allocate rdf list
        triples into ``out``."""
        if "@list" in v:
            items = v["@list"]
            if not items:
                return fmt(_RDF_NIL)
            head = list_bnode()
            cur = head
            for i, item in enumerate(items):
                tok = object_token(item, out) if "@list" in item else _simple_token(item)
                if tok is not None:
                    out.append((cur, _RDF_FIRST, tok, graph_name))
                nxt = list_bnode() if i + 1 < len(items) else fmt(_RDF_NIL)
                out.append((cur, _RDF_REST, nxt if i + 1 == len(items) else nxt, graph_name))
                if i + 1 < len(items):
                    cur = nxt
            return head
        return _simple_token(v)

    def _simple_token(v) -> str | None:
        if "@value" in v:
            return _literal_token(v)
        o = v.get("@id")
        if not isinstance(o, str):
            return None
        if o.startswith("_:") or _is_abs_iri(o) or keep_relative:
            return fmt(o)
        return None

    for gname in sorted(nm.graphs):
        g = nm.graphs[gname]
        if gname == "@default":
            gtok = graph_name
        elif gname.startswith("_:") or _is_abs_iri(gname):
            gtok = gname
        else:
            continue
        for nid in g:
            if not ok_subject(nid):
                continue
            node = g[nid]
            for t in node.get("@type", []):
                if isinstance(t, str) and (
                    t.startswith("_:") or _is_abs_iri(t) or keep_relative
                ):
                    quads.append((nid, _RDF_TYPE, fmt(t), gtok))
            for key in sorted(node):
                if key.startswith("@"):
                    continue
                for v in node[key]:
                    extra: list = []
                    tok = object_token(v, extra)
                    if tok is not None:
                        quads.append((nid, key, tok, gtok))
                    quads.extend(extra)
    return quads


def expanded_to_quads(expanded, keep_relative: bool = False, graph_name: str | None = None):
    nm = _NodeMap()
    _nm_generate(expanded, nm)
    return _emit_quads(nm, keep_relative, graph_name)
