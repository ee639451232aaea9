"""Golden tests for the JSON-LD fixups, ported from the reference's own
table-driven suite (/root/reference/internal/summoner/acquire/jsonutils_test.go).
Exact-equality assertions there stay exact here; JSONEq assertions there
are checked semantically (json.loads equality) plus our byte layout."""

import json

import pytest

from gleaner_ray import fixups, jsonpatch
from gleaner_ray.config import ContextOption
from gleaner_ray.jsonld_lite import Validator

CONTEXT_OBJECT_JSON = """{
        "@context": {
            "@vocab":"http://schema.org/"
        },
        "@type":"bar",
        "SO:name":"Some type in a graph"
    }"""

CONTEXT_STRING_JSON = """{
        "@context": "http://schema.org/",
        "@type":"bar",
        "SO:name":"Some type in a graph"
    }"""

CONTEXT_OBJECT_GRAPH_JSON = open(
    "/root/reference/internal/summoner/acquire/testdata/jsonutils/contextObjectGraphJson.json"
).read()

VALID_JSON = """{
    "@graph":[
        {
            "@context": {
                "SO":"http://schema.org/"
            },
            "@type":"bar",
            "SO:name":"Some type in a graph"
        }
    ]
}"""

INVALID_JSON = """This isn't JSON at all:"."""


def jsoneq(a: str, b: str):
    assert json.loads(a) == json.loads(b)


class TestContextStringFix:
    def test_rewrites_string_context(self):
        # jsonutils_test.go:146-150 (JSONEq)
        result = fixups.fix_context_string(CONTEXT_STRING_JSON)
        jsoneq(result, """{"@context": {"@vocab":"http://schema.org/"},
                           "@type":"bar", "SO:name":"Some type in a graph"}""")

    def test_no_change_when_object(self):
        # jsonutils_test.go:152-156 (exact)
        assert fixups.fix_context_string(CONTEXT_OBJECT_JSON) == CONTEXT_OBJECT_JSON

    def test_no_change_when_object_v2(self):
        assert fixups.fix_context_string(CONTEXT_OBJECT_GRAPH_JSON) == CONTEXT_OBJECT_GRAPH_JSON

    def test_no_change_when_array(self):
        local_ns = """{
        "@context": [\t
\t\t\t\t "https://schema.org/",
\t\t\t{
\t\t\t\t"NAME": "schema:name",
\t\t\t\t"census_profile": {
\t\t\t\t"@id": "schema:subjectOf",
\t\t\t\t"@type": "@id"
\t\t\t}
\t\t\t}
        ],
      "@type":"bar",
      "SO:name":"Some type in a graph"
    }"""
        assert fixups.fix_context_string(local_ns) == local_ns


class TestContextUrlFix:
    CASES = [
        # (input context fragment, description) — jsonutils_test.go:172-295
        ('{"@context": {"@vocab":"https://schema.org"},"@type":"bar"}', "no slash"),
        ('{"@context": {"@vocab":"http://schema.org/"},"@type":"bar"}', "http"),
        ('{"@context": {"@vocab":"http://schema.org"},"@type":"bar"}', "http no slash"),
    ]

    @pytest.mark.parametrize("doc,desc", CASES)
    def test_vocab_normalized(self, doc, desc):
        result = fixups.fix_context_url(doc, fixups.HTTPS_CONTEXT)
        assert json.loads(result)["@context"]["@vocab"] == "https://schema.org/"

    @pytest.mark.parametrize(
        "doc",
        [
            '{"@context": {"@vocab":"https://schema.org","schema":"https://schema.org"},"@type":"bar"}',
            '{"@context": {"@vocab":"http://schema.org/","schema":"http://schema.org/"},"@type":"bar"}',
            '{"@context": {"@vocab":"http://schema.org","schema":"http://schema.org"},"@type":"bar"}',
        ],
    )
    def test_all_members_normalized(self, doc):
        result = fixups.fix_context_url(doc, fixups.HTTPS_CONTEXT)
        ctx = json.loads(result)["@context"]
        assert ctx == {"@vocab": "https://schema.org/", "schema": "https://schema.org/"}

    def test_www_schema_org(self):
        # reference quirk (jsonutils.go:154-158): the www. branch prepends
        # ctx to the suffix starting at "schema.org", yielding
        # "https://schema.org/schema.org" — reproduced deliberately
        doc = '{"@context": {"@vocab":"http://www.schema.org"},"@type":"bar"}'
        result = fixups.fix_context_url(doc, fixups.HTTPS_CONTEXT)
        assert json.loads(result)["@context"]["@vocab"] == "https://schema.org/schema.org"

    def test_golden_graph_fixture(self):
        # jsonutils_test.go:276-293 against the on-disk fixture pair.
        # NOTE: the fixture predates the @vocab insertion at
        # jsonutils.go:147-149 — the Go source inserts @vocab when the
        # context lacks one, so we assert fixture ∪ {@vocab} (source-code
        # behavior wins over the stale fixture).
        expected = json.loads(
            open(
                "/root/reference/internal/summoner/acquire/testdata/jsonutils/expectedContextObjGraph.json"
            ).read()
        )
        expected["@context"]["@vocab"] = "https://schema.org/"
        result = fixups.fix_context_url(CONTEXT_OBJECT_GRAPH_JSON, fixups.HTTPS_CONTEXT)
        assert json.loads(result) == expected

    def test_inserts_vocab_when_missing(self):
        doc = '{"@context": {"SO":"http://schema.org/"},"@type":"bar"}'
        result = fixups.fix_context_url(doc, fixups.HTTPS_CONTEXT)
        ctx = json.loads(result)["@context"]
        assert ctx["@vocab"] == "https://schema.org/"
        assert ctx["SO"] == "https://schema.org/"

    def test_creates_context_when_missing(self):
        # sjson creates intermediate objects: doc without @context gains one
        doc = '{"@type":"bar"}'
        result = fixups.fix_context_url(doc, fixups.HTTPS_CONTEXT)
        assert json.loads(result)["@context"] == {"@vocab": "https://schema.org/"}


class TestContextArrayFix:
    ARRAY_DOC = """{
        "@context": [
            {"@vocab": "https://schema.org/"},
            {"@vocab": "https://schema.org/", "NAME": "schema:name",
             "census_profile": {"@id": "schema:subjectOf", "@type": "@id"}}
        ],
     "@type":"bar",
      "SO:name":"Some type in a graph"
    }"""

    def test_array_standardized(self):
        # jsonutils_test.go:383-388: arrays become the standardized context
        result = fixups.fix_context_array(self.ARRAY_DOC, ContextOption.HTTPS)
        assert json.loads(result)["@context"] == fixups.STANDARD_HTTPS_CONTEXT

    def test_object_untouched(self):
        assert fixups.fix_context_array(CONTEXT_OBJECT_JSON, ContextOption.HTTPS) == CONTEXT_OBJECT_JSON

    def test_string_element_array_standardized(self):
        doc = '{"@context": ["https://schema.org/", {"NAME": "schema:name"}], "@type":"bar"}'
        result = fixups.fix_context_array(doc, ContextOption.HTTPS)
        assert json.loads(result)["@context"] == fixups.STANDARD_HTTPS_CONTEXT


class TestIdIRIFix:
    """Exact-equality ports of jsonutils_test.go:410-544."""

    def test_no_change_with_base(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/",
\t\t\t\t"@base": "http://valid-json.com"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "some_cool_guid"
\t\t}
\t\t"""
        assert fixups.fix_id(doc) == doc

    def test_no_change_full_iri(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "http://www.test.com/some_cool_guid"
\t\t}
\t\t"""
        assert fixups.fix_id(doc) == doc

    def test_relative_id_becomes_file_url(self):
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type": "Dataset",
\t\t\t"@id": "some_cool_guid"
\t\t}
\t\t"""
        expected = doc.replace('"some_cool_guid"', '"file://some_cool_guid"')
        assert fixups.fix_id(doc) == expected

    def test_itemlist_ids_fixed_in_malformed_json(self):
        # the reference fixture is intentionally malformed JSON (missing
        # commas) — gjson/sjson tolerate it and so must we
        doc = """
\t\t{
\t\t\t"@context": \t{
\t\t\t\t"@vocab": "https://schema.org/"
\t\t\t},
\t\t\t"@type":"ItemList",
\t\t\t"@id": "Some id we do not need to worry about"
\t   \t\t"itemListElement":
\t   \t\t[
\t\t\t\t{
\t\t\t\t\t"@type": "ListItem",
\t\t\t\t\t"@id": "A list item id, perhaps"
\t\t\t\t\t"item": {
\t\t\t\t\t\t"@type": "Dataset",
\t\t\t\t\t\t"@id": "some_cool_guid"
\t\t\t\t\t}
\t\t\t\t},
\t\t\t\t{
\t\t\t\t\t"@type": "ListItem",
\t\t\t\t\t"@id": "A list item id, perhaps"
\t\t\t\t\t"item": {
\t\t\t\t\t\t"@type": "Dataset",
\t\t\t\t\t\t"@id": "another_cool_guid"
\t\t\t\t\t}
\t\t\t\t},
\t\t\t]
\t\t}
\t\t"""
        expected = doc.replace('"some_cool_guid"', '"file://some_cool_guid"').replace(
            '"another_cool_guid"', '"file://another_cool_guid"'
        )
        assert fixups.fix_id(doc) == expected


class TestValidator:
    def test_valid_jsonld(self):
        v = Validator()
        valid, err = v.is_valid(VALID_JSON)
        assert valid and err is None

    def test_valid_fixture_file(self):
        v = Validator()
        src = open("/root/reference/internal/summoner/acquire/testdata/jsonutils/validJson.json").read()
        valid, err = v.is_valid(src)
        assert valid and err is None

    def test_invalid_jsonld(self):
        v = Validator()
        valid, err = v.is_valid(INVALID_JSON)
        assert not valid and err is not None

    def test_bad_fixture_invalid(self):
        v = Validator()
        src = open("/root/reference/testHelpers/sampleConfigs/badjsonld.jsonld").read()
        valid, err = v.is_valid(src)
        assert not valid and err is not None

    def test_toplevel_array_errors(self):
        v = Validator()
        valid, err = v.is_valid('[{"@type": "Dataset"}]')
        assert not valid and err is not None


class TestValidatorExpansionDepth:
    """Expansion-level rejections that json-gold's ToRDF raises deep
    inside context processing (jsonutils.go:69-96 via ldproc.go) — a
    curated surface check would wrongly accept every one of these.
    Fixtures follow the JSON-LD 1.1 expansion error codes json-gold
    implements (cyclic IRI mapping, protected term redefinition,
    invalid container mapping, invalid IRI mapping, invalid @propagate
    value)."""

    def _invalid(self, doc: str) -> str:
        valid, err = Validator().is_valid(doc)
        assert not valid and err is not None, doc
        return err

    def test_cyclic_iri_mapping_self(self):
        err = self._invalid('{"@context": {"a": "a:suffix"}, "a:name": "v"}')
        assert "cyclic" in err

    def test_cyclic_iri_mapping_chain(self):
        err = self._invalid('{"@context": {"a": "b:x", "b": "a:y"}, "a:name": "v"}')
        assert "cyclic" in err

    def test_http_like_term_is_not_a_cycle(self):
        # a compact-IRI suffix starting with // is an absolute IRI —
        # {"http": ...} must not make "http://x" a prefix reference
        v = Validator()
        ok, err = v.is_valid(
            '{"@context": {"http": "https://schema.org/http"}, "@id": "http://x.org/1"}'
        )
        assert ok, err

    def test_protected_term_redefinition_in_nested_context(self):
        doc = json.dumps(
            {
                "@context": {"@protected": True, "name": "https://schema.org/name"},
                "name": "outer",
                "child": {
                    "@context": {"name": "https://example.org/other-name"},
                    "name": "inner",
                },
            }
        )
        err = self._invalid(doc)
        assert "protected" in err

    def test_identical_protected_redefinition_is_legal(self):
        doc = json.dumps(
            {
                "@context": {"@protected": True, "name": "https://schema.org/name"},
                "child": {
                    "@context": {"@protected": True, "name": "https://schema.org/name"},
                    "name": "inner",
                },
            }
        )
        ok, err = Validator().is_valid(doc)
        assert ok, err

    def test_invalid_container_mapping(self):
        doc = (
            '{"@context": {"tags": {"@id": "https://schema.org/keywords",'
            ' "@container": "@bogus"}}, "tags": ["a"]}'
        )
        err = self._invalid(doc)
        assert "container" in err

    def test_invalid_iri_mapping_keyword_like(self):
        err = self._invalid('{"@context": {"foo": "@bogus"}, "foo": 1}')
        assert "IRI mapping" in err

    def test_invalid_propagate_value(self):
        err = self._invalid('{"@context": {"@propagate": "yes"}, "@type": "Dataset"}')
        assert "@propagate" in err

    def test_invalid_scoped_context(self):
        doc = (
            '{"@context": {"t": {"@id": "https://schema.org/t", "@context": 5}},'
            ' "t": "x"}'
        )
        err = self._invalid(doc)
        assert "scoped" in err or "context" in err

    def test_keyword_alias_still_legal(self):
        # simple keyword aliasing is legal 1.1 — must stay accepted
        ok, err = Validator().is_valid(
            '{"@context": {"id": "@id", "type": "@type"}, "id": "https://x.org/1", "type": "Dataset"}'
        )
        assert ok, err


class TestAddToJsonListIfValid:
    def test_appends_valid(self):
        v = Validator()
        out, err = fixups.add_to_json_list_if_valid(["test"], VALID_JSON, v)
        assert out == ["test", VALID_JSON] and err is None

    def test_rejects_invalid(self):
        v = Validator()
        out, err = fixups.add_to_json_list_if_valid(["test"], INVALID_JSON, v)
        assert out == ["test"] and err is not None

    def test_graph_array_explodes_plus_original(self):
        # jsonutils.go:29-31 quirk: elements + the original string
        v = Validator()
        arr = '[{"@type":"Dataset","name":"a"},{"@type":"Dataset","name":"b"}]'
        out, err = fixups.add_to_json_list_if_valid(["prior"], arr, v)
        assert err is None
        assert out == [
            '{"@type":"Dataset","name":"a"}',
            '{"@type":"Dataset","name":"b"}',
            arr,
        ]


class TestProcessJson:
    def test_full_chain(self):
        doc = '{"@context": "http://schema.org", "@type": "Dataset", "@id": "rel_id"}'
        out = fixups.process_json(doc, ContextOption.HTTPS, context_strict=False)
        parsed = json.loads(out)
        assert parsed["@context"]["@vocab"] == "https://schema.org/"
        assert parsed["@id"] == "file://rel_id"

    def test_strict_skips(self):
        doc = '{"@context": "http://schema.org", "@type": "Dataset", "@id": "rel_id"}'
        out = fixups.process_json(doc, ContextOption.STRICT, context_strict=True)
        assert out == doc


class TestFastPathEquivalence:
    """The json.loads fast path must agree byte-for-byte with the exact
    splice path on every corpus payload class."""

    def test_fast_equals_slow_on_corpus_classes(self, monkeypatch):
        from gleaner_ray.sources.synth import CLASSES, _payload

        docs = []
        for i, cls in enumerate(CLASSES):
            url = "https://h.example.org/ref/%s/%d" % (cls, i)
            docs.append(_payload(cls, url, "Dataset %d" % i, 'desc with "quotes" and text'))
        docs += [
            '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","@id":"https://x/1"}',
            '{"@context":{"@vocab":"https://schema.org/","@base":"https://b/"},"@type":"Dataset","@id":"rel"}',
            '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset"}',
            '{"@type":"Thing","name":"no context"}',
            '{"@context":{"@vocab":"https://schema.org/","x":{"@id":"schema:x"}},"@type":"Thing"}',
            '{"@context":{"@vocab":"https://schema.org/"},"@type":["Dataset"],"@id":"rel"}',
            # shapes the analytic splice fast path claims (string/array
            # @context wraps, relative-@id rewrite) and near-misses
            '{"@context":"https://schema.org/","@type":"Dataset","name":"s"}',
            '{"@context": "https://schema.org/" , "@type":"Dataset","@id":"https://x/1"}',
            '{"@context":"https://schema.org/","@type":"Dataset","@id":"relative/path"}',
            '{"@context":"http://www.schema.org/","@type":"Dataset","name":"www rewrite"}',
            '{"@context":"schema.org","@type":"Dataset","name":"short rewrite"}',
            '{"@context":["https://schema.org","https://x/ctx"],"@type":"Dataset","name":"arr"}',
            '{"@context":[{"@vocab":"https://schema.org/"}],"@type":"Dataset","@id":"rel2"}',
            '{"@context":"https://schema.org/","@type":"ItemList","itemListElement":'
            '[{"item":{"@id":"rel-item"}}]}',
            '{"@context":"https://schema.org/","@type":"ItemList","itemListElement":[]}',
            '{"@context":"https://schema.org/","@type":"Dataset","@id":"a b","nested":{"@id":"x"}}',
            '{"@context":"https://schema.org/","note":"@context mentioned","@type":"Dataset"}',
            '{"@context":{"@vocab":"https://schema.org/","@base":""},"@type":"Dataset","@id":"rel3"}',
            # @vocab insertion splices (absent @context / vocab-less map)
            '{"@type":"Dataset","name":"no ctx at all"}',
            '{"@type":"Dataset","name":"no ctx rel id","@id":"rel4"}',
            '{"@context":{"SO":"https://schema.org/"},"@type":"SO:Dataset","name":"prefixed"}',
            '{"@context":{},"@type":"Dataset","name":"empty ctx"}',
            # member rewrite splices inside an object @context
            '{"@context":{"@vocab":"http://schema.org"},"@type":"Dataset","@id":"https://x/ok"}',
            '{"@context":{"@vocab":"https://www.schema.org/"},"@type":"Dataset","name":"www"}',
            '{"@context":{"@vocab":"https://schema.org/","dc":"schema.org"},"@type":"Thing"}',
            '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","name":"a<b&c"}',
            "{}",
        ]
        for doc in docs:
            fast = fixups.process_json(doc, ContextOption.HTTPS, False)
            monkeypatch.setattr(fixups, "_fast_fixups", lambda *a, **k: None)
            slow = fixups.process_json(doc, ContextOption.HTTPS, False)
            monkeypatch.undo()
            assert fast == slow, doc


class TestValidatorExpansionFailures:
    """Structurally-plausible documents that json-gold rejects during
    EXPANSION (not parse): each case mirrors a named json-gold error so
    accept/reject parity is pinned beyond the synthetic corpus."""

    def test_invalid_version_value(self):
        v = Validator()
        ok, err = v.is_valid('{"@context": {"@version": 1.0}, "@type": "Dataset"}')
        assert not ok and "@version" in err

    def test_version_11_accepted(self):
        v = Validator()
        ok, err = v.is_valid(
            '{"@context": {"@version": 1.1, "@vocab": "https://schema.org/"}, "@type": "Dataset"}'
        )
        assert ok and err is None

    def test_invalid_base_iri(self):
        v = Validator()
        ok, err = v.is_valid('{"@context": {"@base": 7}, "@type": "Dataset"}')
        assert not ok and "base" in err

    def test_invalid_vocab_mapping(self):
        v = Validator()
        ok, err = v.is_valid('{"@context": {"@vocab": ["x"]}, "@type": "Dataset"}')
        assert not ok and "vocab" in err

    def test_keyword_redefinition(self):
        v = Validator()
        ok, err = v.is_valid('{"@context": {"@id": "https://x/id"}, "@type": "Dataset"}')
        assert not ok and "keyword redefinition" in err

    def test_invalid_reverse_value(self):
        v = Validator()
        ok, err = v.is_valid('{"@context": {"@vocab": "https://schema.org/"}, "@reverse": "name"}')
        assert not ok and "@reverse" in err

    def test_invalid_language_tagged_string(self):
        v = Validator()
        ok, err = v.is_valid('{"name": {"@value": "x", "@language": 5}}')
        assert not ok and "language" in err

    def test_reverse_object_form_accepted(self):
        v = Validator()
        ok, err = v.is_valid(
            '{"@context": {"@vocab": "https://schema.org/"}, '
            '"@reverse": {"isPartOf": {"@id": "https://x/child"}}}'
        )
        assert ok and err is None


class TestContextMapFileLoading:
    """contextmaps URL->file entries load the actual file content as the
    remote context (json-gold PreloadWithMapping, ldproc.go:40-56); a
    missing file degrades to a resolvable synthetic vocab context."""

    REAL = "/root/reference/internal/common/testdata/schemaorg-current-https.jsonld"

    def test_real_context_file_terms_resolve(self):
        v = Validator(context_maps={"https://example.org/ctx": self.REAL})
        # dcterms prefix comes from the loaded file's prefix map
        ok, err = v.is_valid(
            '{"@context": "https://example.org/ctx", "dcterms:title": "t",'
            ' "@id": "https://x.org/1"}'
        )
        assert ok, err
        out = v._expander.expand(
            {"@context": "https://example.org/ctx", "dcterms:title": "t",
             "@id": "https://x.org/1"}
        )
        assert out[0]["http://purl.org/dc/terms/title"] == [{"@value": "t"}]

    def test_missing_file_still_resolvable(self):
        v = Validator(context_maps={"https://example.org/ctx": "/nonexistent/f.jsonld"})
        ok, err = v.is_valid('{"@context": "https://example.org/ctx", "@id": "https://x/1"}')
        assert ok, err

    def test_unmapped_url_still_fails(self):
        v = Validator(context_maps={"https://example.org/ctx": self.REAL})
        ok, err = v.is_valid('{"@context": "https://other.example/ctx", "@id": "https://x/1"}')
        assert not ok and "loading remote context" in err
