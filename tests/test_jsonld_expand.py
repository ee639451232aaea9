"""Tests for the full JSON-LD 1.1 expansion engine (jsonld_expand.py).

The engine is the validator authority (jsonutils.go:69-96: isValid =
json-gold ToRDF completes). Beyond the accept/reject fixtures in
test_fixups.py, these pin EXPANDED OUTPUT shapes for the algorithm's
branches — value expansion, containers, maps, @reverse, @nest, scoped
and propagated contexts — against hand-derived expected forms from the
W3C JSON-LD 1.1 spec examples.
"""

import json

import pytest

from gleaner_ray.jsonld_expand import (
    Expander,
    JsonLdError,
    OfflineLoader,
    expand,
)

SCHEMA = {"@vocab": "https://schema.org/"}


def ex(doc):
    return expand(doc if isinstance(doc, dict) else json.loads(doc))


class TestValueExpansion:
    def test_plain_string(self):
        out = ex({"@context": SCHEMA, "name": "x"})
        assert out == [{"https://schema.org/name": [{"@value": "x"}]}]

    def test_typed_term(self):
        doc = {
            "@context": {"age": {"@id": "https://schema.org/age",
                                 "@type": "http://www.w3.org/2001/XMLSchema#integer"}},
            "age": 7,
        }
        out = ex(doc)
        assert out == [{"https://schema.org/age": [
            {"@value": 7, "@type": "http://www.w3.org/2001/XMLSchema#integer"}]}]

    def test_id_typed_term_expands_to_node_ref(self):
        doc = {
            "@context": {"homepage": {"@id": "https://schema.org/url", "@type": "@id"}},
            "homepage": "relative/path",
        }
        out = ex(doc)
        assert out == [{"https://schema.org/url": [{"@id": "relative/path"}]}]

    def test_vocab_typed_term(self):
        doc = {
            "@context": {"@vocab": "https://schema.org/",
                         "kind": {"@id": "https://schema.org/kind", "@type": "@vocab"}},
            "kind": "Dataset",
        }
        out = ex(doc)
        assert out == [{"https://schema.org/kind": [{"@id": "https://schema.org/Dataset"}]}]

    def test_default_language_attaches(self):
        doc = {"@context": {**SCHEMA, "@language": "EN"}, "name": "x"}
        out = ex(doc)
        assert out == [{"https://schema.org/name": [{"@value": "x", "@language": "en"}]}]

    def test_term_language_overrides_default_null(self):
        doc = {
            "@context": {"@vocab": "https://schema.org/", "@language": "en",
                         "name": {"@id": "https://schema.org/name", "@language": None}},
            "name": "x",
        }
        out = ex(doc)
        assert out == [{"https://schema.org/name": [{"@value": "x"}]}]


class TestContainers:
    def test_list_container_wraps(self):
        doc = {
            "@context": {"tags": {"@id": "https://schema.org/keywords", "@container": "@list"}},
            "tags": ["a", "b"],
        }
        out = ex(doc)
        assert out == [{"https://schema.org/keywords": [
            {"@list": [{"@value": "a"}, {"@value": "b"}]}]}]

    def test_language_map(self):
        doc = {
            "@context": {"label": {"@id": "https://schema.org/name", "@container": "@language"}},
            "label": {"en": "Queen", "DE": ["Königin"]},
        }
        out = ex(doc)
        vals = out[0]["https://schema.org/name"]
        assert {"@value": "Queen", "@language": "en"} in vals
        assert {"@value": "Königin", "@language": "de"} in vals

    def test_language_map_non_string_rejected(self):
        doc = {
            "@context": {"label": {"@id": "https://schema.org/name", "@container": "@language"}},
            "label": {"en": 5},
        }
        with pytest.raises(JsonLdError, match="language map"):
            ex(doc)

    def test_index_map_adds_index(self):
        doc = {
            "@context": {"post": {"@id": "https://schema.org/post", "@container": "@index"}},
            "post": {"v1": {"https://schema.org/name": "first"}},
        }
        out = ex(doc)
        item = out[0]["https://schema.org/post"][0]
        assert item["@index"] == "v1"

    def test_id_map_assigns_id(self):
        doc = {
            "@context": {"@vocab": "https://schema.org/",
                         "post": {"@id": "https://schema.org/post", "@container": "@id"}},
            "post": {"https://x.org/a": {"name": "n"}},
        }
        out = ex(doc)
        item = out[0]["https://schema.org/post"][0]
        assert item["@id"] == "https://x.org/a"

    def test_type_map_prepends_type(self):
        doc = {
            "@context": {"@vocab": "https://schema.org/",
                         "things": {"@id": "https://schema.org/thing", "@container": "@type"}},
            "things": {"Dataset": {"name": "n"}},
        }
        out = ex(doc)
        item = out[0]["https://schema.org/thing"][0]
        assert item["@type"] == ["https://schema.org/Dataset"]

    def test_graph_container_wraps(self):
        doc = {
            "@context": {"claims": {"@id": "https://schema.org/claim", "@container": "@graph"}},
            "claims": {"https://schema.org/name": "n"},
        }
        out = ex(doc)
        item = out[0]["https://schema.org/claim"][0]
        assert "@graph" in item

    def test_set_container_is_transparent(self):
        doc = {
            "@context": {"tags": {"@id": "https://schema.org/keywords", "@container": ["@set"]}},
            "tags": "a",
        }
        out = ex(doc)
        assert out == [{"https://schema.org/keywords": [{"@value": "a"}]}]


class TestReverseAndNest:
    def test_reverse_keyword(self):
        doc = {
            "@context": SCHEMA,
            "@id": "https://x.org/a",
            "@reverse": {"parent": {"@id": "https://x.org/b"}},
        }
        out = ex(doc)
        assert out[0]["@reverse"]["https://schema.org/parent"] == [{"@id": "https://x.org/b"}]

    def test_reverse_term(self):
        doc = {
            "@context": {"children": {"@reverse": "https://schema.org/parent"}},
            "@id": "https://x.org/a",
            "children": {"@id": "https://x.org/b"},
        }
        out = ex(doc)
        assert out[0]["@reverse"]["https://schema.org/parent"] == [{"@id": "https://x.org/b"}]

    def test_reverse_value_object_rejected(self):
        doc = {
            "@context": {"children": {"@reverse": "https://schema.org/parent"}},
            "@id": "https://x.org/a",
            "children": "literal",
        }
        with pytest.raises(JsonLdError, match="reverse property"):
            ex(doc)

    def test_nest_flattens(self):
        doc = {
            "@context": SCHEMA,
            "@nest": {"name": "hidden"},
        }
        out = ex(doc)
        assert out == [{"https://schema.org/name": [{"@value": "hidden"}]}]

    def test_nest_with_value_rejected(self):
        doc = {"@context": SCHEMA, "@nest": {"@value": "x"}}
        with pytest.raises(JsonLdError, match="@nest"):
            ex(doc)


class TestScopedContexts:
    def test_property_scoped_context(self):
        doc = {
            "@context": {
                "@vocab": "https://schema.org/",
                "detail": {"@id": "https://schema.org/detail",
                           "@context": {"@vocab": "https://example.org/"}},
            },
            "detail": {"inner": "v"},
        }
        out = ex(doc)
        child = out[0]["https://schema.org/detail"][0]
        assert child == {"https://example.org/inner": [{"@value": "v"}]}

    def test_type_scoped_context(self):
        doc = {
            "@context": {
                "@vocab": "https://schema.org/",
                "Special": {"@id": "https://schema.org/Special",
                            "@context": {"@vocab": "https://special.org/"}},
            },
            "@type": "Special",
            "field": "v",
        }
        out = ex(doc)
        assert out[0]["@type"] == ["https://schema.org/Special"]
        assert out[0]["https://special.org/field"] == [{"@value": "v"}]

    def test_type_scoped_context_does_not_propagate(self):
        # a type-scoped context applies to the node it types and reverts
        # for nested nodes (spec: propagate=false)
        doc = {
            "@context": {
                "@vocab": "https://schema.org/",
                "Special": {"@id": "https://schema.org/Special",
                            "@context": {"@vocab": "https://special.org/"}},
            },
            "@type": "Special",
            "child": {"@id": "https://x.org/c", "grand": "v"},
        }
        out = ex(doc)
        child = out[0]["https://special.org/child"][0]
        assert child["https://schema.org/grand"] == [{"@value": "v"}]


class TestJsonLiteral:
    def test_json_type_passes_structures(self):
        doc = {
            "@context": {"blob": {"@id": "https://schema.org/blob", "@type": "@json"}},
            "blob": {"any": ["shape", 1]},
        }
        out = ex(doc)
        assert out == [{"https://schema.org/blob": [
            {"@value": {"any": ["shape", 1]}, "@type": "@json"}]}]


class TestErrors:
    @pytest.mark.parametrize(
        "doc,code",
        [
            ({"@context": {"@base": 5}, "@id": "x"}, "invalid base IRI"),
            ({"@context": {"@vocab": 5}, "a": 1}, "invalid vocab mapping"),
            ({"@context": {"@language": 5}, "a": 1}, "invalid default language"),
            ({"@context": {"@direction": "up"}, "a": 1}, "invalid base direction"),
            ({"@context": {"name": 5}, "name": "x"}, "invalid term definition"),
            ({"@context": {"name": {"@id": "https://x/n", "@type": 5}}, "name": "x"},
             "invalid type mapping"),
            ({"@context": {"name": {"@reverse": 5}}, "name": "x"}, "IRI mapping"),
            ({"@context": {"name": {"@id": "https://x/n", "@nest": "@id"}}, "name": "x"},
             "invalid @nest value"),
            ({"@context": {"name": {"@id": "https://x/n", "@prefix": "yes"}}, "name": "x"},
             "invalid @prefix value"),
            ({"@context": {"name": {"@id": "https://x/n", "@bogus_key": 1}}, "name": "x"},
             "invalid term definition"),
            ({"@context": {"@vocab": "https://s/"}, "@type": 5}, "invalid type value"),
            ({"@included": "not-a-node"}, "invalid @included value"),
            ({"https://s/p": {"@value": "x", "@language": 5}}, "language-tagged"),
            ({"https://s/p": {"@value": 5, "@language": "en"}}, "language-tagged"),
            ({"https://s/p": {"@value": "x", "@type": "not an iri"}}, "invalid typed value"),
            ({"https://s/p": {"@value": "x", "@index": 5}}, "invalid @index value"),
            ({"@context": {"id": "@id"}, "id": "https://x/a", "@id": "https://x/b"},
             "colliding keywords"),
            ({"@context": None, "@id": "x"}, None),  # legal: nullify non-protected
            ({"@context": [{"@protected": True, "n": "https://s/n"}, None], "n": "x"},
             "invalid context nullification"),
        ],
    )
    def test_error_cases(self, doc, code):
        if code is None:
            expand(doc)
            return
        with pytest.raises(JsonLdError, match=code.replace("@", "@")):
            expand(doc)

    def test_recursive_remote_context_rejected(self):
        loader = OfflineLoader({"https://a.example/ctx": {"@context": "https://a.example/ctx"}})
        with pytest.raises(JsonLdError, match="recursive context inclusion"):
            expand({"@context": "https://a.example/ctx", "https://s/p": 1}, loader=loader)


class TestPropagate:
    def test_propagate_false_reverts_for_children(self):
        doc = {
            "@context": [
                {"@vocab": "https://schema.org/"},
                {"@propagate": False, "special": "https://special.org/special"},
            ],
            "special": "top",
            "child": {"@id": "https://x.org/c", "special": "nested"},
        }
        out = ex(doc)
        node = out[0]
        assert node["https://special.org/special"] == [{"@value": "top"}]
        child = node["https://schema.org/child"][0]
        # inside the child the non-propagating context has reverted
        assert child["https://schema.org/special"] == [{"@value": "nested"}]


class TestExpanderCache:
    def test_cache_hit_returns_same_context_decisions(self):
        e = Expander()
        d1 = {"@context": "https://schema.org/", "name": "a"}
        d2 = {"@context": "https://schema.org/", "name": "b"}
        o1, o2 = e.expand(d1), e.expand(d2)
        assert o1 == [{"https://schema.org/name": [{"@value": "a"}]}]
        assert o2 == [{"https://schema.org/name": [{"@value": "b"}]}]
        assert len(e._cache) == 1

    def test_cached_context_not_mutated_by_nested_contexts(self):
        e = Expander()
        base = {"@context": {"@vocab": "https://schema.org/"}}
        d1 = {**base, "child": {"@context": {"@vocab": "https://other.org/"}, "x": 1}}
        e.expand(d1)
        # the same top-level context must still expand with schema.org vocab
        out = e.expand({**base, "x": 1})
        assert out == [{"https://schema.org/x": [{"@value": 1}]}]

    def test_dict_and_string_context_cached_separately(self):
        e = Expander()
        e.expand({"@context": "https://schema.org/", "name": "a"})
        e.expand({"@context": {"@vocab": "https://schema.org/"}, "name": "a"})
        assert len(e._cache) == 2


class TestGraphAndTopLevel:
    def test_graph_unwrapped(self):
        doc = {"@context": SCHEMA, "@graph": [{"@id": "https://x/a", "name": "n"}]}
        out = ex(doc)
        assert out == [{"@id": "https://x/a", "https://schema.org/name": [{"@value": "n"}]}]

    def test_scalar_top_level_drops(self):
        assert expand({"@context": SCHEMA}) == []

    def test_top_level_id_only_drops(self):
        assert expand({"@id": "https://x/a"}) == []

    def test_compact_iri_key(self):
        doc = {"@context": {"s": "https://schema.org/"}, "s:name": "x"}
        out = ex(doc)
        assert out == [{"https://schema.org/name": [{"@value": "x"}]}]

    def test_prefix_false_blocks_compact_iri(self):
        doc = {
            "@context": {"s": {"@id": "https://schema.org/", "@prefix": False}},
            "s:name": "x",
        }
        out = ex(doc)
        # s is not usable as a prefix: "s:name" is an absolute-IRI-shaped
        # string with scheme "s", kept verbatim as the property
        assert out == [{"s:name": [{"@value": "x"}]}]


class TestRdfEmission:
    """Deserialize-to-RDF corners: canonical xsd:double form, whole
    floats as xsd:integer (json-gold objectToRDF), rdf:first/rest lists,
    rdf:JSON literals with canonical JSON, base-IRI resolution."""

    def _nq(self, doc):
        from gleaner_ray.jsonld_expand import expanded_to_quads
        from gleaner_ray.urdna import serialize_quads

        return serialize_quads(expanded_to_quads(expand(doc)))

    def test_double_canonical_and_whole_float_integer(self):
        out = self._nq({"@context": {"@vocab": "https://s/"},
                        "x": 1.5, "y": 0.0001, "z": 12300000.0})
        assert '"1.5E0"^^<http://www.w3.org/2001/XMLSchema#double>' in out
        assert '"1.0E-4"^^<http://www.w3.org/2001/XMLSchema#double>' in out
        assert '"12300000"^^<http://www.w3.org/2001/XMLSchema#integer>' in out

    def test_rdf_list_triples(self):
        out = self._nq({"@context": {"l": {"@id": "https://s/l", "@container": "@list"}},
                        "l": ["a", "b"]})
        lines = out.strip().splitlines()
        assert len(lines) == 5
        assert sum("rdf-syntax-ns#first" in l for l in lines) == 2
        assert sum("rdf-syntax-ns#rest" in l for l in lines) == 2
        assert any("rdf-syntax-ns#nil" in l for l in lines)

    def test_empty_list_is_nil(self):
        out = self._nq({"@context": {"l": {"@id": "https://s/l", "@container": "@list"}},
                        "l": []})
        assert out.strip() == "_:b0 <https://s/l> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> ."

    def test_json_literal_canonical(self):
        out = self._nq({"@context": {"j": {"@id": "https://s/j", "@type": "@json"}},
                        "j": {"b": 1, "a": [2]}})
        assert '"{\\"a\\":[2],\\"b\\":1}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>' in out

    def test_base_resolution_chain(self):
        out = expand({"@context": {"@base": "https://ex.org/a/b/"},
                      "@id": "../c", "https://s/p": {"@id": "#frag"}})
        assert out[0]["@id"] == "https://ex.org/a/c"
        assert out[0]["https://s/p"] == [{"@id": "https://ex.org/a/b/#frag"}]

    def test_import_merges_under_local(self):
        loader = OfflineLoader(
            {"https://i.example/base": {"@context": {"nm": "https://s/name"}}}
        )
        out = expand({"@context": {"@import": "https://i.example/base",
                                   "@vocab": "https://v/"},
                      "nm": "x", "other": "y"},
                     loader=loader)
        assert out == [{"https://s/name": [{"@value": "x"}],
                        "https://v/other": [{"@value": "y"}]}]

    def test_named_graph_quads(self):
        from gleaner_ray.jsonld_expand import expanded_to_quads

        doc = {"@id": "https://g.example/g1",
               "@graph": [{"@id": "https://x/a", "https://s/p": "v"}]}
        quads = expanded_to_quads(expand(doc))
        assert quads == [("https://x/a", "https://s/p", '"v"', "https://g.example/g1")]


class TestValidatorTotality:
    """The validator is the crawl hot path: on ARBITRARY JSON it must
    return a verdict, never raise — web-scale inputs include every
    malformed @-keyword shape imaginable."""

    def test_fuzz_never_raises(self):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from gleaner_ray.jsonld_lite import Validator

        v = Validator()
        keys = st.sampled_from(
            ["@context", "@id", "@type", "@value", "@list", "@set", "@graph",
             "@reverse", "@nest", "@index", "@language", "@vocab", "@base",
             "@container", "@prefix", "@protected", "@propagate", "@version",
             "name", "a:b", "x", "https://s/p", "@bogus", ""]
        )
        json_val = st.recursive(
            st.one_of(st.none(), st.booleans(), st.integers(-10, 10),
                      st.floats(allow_nan=False, allow_infinity=False),
                      st.text(max_size=8), keys),
            lambda children: st.one_of(
                st.lists(children, max_size=4),
                st.dictionaries(keys, children, max_size=5),
            ),
            max_leaves=25,
        )

        @settings(max_examples=300, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(st.dictionaries(keys, json_val, max_size=6))
        def run(doc):
            ok, err = v.is_valid(json.dumps(doc))
            assert isinstance(ok, bool)
            assert (err is None) == ok

        run()
