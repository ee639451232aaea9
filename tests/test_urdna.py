"""URDNA2015 canonicalization tests: the reference's approval goldens
(internal/common/ldproc_test.go:40-105) plus spec-level invariants —
canonical labels must be invariant under blank-node relabeling and quad
reordering (graph isomorphism), including symmetric multi-node graphs
that need the N-degree permutation path."""

import pytest

from gleaner_ray.jsonld_lite import normalize_nquads
from gleaner_ray.urdna import canonicalize, serialize_quads


class TestReferenceGoldens:
    def test_no_context_multinode_golden_empty(self):
        # json-gold drops everything: relative @id subject and unmapped
        # properties (so the nested node is never reached)
        doc = """{
"@type":"bar",
"@id":"idenfitier",
"url": "http://example.com/",
"identifier": [\t
\t{
\t"@type": "PropertyValue",
\t"@id": "https://doi.org/10.1575/1912/bco-dmo.2343.1",
\t"propertyID": "https://registry.identifiers.org/registry/doi",
\t"value": "doi:10.1575/1912/bco-dmo.2343.1",
\t"url": "https://doi.org/10.1575/1912/bco-dmo.2343.1"
\t}
\t
]

}"""
        expected = open(
            "/root/reference/internal/common/testdata/"
            "ldproc_test.TestNormalizeTriple.noContext_jsonID.approved.txt"
        ).read()
        assert normalize_nquads(doc) == expected == ""

    def test_single_bnode_goldens_still_pass(self):
        doc = '{"@type":"bar","SO:name":"Some type in a graph"}'
        expected = open(
            "/root/reference/internal/common/testdata/"
            "ldproc_test.TestNormalizeTriple.noContextSimple_jsonID.approved.txt"
        ).read()
        assert normalize_nquads(doc) == expected


def _canon(quads):
    return serialize_quads(quads, canonicalize(quads))


class TestCanonicalizeInvariance:
    def test_two_distinct_bnodes_orderings(self):
        quads = [
            ("_:x", "http://p/knows", "_:y", None),
            ("_:x", "http://p/name", '"alice"', None),
            ("_:y", "http://p/name", '"bob"', None),
        ]
        relabeled = [
            ("_:q9", "http://p/name", '"bob"', None),
            ("_:k", "http://p/name", '"alice"', None),
            ("_:k", "http://p/knows", "_:q9", None),
        ]
        out = _canon(quads)
        assert out == _canon(relabeled)
        assert "_:c14n0" in out and "_:c14n1" in out

    def test_symmetric_cycle_needs_ndegree(self):
        # a <-> b symmetric 2-cycle: identical first-degree hashes, so
        # the N-degree permutation search must break the tie stably
        quads = [
            ("_:a", "http://p/next", "_:b", None),
            ("_:b", "http://p/next", "_:a", None),
        ]
        relabeled = [
            ("_:m", "http://p/next", "_:n", None),
            ("_:n", "http://p/next", "_:m", None),
        ]
        out = _canon(quads)
        assert out == _canon(relabeled)
        assert out == "_:c14n0 <http://p/next> _:c14n1 .\n_:c14n1 <http://p/next> _:c14n0 .\n"

    def test_symmetric_cycle_with_distinguishing_literal(self):
        quads = [
            ("_:a", "http://p/next", "_:b", None),
            ("_:b", "http://p/next", "_:a", None),
            ("_:a", "http://p/name", '"left"', None),
        ]
        swapped = [
            ("_:b", "http://p/next", "_:a", None),
            ("_:a", "http://p/next", "_:b", None),
            ("_:b", "http://p/name", '"left"', None),
        ]
        out = _canon(quads)
        assert out == _canon(swapped)
        # the named node is distinguishable; labels deterministic
        assert '"left"' in out

    def test_three_chain_vs_shuffled(self):
        chain = [
            ("_:1", "http://p/n", "_:2", None),
            ("_:2", "http://p/n", "_:3", None),
            ("_:3", "http://p/v", '"end"', None),
        ]
        shuffled = [
            ("_:c", "http://p/v", '"end"', None),
            ("_:a", "http://p/n", "_:b", None),
            ("_:b", "http://p/n", "_:c", None),
        ]
        assert _canon(chain) == _canon(shuffled)

    def test_bnode_graph_label(self):
        quads = [("_:s", "http://p/x", '"v"', "_:g")]
        relabeled = [("_:zz", "http://p/x", '"v"', "_:gg")]
        assert _canon(quads) == _canon(relabeled)

    def test_poison_graph_guard(self):
        # fully symmetric K5 of blank nodes: permutation explosion is
        # bounded by max_permutations instead of hanging the pipeline
        quads = [
            ("_:%d" % i, "http://p/e", "_:%d" % j, None)
            for i in range(5)
            for j in range(5)
            if i != j
        ]
        with pytest.raises(ValueError):
            canonicalize(quads, max_permutations=3)
        # with the default budget this size still canonicalizes fine
        labels = canonicalize(quads)
        assert len(labels) == 5

    def test_multi_bnode_jsonld_document(self):
        # two sibling blank datasets distinguished only by name
        doc = (
            '{"@context":{"@vocab":"https://schema.org/"},"@graph":['
            '{"@type":"Dataset","name":"b"},{"@type":"Dataset","name":"a"}]}'
        )
        doc_swapped = (
            '{"@context":{"@vocab":"https://schema.org/"},"@graph":['
            '{"@type":"Dataset","name":"a"},{"@type":"Dataset","name":"b"}]}'
        )
        assert normalize_nquads(doc) == normalize_nquads(doc_swapped)
        out = normalize_nquads(doc)
        assert out.count("_:c14n0") == 2 and out.count("_:c14n1") == 2


class TestCcadiRealWorldParity:
    """723-quad real-world golden: the reference converts
    testdata/ccadi.jsonld to RDF with json-gold (ccadi.rdf, go-runtime
    blank-node labels). Canonical forms must agree label-for-label after
    URDNA2015 on BOTH sides — an end-to-end check of context
    processing, expansion, node-map generation, RDF emission, and
    canonicalization against data this engine never saw."""

    _NQ = __import__("re").compile(
        r"^(\S+)\s+<([^>]+)>\s+(.+?)\s*\.\s*$"
    )

    def _parse_nquads(self, path: str):
        quads = []
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            m = self._NQ.match(line)
            assert m, line
            s, p, o = m.groups()
            if s.startswith("<"):
                s = s[1:-1]
            quads.append((s, p, o, None))
        return quads

    def test_ccadi_canonical_forms_match(self):
        import json

        from gleaner_ray.jsonld_expand import expand, expanded_to_quads

        src = open("/root/reference/internal/common/testdata/ccadi.jsonld").read()
        ours = expanded_to_quads(expand(json.loads(src)))
        theirs = self._parse_nquads(
            "/root/reference/internal/common/testdata/ccadi.rdf"
        )
        assert len(ours) == len(theirs) == 723
        ours_c = serialize_quads(ours, canonicalize(ours))
        theirs_c = serialize_quads(theirs, canonicalize(theirs))
        assert ours_c == theirs_c
