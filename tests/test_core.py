"""Unit tests for gojson / jsonpatch / identifier / extract — the byte-level
foundation under the fixup chain."""

import json

import pytest

from gleaner_ray import extract, gojson, identifier, jsonpatch


class TestGoJson:
    def test_sorted_keys_compact(self):
        assert gojson.marshal({"b": 1, "a": 2}) == '{"a":2,"b":1}'

    def test_html_escaping(self):
        assert gojson.marshal("<a>&") == '"\\u003ca\\u003e\\u0026"'

    def test_control_chars(self):
        assert gojson.marshal("a\nb\tc\x01") == '"a\\nb\\tc\\u0001"'

    @pytest.mark.parametrize(
        "f,expected",
        [
            (5.0, "5"),
            (0.1, "0.1"),
            (1e21, "1e+21"),
            (1e-7, "1e-7"),
            (1.5e21, "1.5e+21"),
            (-2.5, "-2.5"),
            (1e-6, "0.000001"),
            (1e20, "100000000000000000000"),
            (0.0000015, "0.0000015"),
            (1.5e-7, "1.5e-7"),
        ],
    )
    def test_go_float_format(self, f, expected):
        assert gojson.format_float(f) == expected

    def test_nested(self):
        v = {"k": [1, "x", None, True, {"z": 0.5}]}
        assert gojson.marshal(v) == '{"k":[1,"x",null,true,{"z":0.5}]}'

    def test_roundtrips_python_json(self):
        v = {"a": [1, 2.5, "s"], "b": {"c": None}}
        assert json.loads(gojson.marshal(v)) == v


class TestJsonPatch:
    DOC = '{\n  "a": {"b": [1, 2, {"c": "x"}]},\n  "d": "y"\n}'

    def test_get_value(self):
        assert jsonpatch.get_value(self.DOC, ["a", "b", 2, "c"]) == "x"
        assert jsonpatch.get_value(self.DOC, ["d"]) == "y"
        assert jsonpatch.get_value(self.DOC, ["missing"]) is None

    def test_set_existing_preserves_surroundings(self):
        out = jsonpatch.set_value(self.DOC, ["d"], "z")
        assert out == '{\n  "a": {"b": [1, 2, {"c": "x"}]},\n  "d": "z"\n}'

    def test_set_missing_appends(self):
        out = jsonpatch.set_value('{"a":1}', ["b"], 2)
        assert out == '{"a":1,"b":2}'

    def test_set_missing_nested_creates(self):
        out = jsonpatch.set_value('{"a":1}', ["x", "y"], "v")
        assert json.loads(out) == {"a": 1, "x": {"y": "v"}}

    def test_set_into_empty_object(self):
        assert jsonpatch.set_value("{}", ["k"], 1) == '{"k":1}'

    def test_tolerant_missing_commas(self):
        doc = '{"a": 1 "b": 2}'
        assert jsonpatch.get_value(doc, ["b"]) == 2

    def test_tolerant_trailing_comma(self):
        assert jsonpatch.get_value('{"a": [1, 2,],}', ["a", 1]) == 2

    def test_unicode_escapes(self):
        assert jsonpatch.get_value('{"a": "\\u00e9\\ud83d\\ude00"}', ["a"]) == "é😀"

    def test_gjson_string_semantics(self):
        node = jsonpatch.get_node('{"a": {"x": 1}}', ["a"])
        assert node.gjson_string() == '{"x": 1}'
        node = jsonpatch.get_node('{"a": 2.5}', ["a"])
        assert node.gjson_string() == "2.5"


class TestIdentifier:
    def test_sha1(self):
        # sha1("abc")
        assert identifier.get_sha("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"

    def test_generate_file_sha(self):
        ident = identifier.generate_file_sha('{"a":1}')
        assert ident.unique_id == ident.json_sha == identifier.get_sha('{"a":1}')
        assert ident.identifier_type == "jsonsha"

    def test_jsonpath_id(self):
        # ported from identifier_test.go TestValidJsonPathInput "@id"
        src = open("/root/reference/internal/common/testdata/identifier/jsonId.json").read()
        result = identifier.get_identifier_by_path("$['@id']", src)
        assert result == ["idenfitier"]

    def test_jsonpath_sorted(self):
        doc = '{"ids": [{"v": "b"}, {"v": "a"}]}'
        assert identifier.get_identifier_by_path("$.ids[*].v", doc) == ["a", "b"]

    def test_by_paths_first_match_wins(self):
        doc = '{"identifier": "doi:10.1234/x"}'
        result, path = identifier.get_identifier_by_paths(["$.missing", "$.identifier"], doc)
        assert result == ["doi:10.1234/x"]
        assert path == "$.identifier"

    def test_by_paths_no_match(self):
        result, path = identifier.get_identifier_by_paths(["$.missing"], "{}")
        assert result == "" and path == ""


HTML_PAGE = b"""<!DOCTYPE html><html><head>
<title>t</title>
<script type="application/ld+json">{"@context": "https://schema.org/", "@type": "Dataset", "name": "one"}</script>
<script type="text/javascript">var x = 1;</script>
<SCRIPT TYPE="application/ld+json; charset=utf-8">{"@type": "Dataset", "name": "two"}</SCRIPT>
</head><body><p>hi</p></body></html>"""


class TestExtract:
    def test_script_extraction_order_and_bytes(self):
        got = extract.extract_script_jsonld(HTML_PAGE.decode())
        assert got == [
            '{"@context": "https://schema.org/", "@type": "Dataset", "name": "one"}',
            '{"@type": "Dataset", "name": "two"}',
        ]

    def test_prefix_match_is_case_sensitive_on_value(self):
        # cascadia attribute *values* are case-sensitive: Application/... no match
        html = '<script type="Application/ld+json">{"a":1}</script>'
        assert extract.extract_script_jsonld(html) == []

    def test_single_quotes_and_attr_order(self):
        html = "<script async type='application/ld+json' id=x>{\"a\":1}</script>"
        assert extract.extract_script_jsonld(html) == ['{"a":1}']

    def test_unclosed_script_runs_to_eof(self):
        html = '<script type="application/ld+json">{"a":1}'
        assert extract.extract_script_jsonld(html) == ['{"a":1}']

    def test_extension_arbitration(self):
        assert extract.file_extension_is_json("https://x.org/a/b.json")
        assert extract.file_extension_is_json("https://x.org/a/b.jsonld?q=1")
        assert not extract.file_extension_is_json("https://x.org/a/b.html")
        assert not extract.file_extension_is_json("https://x.org/a.json.html")

    def test_candidates_whole_body(self):
        cands, whole = extract.extract_candidates("https://x.org/d.json", b"{}", '{"@type":"Dataset"}')
        assert whole and cands == ['{"@type":"Dataset"}']

    def test_candidates_html(self):
        cands, whole = extract.extract_candidates("https://x.org/d.html", HTML_PAGE, "ignored")
        assert not whole and len(cands) == 2

    def test_content_type_overrides(self):
        cands, whole = extract.extract_candidates(
            "https://x.org/d", b"{}", '{"a":1}', content_type="application/json; charset=utf-8"
        )
        assert whole and cands == ['{"a":1}']

    def test_bytes_scanner_parity(self):
        # the zero-copy bytes scanner must match the str scanner
        # byte-for-byte on every structural shape, including invalid
        # utf-8 (replacement chars can't create or destroy ASCII tags)
        cases = [
            HTML_PAGE.decode(),
            '<script type=application/ld+json>{"c":3}</script>'
            '<script type="application/ld+jsonX">{"d":4}',
            "no scripts here",
            '<script type="application/ld+json">unterminated {"e":5}',
            "<script  data-x type='application/ld+json'>{\"f\":6}</script >trail",
            '<script\ntype="application/ld+json"\n>{"nl": true}</script>',
            "",
        ]
        for c in cases:
            assert extract.extract_script_jsonld_bytes(memoryview(c.encode())) == (
                extract.extract_script_jsonld(c)
            )
        raw = b'<script type="application/ld+json">{"g": "\xff\xfe"}</script>'
        assert extract.extract_script_jsonld_bytes(raw) == extract.extract_script_jsonld(
            raw.decode("utf-8", "replace")
        )

    def test_candidates_accept_memoryview(self):
        mv = memoryview(HTML_PAGE)
        a, wa = extract.extract_candidates("https://x.org/d.html", mv, None)
        b, wb = extract.extract_candidates("https://x.org/d.html", HTML_PAGE.decode(), None)
        assert (a, wa) == (b, wb)
        c, whole = extract.extract_candidates("https://x.org/d.json", memoryview(b'{"j":1}'), None)
        assert whole and c == ['{"j":1}']
