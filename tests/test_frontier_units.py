"""Unit tests for robots / sitemaps / urlutils / prov / org, mirroring the
reference's resources_test.go / utils_test.go / org_test.go expectations."""

import json

import pytest

from gleaner_ray import robots, sitemaps, urlutils
from gleaner_ray.config import Source
from gleaner_ray.org import build_org_jsonld, org_nq, org_object_name
from gleaner_ray.prov import prov_graph, prov_object_name

# modeled on the bodies in resources_test.go:16-21
ROBOTS_TXT = """User-agent: *
Crawl-delay: 10
Allow: /ref/
Disallow: /private/
Disallow: /tmp/

User-agent: EarthCube_DataBot/1.0
Allow: /
Crawl-delay: 1

Sitemap: https://example.org/sitemap.xml
Sitemap: https://example.org/sitemap2.xml
"""


class TestRobots:
    def test_group_resolution_prefers_specific(self):
        data = robots.parse_robots(ROBOTS_TXT)
        g = data.find_group("EarthCube_DataBot/1.0")
        assert g is not None and g.crawl_delay == 1.0

    def test_star_fallback(self):
        data = robots.parse_robots(ROBOTS_TXT)
        g = data.find_group("SomeOtherBot/2.0")
        assert g is not None and g.crawl_delay == 10.0

    def test_allow_disallow(self):
        data = robots.parse_robots(ROBOTS_TXT)
        g = data.find_group("SomeOtherBot/2.0")
        assert g.test("https://example.org/ref/a/b")
        assert not g.test("https://example.org/private/x")
        assert g.test("/anything-else")

    def test_longest_match_wins(self):
        g = robots.parse_robots("User-agent: *\nDisallow: /a/\nAllow: /a/b/\n").find_group("x")
        assert not g.test("/a/c")
        assert g.test("/a/b/c")

    def test_wildcards_and_anchor(self):
        g = robots.parse_robots("User-agent: *\nDisallow: /*.json$\n").find_group("x")
        assert not g.test("/data/file.json")
        assert g.test("/data/file.jsonld")

    def test_sitemap_advertisements(self):
        data = robots.parse_robots(ROBOTS_TXT)
        assert data.sitemaps == [
            "https://example.org/sitemap.xml",
            "https://example.org/sitemap2.xml",
        ]

    def test_empty_robots_allows(self):
        data = robots.parse_robots("")
        assert data.find_group("any") is None  # caller treats None as allow-all


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://example.org/ref/a/1</loc><lastmod>2024-01-01</lastmod><priority>0.5</priority></url>
  <url><loc>
     https://example.org/ref/a/2
  </loc></url>
  <url><loc>https://example.org/private/3</loc></url>
</urlset>"""

SITEMAP_INDEX_XML = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://example.org/sm1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
  <sitemap><loc>https://example.org/sm2.xml</loc></sitemap>
</sitemapindex>"""


class TestSitemaps:
    def test_parse_flat(self):
        urls = sitemaps.parse_sitemap(SITEMAP_XML)
        assert [u.loc for u in urls] == [
            "https://example.org/ref/a/1",
            "https://example.org/ref/a/2",
            "https://example.org/private/3",
        ]
        assert urls[0].lastmod == "2024-01-01"
        assert urls[0].priority == 0.5

    def test_parse_index(self):
        assert sitemaps.parse_sitemap_index(SITEMAP_INDEX_XML) == [
            "https://example.org/sm1.xml",
            "https://example.org/sm2.xml",
        ]

    def test_flat_is_not_index(self):
        assert sitemaps.parse_sitemap_index(SITEMAP_XML) == []

    def test_url_list_with_robots_filter(self):
        group = robots.parse_robots("User-agent: *\nDisallow: /private/\n").find_group("x")
        out = sitemaps.sitemap_url_list(lambda u: SITEMAP_XML, "https://example.org/sitemap.xml", group)
        assert [u.loc for u in out] == ["https://example.org/ref/a/1", "https://example.org/ref/a/2"]

    def test_url_list_walks_index_in_order(self):
        docs = {
            "https://example.org/idx.xml": SITEMAP_INDEX_XML,
            "https://example.org/sm1.xml": SITEMAP_XML.replace("/ref/a/", "/ref/x/"),
            "https://example.org/sm2.xml": SITEMAP_XML,
        }
        out = sitemaps.sitemap_url_list(docs.__getitem__, "https://example.org/idx.xml", None)
        assert [u.loc for u in out][:2] == ["https://example.org/ref/x/1", "https://example.org/ref/x/2"]
        assert len(out) == 6

    def test_dead_sitemap_raises(self):
        def fetch(u):
            raise IOError("404")

        with pytest.raises(IOError):
            sitemaps.sitemap_url_list(fetch, "https://dead.example.org/sitemap.xml", None)


class TestUrlUtils:
    def test_canonical_host(self):
        assert urlutils.canonical_host("https://Example.ORG:443/a") == "example.org"
        assert urlutils.canonical_host("http://example.org:80/a") == "example.org"
        assert urlutils.canonical_host("http://example.org:8080/a") == "example.org:8080"

    def test_canonical_url(self):
        cu = urlutils.canonical_url
        assert (
            cu("https://Host2.Example.COM:443//p//7/?z=3&utm_source=s&a=1#sec")
            == "https://host2.example.com/p/7?a=1&z=3"
        )
        # root slash is kept; lone trailing slash elsewhere stripped
        assert cu("https://h.example/") == "https://h.example/"
        assert cu("https://h.example/a/") == "https://h.example/a"
        # http default port, param sort, empty-param drop
        assert cu("http://H.example:80/a/?b=2&&a=1") == "http://h.example/a?a=1&b=2"
        # all-tracking query vanishes entirely (no dangling '?')
        assert cu("https://h.example/a?utm_source=x&gclid=1") == "https://h.example/a"
        # non-default port survives; scheme-less strings pass through
        assert cu("https://h.example:8443/a") == "https://h.example:8443/a"
        assert cu("not-a-url") == "not-a-url"

    def test_canonical_host_query_fragment_no_path(self):
        # '?' or '#' before any '/' must still end the authority
        assert urlutils.canonical_host("https://example.com?x=1") == "example.com"
        assert urlutils.canonical_host("https://example.com#frag") == "example.com"
        assert urlutils.canonical_host("http://Example.com:80?x=1") == "example.com"
        assert urlutils.canonical_host("https://example.com/p?x=1") == "example.com"

    def test_host_bucket_stable(self):
        b1 = urlutils.host_bucket("h", "https://h/x", 16)
        assert b1 == urlutils.host_bucket("h", "https://h/x", 16)
        assert 0 <= b1 < 16

    def test_sha_shard(self):
        assert urlutils.sha_shard("deadbeef" + "0" * 32, 8) == int("deadbeef", 16) % 8


SRC = Source(
    name="src1",
    url="https://example.org/sitemap.xml",
    pid="https://pid.org/1",
    propername="Source One",
    domain="https://example.org",
)


class TestProvOrg:
    def test_prov_is_valid_json_with_fields(self):
        p = prov_graph("gleaner", "src1", "abc123", "https://example.org/d/1", [SRC], "2026-08-17")
        doc = json.loads(p)
        graph = doc["@graph"]
        assert graph[0]["@id"] == "https://pid.org/1"
        assert graph[0]["rdf:name"] == "Source One"
        assert graph[1]["@id"] == "https://example.org/d/1"
        assert graph[3]["@id"] == "urn:gleaner:src1:abc123"
        assert graph[4]["prov:endedAtTime"]["@value"] == "2026-08-17"

    def test_prov_unknown_source(self):
        p = prov_graph("gleaner", "nope", "s", "u", [SRC], "2026-08-17")
        assert json.loads(p)["@graph"][0]["@id"] == "unknown"

    def test_prov_object_name(self):
        p = prov_graph("gleaner", "src1", "abc", "u", [SRC], "2026-08-17")
        name = prov_object_name("src1", p)
        assert name.startswith("prov/src1/") and name.endswith(".jsonld")

    def test_prov_deterministic(self):
        a = prov_graph("b", "src1", "s", "u", [SRC], "2026-08-17")
        b = prov_graph("b", "src1", "s", "u", [SRC], "2026-08-17")
        assert a == b

    def test_org_jsonld(self):
        doc = json.loads(build_org_jsonld(SRC))
        assert doc["@id"] == "https://gleaner.io/id/org/src1"
        assert doc["identifier"]["@id"] == "https://pid.org/1"

    def test_org_requires_fields(self):
        with pytest.raises(ValueError, match="missing required field PID"):
            build_org_jsonld(Source(name="x", url="https://x"))

    def test_org_nq_shape(self):
        nq = org_nq(SRC)
        lines = nq.strip().split("\n")
        assert all(line.endswith(" .") for line in lines)
        assert any("<https://schema.org/Organization>" in line for line in lines)
        assert org_object_name("src1") == "orgs/src1.nq"


class TestNormalizeNquads:
    """Byte-exact ports of the reference's URDNA approval goldens
    (internal/common/ldproc_test.go:40-105, approved.txt fixtures)."""

    def test_no_context_simple_golden(self):
        from gleaner_ray.jsonld_lite import normalize_nquads

        doc = '\n        {\n            "@type":"bar",\n            "SO:name":"Some type in a graph"\n        }\n'
        expected = open(
            "/root/reference/internal/common/testdata/"
            "ldproc_test.TestNormalizeTriple.noContextSimple_jsonID.approved.txt"
        ).read()
        assert normalize_nquads(doc) == expected

    def test_graph_first_golden(self):
        from gleaner_ray.jsonld_lite import normalize_nquads

        doc = (
            '{\n    "@graph":[\n        {\n            "@context": {\n'
            '                "SO":"http://schema.org/"\n            },\n'
            '            "@type":"bar",\n            "SO:name":"Some type in a graph"\n'
            "        }\n    ]\n}"
        )
        expected = open(
            "/root/reference/internal/common/testdata/"
            "ldproc_test.TestNormalizeTriple.jsonGraphFirst_jsonID.approved.txt"
        ).read()
        assert normalize_nquads(doc) == expected


class TestFrontierBuilders:
    """Seed-expansion parity: robots-advertised sitemap *indexes* walk
    their children (resources.go:95-103,125-155) and robots crawl-delay
    merges for robots-type sources too (resources.go:107-112), in BOTH
    the serial and the parallel builder."""

    ROBOTS = (
        "User-agent: *\n"
        "Crawl-delay: 2\n"
        "Disallow: /private/\n"
        "Sitemap: https://example.org/idx.xml\n"
    )
    DOCS = {
        "https://example.org/robots.txt": ROBOTS,
        "https://example.org/idx.xml": SITEMAP_INDEX_XML,
        "https://example.org/sm1.xml": SITEMAP_XML.replace("/ref/a/", "/ref/x/"),
        "https://example.org/sm2.xml": SITEMAP_XML,
    }

    def _cfg(self):
        from gleaner_ray.config import GleanerConfig, MinioConfig, SummonerConfig

        return GleanerConfig(
            minio=MinioConfig(bucket="gleaner"),
            summoner=SummonerConfig(threads=5, delay=0, mode="full"),
            sources=[
                Source(
                    sourcetype="robots",
                    name="r1",
                    url="https://example.org/robots.txt",
                    pid="https://pid.org/r1",
                    propername="Robots One",
                    domain="https://example.org",
                )
            ],
        )

    def test_serial_walks_index_children(self):
        from gleaner_ray.sources.frontier import build_frontier

        cfg = self._cfg()
        frontier, errors = build_frontier(cfg, self.DOCS.__getitem__)
        assert errors == []
        # private/ filtered by robots; sm1 children first, then sm2
        assert frontier.column("url").to_pylist() == [
            "https://example.org/ref/x/1",
            "https://example.org/ref/x/2",
            "https://example.org/ref/a/1",
            "https://example.org/ref/a/2",
        ]
        assert frontier.column("sitemap_order").to_pylist() == [0, 1, 2, 3]
        assert cfg.sources[0].delay == 2000  # merged robots crawl-delay

    def test_parallel_matches_serial(self, ray_session):
        from gleaner_ray.sources.frontier import build_frontier, build_frontier_parallel

        serial_cfg, parallel_cfg = self._cfg(), self._cfg()
        serial, s_err = build_frontier(serial_cfg, self.DOCS.__getitem__)
        parallel, p_err = build_frontier_parallel(parallel_cfg, self.DOCS.__getitem__)
        assert s_err == p_err == []
        assert parallel.column("url").to_pylist() == serial.column("url").to_pylist()
        assert (
            parallel.column("sitemap_order").to_pylist()
            == serial.column("sitemap_order").to_pylist()
        )
        assert parallel_cfg.sources[0].delay == serial_cfg.sources[0].delay == 2000
