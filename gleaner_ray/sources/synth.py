"""Deterministic synthetic crawl corpus (pages + sitemaps + robots).

``BASELINE.json``'s input_hint mandates a Common-Crawl-style Parquet
pages table; no external data is allowed, so the corpus is synthesised
deterministically from the driver-provided ``documents`` table of a
scale-factor directory (seeded, byte-stable across runs). Page classes
cycle through every fixture family the reference's tests exercise
(FIXTURES.md §1): canonical JSON-LD, duplicate content, string/array/
http contexts, relative @ids, ItemLists, graph arrays, @graph wrapping,
invalid JSON-LD, no-JSON-LD, .jsonld raw bodies, multi-script pages,
robots-disallowed paths, and sitemap URLs with no page (HTTP-error
analogue).

Skew is explicit: one mega-host receives ~50% of all URLs (north rule's
"single-host sitemap indexes" case); its sitemap is an index of child
sitemaps, the small hosts use flat sitemaps, and one source advertises
its sitemap only through robots.txt (``robots`` sourcetype).

URL shape encodes the fixture class — ``https://<host>/ref/<class>/<i>``
— so a DuckDB oracle can filter classes with a LIKE and reproduce the
extraction byte-for-byte for the SQL-expressible families.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import GleanerConfig, MinioConfig, Source, SummonerConfig

__all__ = ["CLASSES", "generate_corpus", "corpus_config", "corpus_dir_for"]

CLASSES = [
    "canon",  # canonical, fixup-stable, SQL-extractable
    "dup",  # byte-identical payload per source (dedup path)
    "ctxstring",  # @context is a string
    "ctxarray",  # @context is an array -> standardized
    "httpurl",  # @vocab http://schema.org (no slash)
    "relid",  # Dataset with relative @id
    "itemlist",  # ItemList with relative item ids
    "grapharray",  # top-level JSON array of docs
    "atgraph",  # @graph wrapped, canonical-stable
    "invalid",  # broken JSON in the script tag
    "nojsonld",  # page without any JSON-LD
    "jsonext",  # url ends .jsonld, raw JSON body
    "multi",  # two script tags
    "private",  # robots-disallowed path
]

MEGA_HOST = "big.example.org"
HOSTS = {
    "geo0": MEGA_HOST,
    "hydro1": "h1.example.org",
    "wq2": "h2.example.org",
    "head3": "h3.example.org",
    "robo4": "h4.example.org",
}
SOURCE_NAMES = list(HOSTS)

# cross-host mirror pair (v6): byte-identical /mirror/<j> bodies on both
MIRROR_HOSTS = ("h1.example.org", "h2.example.org")

_HTML_PREFIX = '<!DOCTYPE html><html><head><meta charset="utf-8"><title>%s</title>\n<script type="application/ld+json">'
_HTML_SUFFIX = "</script>\n</head><body><p>%s</p></body></html>"


def _clean(text: str, limit: int = 160) -> str:
    """Description text safe for embedding (no tag-breaking '<', no quotes-breaking handled by json)."""
    return text.replace("<", " ").replace(">", " ")[:limit].strip()


def _payload(cls: str, url: str, name: str, desc: str) -> str:
    canon = (
        '{"@context":{"@vocab":"https://schema.org/"},"@type":"Dataset","@id":%s,"name":%s,"description":%s}'
        % (json.dumps(url), json.dumps(name), json.dumps(desc))
    )
    if cls in ("canon", "multi", "jsonext", "private"):
        return canon
    if cls == "dup":
        # per-source constant payload: every dup page serves identical bytes
        return canon
    if cls == "ctxstring":
        return '{"@context": "http://schema.org/", "@type": "Dataset", "@id": %s, "name": %s}' % (
            json.dumps(url),
            json.dumps(name),
        )
    if cls == "ctxarray":
        return (
            '{"@context": ["https://schema.org/", {"dct": "https://purl.org/dc/terms/"}], '
            '"@type": "Dataset", "@id": %s, "name": %s}' % (json.dumps(url), json.dumps(name))
        )
    if cls == "httpurl":
        return '{"@context": {"@vocab": "http://schema.org"}, "@type": "Dataset", "@id": %s, "name": %s}' % (
            json.dumps(url),
            json.dumps(name),
        )
    if cls == "relid":
        return '{"@context": {"@vocab": "https://schema.org/"}, "@type": "Dataset", "@id": "dataset-%s", "name": %s}' % (
            name.split()[-1],
            json.dumps(name),
        )
    if cls == "itemlist":
        return (
            '{"@context": {"@vocab": "https://schema.org/"}, "@type": "ItemList", '
            '"itemListElement": [{"@type": "ListItem", "item": {"@type": "Dataset", "@id": "item-a-%s"}}, '
            '{"@type": "ListItem", "item": {"@type": "Dataset", "@id": "item-b-%s"}}]}'
            % (name.split()[-1], name.split()[-1])
        )
    if cls == "grapharray":
        return '[{"@type": "Dataset", "name": %s}, {"@type": "Dataset", "name": %s}]' % (
            json.dumps(name + " part1"),
            json.dumps(name + " part2"),
        )
    if cls == "atgraph":
        return '{"@context":{"SO":"https://schema.org/"},"@graph":[{"@type":"SO:Dataset","SO:name":%s}]}' % json.dumps(
            name
        )
    if cls == "invalid":
        return "{ INCORRECTSYNTAX %s" % name
    return canon


def _page_html(cls: str, payload: str, name: str, desc: str) -> tuple[bytes, str]:
    if cls == "jsonext":
        return payload.encode(), payload
    if cls == "nojsonld":
        html = "<!DOCTYPE html><html><head><title>%s</title></head><body><p>%s</p></body></html>" % (name, desc)
        return html.encode(), "%s %s" % (name, desc)
    body = (_HTML_PREFIX % name) + payload + (_HTML_SUFFIX % desc)
    if cls == "multi":
        second = '{"@context": "http://schema.org/", "@type": "Dataset", "name": %s}' % json.dumps(name + " second")
        body = body.replace(
            "</script>\n</head>",
            '</script>\n<script type="application/ld+json">%s</script>\n</head>' % second,
            1,
        )
    return body.encode(), "%s %s" % (name, desc)


def _assign_source(i: int) -> str:
    # deterministic skew: even i -> mega host (50%); odd spread over the rest
    if i % 2 == 0:
        return "geo0"
    return SOURCE_NAMES[1 + (i // 2) % 4]


def _url_for(i: int) -> str:
    """URL of page ``i`` as a pure function of the index (mirrors the
    generation loop) — used to synthesise deterministic outlink targets."""
    cls = CLASSES[i % len(CLASSES)]
    host = HOSTS[_assign_source(i)]
    suffix = ".jsonld" if cls == "jsonext" else ""
    if cls == "private":
        return "https://%s/private/%d%s" % (host, i, suffix)
    return "https://%s/ref/%s/%d%s" % (host, cls, i, suffix)


def _nav_links(i: int, n_pages: int) -> bytes:
    """Deterministic outlink footer for page ``i``: 1-4 anchors whose
    targets are a fixed multiplicative-hash walk over the page index
    space, plus (every 5th page, v7) one anchor to an EXTERNAL host
    that has no page row — the link-discovery signal for frontier
    expansion (``ops/linkgraph.discovered_urls``) and the reason the
    graph operators' dst-resolution masks see real misses. Gives the
    corpus a real web link structure (same-host and cross-host edges,
    skewed in-degree toward the mega host) for the link-graph operator
    family; injected before ``</body>`` so the JSON-LD script line —
    and every byte-level extraction oracle that reads it — is
    untouched."""
    k = 1 + (i % 4)
    anchors = []
    for j in range(k):
        t = (i * 2654435761 + j * 40503 + 12289) % n_pages
        anchors.append('<a href="%s">l%d</a>' % (_url_for(t), j))
    if i % 5 == 0:
        # external targets are many-to-one: i and i+5 in the same decade
        # point at the SAME discovered URL (host and path both derive
        # from i//10), so reference counts > 1 exist
        anchors.append(
            '<a href="https://ext%d.example.net/p/%d">ext</a>' % ((i // 10) % 7, (i // 10) * 10)
        )
    # reciprocal pair planting (v8): pages (i, i+1) at i % 17 == 0 link
    # to EACH OTHER — the hash-walk targets above are effectively random
    # so mutual edges never arise from them; these planted pairs give
    # ``ops/linkgraph.reciprocal_links`` real positives (both members
    # must carry a nav, i.e. be non-jsonext, for the pair to close)
    p = i + 1 if i % 17 == 0 else (i - 1 if i % 17 == 1 else -1)
    if 0 <= p < n_pages:
        anchors.append('<a href="%s">peer</a>' % _url_for(p))
    return ("\n<nav>%s</nav>" % "".join(anchors)).encode()


def corpus_dir_for(sf_dir: str, root: str = "/tmp/gleaner_ray_corpus") -> str:
    return os.path.join(root, os.path.basename(os.path.normpath(sf_dir)))


def generate_corpus(
    sf_dir: str,
    out_dir: str | None = None,
    n_pages: int | None = None,
    rows_per_file: int = 25_000,
    force: bool = False,
) -> str:
    """Generate the corpus for a scale dir; returns the corpus directory.

    Deterministic: same sf_dir -> same bytes. The page count scales with
    the sf (lineitem row count: ~6k/60k/600k at sf 0.001/0.01/0.1);
    document texts cycle when the corpus outnumbers them. Skips
    generation when the output manifest already matches.
    """
    out_dir = out_dir or corpus_dir_for(sf_dir)
    manifest_path = os.path.join(out_dir, "manifest.json")
    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = pq.read_table(docs_path, columns=["doc_id", "text", "source"])
    if n_pages is None:
        n_pages = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    stamp = {"sf_dir": os.path.abspath(sf_dir), "n_docs": docs.num_rows, "n_pages": n_pages, "version": 11}
    if not force and os.path.exists(manifest_path):
        try:
            if json.load(open(manifest_path)) == stamp:
                return out_dir
        except (ValueError, OSError):
            pass
    # clear before writing: a regeneration that emits FEWER part files
    # than the previous version (different n_pages / layout) must not
    # leave stale tail parts behind — leftovers duplicate rows (seen as
    # doubled mirror URLs on the 2x bench corpus, which silently pushed
    # pagerank off its broadcast path via the url-uniqueness check)
    import shutil as _sh

    for sub in ("pages", "sitemaps", "robots"):
        _sh.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        os.makedirs(os.path.join(out_dir, sub))

    doc_texts = docs.column("text").to_pylist()
    n_docs = len(doc_texts)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    sitemap_urls: dict[str, list[str]] = {s: [] for s in SOURCE_NAMES}
    part = 0
    base_ts = 1700000000000  # fixed epoch ms

    def flush():
        nonlocal part, urls, tss, htmls, texts, langs
        if not urls:
            return
        table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("ms")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )
        pq.write_table(table, os.path.join(out_dir, "pages", "part-%05d.parquet" % part))
        part += 1
        urls, tss, htmls, texts, langs = [], [], [], [], []

    for i in range(n_pages):
        cls = CLASSES[i % len(CLASSES)]
        source = _assign_source(i)
        host = HOSTS[source]
        suffix = ".jsonld" if cls == "jsonext" else ""
        if cls == "private":
            url = "https://%s/private/%d%s" % (host, i, suffix)
        else:
            url = "https://%s/ref/%s/%d%s" % (host, cls, i, suffix)
        doc_text = doc_texts[i % n_docs]
        name = "Dataset %d" % i
        desc = _clean(doc_text)
        if cls == "dup":
            # constant per source -> byte-identical duplicate content
            payload = _payload("dup", "https://%s/ref/dup/master" % host, "Master %s" % source, "shared")
        else:
            payload = _payload(cls, url, name, desc)
        html, text = _page_html(cls, payload, name, desc)
        if cls != "jsonext":  # raw-JSON bodies carry no markup
            html = html.replace(b"</body>", _nav_links(i, n_pages) + b"</body>", 1)
        if cls == "dup":
            # rel=canonical planting (v9): every dup page declares the
            # per-source master as canonical — the keep/drop signal for
            # canonical-URL resolution. The href depends only on the
            # host, so dup pages within a source stay byte-identical.
            html = html.replace(
                b"</title>",
                ('</title><link rel="canonical" href="https://%s/ref/dup/master">' % host).encode(),
                1,
            )
        urls.append(url)
        tss.append(base_ts + i * 1000)
        htmls.append(html)
        texts.append(text)
        langs.append("en" if i % 7 else "de")
        sitemap_urls[source].append(url)
        if len(urls) >= rows_per_file:
            flush()

    # mirror section (v6): byte-identical bodies served under different
    # URLs on TWO hosts (h1 <-> h2) — the cross-host mirror signal for
    # mirror-detection operators. NOT listed in any sitemap, so the
    # frontier never admits them and every crawl-path oracle is
    # untouched; they exist only in the pages table (like real crawl
    # data, where mirrors are fetched via links, not sitemaps). Content
    # depends only on j, so both copies are identical down to the nav.
    n_mirror = max(4, n_pages // 128)
    for j in range(n_mirror):
        name = "Mirror %d" % j
        desc = _clean(doc_texts[(j * 13) % n_docs])
        # v9: both mirror copies declare the h1 copy canonical — the
        # same tag bytes on both hosts, so the bodies remain identical
        body = (
            '<!DOCTYPE html><html><head><title>%s</title>'
            '<link rel="canonical" href="https://%s/mirror/%d"></head><body><p>%s</p>'
            % (name, MIRROR_HOSTS[0], j, desc)
        )
        mhtml = body.encode() + _nav_links(j * 31 % n_pages, n_pages) + b"</body></html>"
        mtext = "%s %s" % (name, desc)
        for k, mh in enumerate(MIRROR_HOSTS):
            urls.append("https://%s/mirror/%d" % (mh, j))
            tss.append(base_ts + (n_pages + 2 * j + k) * 1000)
            htmls.append(mhtml)
            texts.append(mtext)
            langs.append("en")
            if len(urls) >= rows_per_file:
                flush()

    # redirect chains (v10): /redir/{j}/{k} hop pages resolve through
    # 1-3 meta-refresh hops to a real /ref/ page — the redirect-graph
    # signal for ``pipelines/recrawl.resolve_redirects``. Like /mirror/,
    # never listed in a sitemap (crawl-admission oracles exclude them).
    extra_ts = n_pages + 2 * n_mirror
    n_redir = max(3, n_pages // 256)
    for j in range(n_redir):
        hops = 1 + j % 3
        rhost = HOSTS[_assign_source(j)]
        target = _url_for((j * 37) % n_pages)
        chain = ["https://%s/redir/%d/%d" % (rhost, j, k) for k in range(hops)]
        for k, u in enumerate(chain):
            nxt = chain[k + 1] if k + 1 < hops else target
            rhtml = (
                '<!DOCTYPE html><html><head><title>Redirecting %d</title>'
                '<meta http-equiv="refresh" content="0; url=%s"></head>'
                '<body><p>Moved to <a href="%s">here</a>.</p></body></html>' % (j, nxt, nxt)
            )
            urls.append(u)
            tss.append(base_ts + extra_ts * 1000)
            extra_ts += 1
            htmls.append(rhtml.encode())
            texts.append("Moved to %s" % nxt)
            langs.append("en")
            if len(urls) >= rows_per_file:
                flush()

    # soft-404s (v10): /gone/{j} pages whose TITLE or error phrase marks
    # a not-found body served with (implicitly) HTTP 200 — plus negative
    # controls at /gone/info/{j} that merely DISCUSS 404s in the body,
    # which the title/phrase rule must not flag.
    _404_TITLES = ["404 Not Found", "Page not found", "Oops - this page does not exist", "Error 404"]
    n_gone = max(2, n_pages // 512)
    for j in range(n_gone):
        ghost = HOSTS[_assign_source(j * 3 + 1)]
        title = _404_TITLES[j % len(_404_TITLES)]
        body = "Sorry. The page you requested was not found on this server. (ref %d)" % j
        ghtml = (
            "<!DOCTYPE html><html><head><title>%s</title></head><body><p>%s</p></body></html>"
            % (title, body)
        )
        urls.append("https://%s/gone/%d" % (ghost, j))
        tss.append(base_ts + extra_ts * 1000)
        extra_ts += 1
        htmls.append(ghtml.encode())
        texts.append("%s %s" % (title, body))
        langs.append("en")
        if j % 3 == 0:
            # negative control: clean title, body casually mentions 404
            nhtml = (
                "<!DOCTYPE html><html><head><title>HTTP status codes explained %d</title></head>"
                "<body><p>A 404 response means the resource is absent; clients should back off.</p>"
                "</body></html>" % j
            )
            urls.append("https://%s/gone/info/%d" % (ghost, j))
            tss.append(base_ts + extra_ts * 1000)
            extra_ts += 1
            htmls.append(nhtml.encode())
            texts.append("HTTP status codes explained %d" % j)
            langs.append("en")
        if len(urls) >= rows_per_file:
            flush()
    flush()

    # hreflang alternate clusters (v11): /alt/{j}/{lang} language
    # variants tied together with <link rel="alternate" hreflang=...>
    # annotations — the i18n duplicate-cluster signal for
    # ``pipelines/recrawl.hreflang_clusters``. Every fourth cluster
    # annotates ONLY on the en page (one-way annotations, the common
    # real-web misconfiguration) so the closure — not mere tag
    # symmetry — is what groups them. Like /mirror/ and /redir/,
    # never listed in a sitemap (crawl-admission oracles exclude
    # the /alt/ prefix).
    _ALT_LANGS = ["en", "de", "fr", "ja"]
    n_alt = max(3, n_pages // 384)
    for j in range(n_alt):
        langs_j = _ALT_LANGS[: 2 + j % 3]
        ahost = HOSTS[_assign_source(j * 5 + 2)]
        cluster_urls = {L: "https://%s/alt/%d/%s" % (ahost, j, L) for L in langs_j}
        partial = j % 4 == 0  # only the en page carries the tags
        for L in langs_j:
            if partial and L != "en":
                tags = ""
            else:
                tags = "".join(
                    '<link rel="alternate" hreflang="%s" href="%s">' % (M, cluster_urls[M])
                    for M in langs_j
                )
            abody = (
                '<!DOCTYPE html><html><head><title>Alt %d %s</title>%s</head>'
                "<body><p>Variant %s of cluster %d.</p></body></html>" % (j, L, tags, L, j)
            )
            urls.append(cluster_urls[L])
            tss.append(base_ts + extra_ts * 1000)
            extra_ts += 1
            htmls.append(abody.encode())
            texts.append("Variant %s of cluster %d." % (L, j))
            langs.append(L)
            if len(urls) >= rows_per_file:
                flush()
    flush()

    # every ~97th frontier URL additionally exists only in the sitemap
    # (no page row): the HTTP-error analogue, dropped by the join
    for s in SOURCE_NAMES:
        extra = ["https://%s/ref/missing/%d" % (HOSTS[s], k) for k in range(max(1, len(sitemap_urls[s]) // 97))]
        sitemap_urls[s].extend(extra)

    _write_sitemaps(out_dir, sitemap_urls)
    _write_robots(out_dir)
    with open(manifest_path, "w") as f:
        json.dump(stamp, f)
    return out_dir


def _urlset(urls: list[str]) -> str:
    items = "".join("  <url><loc>%s</loc></url>\n" % u for u in urls)
    return '<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n%s</urlset>\n' % items


def _write_sitemaps(out_dir: str, sitemap_urls: dict[str, list[str]]) -> None:
    sm_dir = os.path.join(out_dir, "sitemaps")
    for source, urls in sitemap_urls.items():
        if source == "geo0":
            # mega host: a sitemap index of child files (10k urls each)
            chunk = 10_000
            children = [urls[i : i + chunk] for i in range(0, len(urls), chunk)] or [[]]
            child_names = []
            for k, child in enumerate(children):
                nm = "geo0_child_%03d.xml" % k
                child_names.append(nm)
                with open(os.path.join(sm_dir, nm), "w") as f:
                    f.write(_urlset(child))
            idx = "".join(
                "  <sitemap><loc>file://%s/%s</loc></sitemap>\n" % (sm_dir, nm) for nm in child_names
            )
            with open(os.path.join(sm_dir, "geo0.xml"), "w") as f:
                f.write(
                    '<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n%s</sitemapindex>\n'
                    % idx
                )
        else:
            with open(os.path.join(sm_dir, "%s.xml" % source), "w") as f:
                f.write(_urlset(urls))


def _write_robots(out_dir: str) -> None:
    rb_dir = os.path.join(out_dir, "robots")
    for source, host in HOSTS.items():
        lines = ["User-agent: *", "Disallow: /private/"]
        if source == "hydro1":
            lines.append("Crawl-delay: 1")
        if source == "robo4":
            lines.append("Sitemap: file://%s/sitemaps/robo4.xml" % out_dir)
        with open(os.path.join(rb_dir, "%s.txt" % host), "w") as f:
            f.write("\n".join(lines) + "\n")


def corpus_fetch(out_dir: str):
    """Fetcher for the synthetic corpus: file:// URLs read directly;
    ``https://<host>/robots.txt`` resolves into the corpus robots dir
    (standing in for the network the reference fetches robots from)."""
    from urllib.parse import urlparse

    def fetch(url: str) -> str:
        parsed = urlparse(url)
        if parsed.scheme == "file":
            with open(parsed.path) as f:
                return f.read()
        if parsed.path == "/robots.txt":
            path = os.path.join(out_dir, "robots", "%s.txt" % parsed.netloc.lower())
            with open(path) as f:
                return f.read()
        raise IOError("no network access for %s" % url)

    return fetch


def corpus_config(out_dir: str) -> GleanerConfig:
    """The GleanerConfig describing the synthetic corpus's sources."""
    sm = os.path.join(out_dir, "sitemaps")
    sources = []
    for name, host in HOSTS.items():
        sources.append(
            Source(
                sourcetype="robots" if name == "robo4" else "sitemap",
                name=name,
                url=(
                    "file://%s/robots/%s.txt" % (out_dir, host)
                    if name == "robo4"
                    else "file://%s/%s.xml" % (sm, name)
                ),
                headless=(name == "head3"),
                pid="https://pid.example.org/%s" % name,
                propername="Synthetic %s" % name,
                domain="https://%s" % host,
            )
        )
    # dead sitemap source: error-isolation path (root_internal_test.go:159-191)
    sources.append(
        Source(
            sourcetype="sitemap",
            name="dead5",
            url="file://%s/does_not_exist.xml" % sm,
            pid="https://pid.example.org/dead5",
            propername="Dead Source",
            domain="https://dead.example.org",
        )
    )
    return GleanerConfig(
        minio=MinioConfig(bucket="gleaner"),
        summoner=SummonerConfig(threads=5, delay=0, mode="full"),
        sources=sources,
    )
