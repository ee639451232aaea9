"""Sitemap / sitemap-index parsing — seed expansion for the frontier.

Mirrors ``/root/reference/internal/summoner/sitemaps/sitemap.go`` (XML
shapes) and the arbitration + URL-cleanup logic in
``internal/summoner/acquire/resources.go:125-171``:

- ``parse_sitemap_index``: ``<sitemapindex><sitemap><loc>`` children
- ``parse_sitemap``: ``<urlset><url>{loc,lastmod,changefreq,priority}``
- ``sitemap_url_list``: try index first; <1 entries -> parse as flat
  sitemap; otherwise walk children in index order and concatenate.
  Each loc is TrimSpace'd then stripped of spaces and newlines
  (resources.go:156-160); robots-disallowed locs are dropped
  (resources.go:162-165).

These run in the driver or in a ``flat_map`` over source rows —
cardinality is sources × sitemap files, tiny next to the page corpus.
The *output* is the frontier table (url, source, host, sitemap_order,
lastmod, priority, headless).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

__all__ = ["SitemapURL", "parse_sitemap", "parse_sitemap_index", "sitemap_url_list"]


@dataclass
class SitemapURL:
    loc: str
    lastmod: str = ""
    changefreq: str = ""
    priority: float = 0.0


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_index(xml_text: str) -> list[str]:
    """Child sitemap locations of a <sitemapindex>, [] when not an index."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        raise ValueError("could not parse as XML")
    if _local(root.tag) != "sitemapindex":
        return []
    out = []
    for sm in root:
        if _local(sm.tag) != "sitemap":
            continue
        for child in sm:
            if _local(child.tag) == "loc" and child.text:
                out.append(child.text.strip())
    return out


_LOC_FAST = re.compile(r"<loc>([^<&]*)</loc>")


def parse_sitemap(xml_text: str) -> list[SitemapURL]:
    # fast path for plain loc-only urlsets (the common machine-generated
    # shape): regex extraction at C speed; any entity, CDATA, or optional
    # per-url field falls back to the full XML parse
    if (
        "<urlset" in xml_text[:200]
        and "lastmod" not in xml_text
        and "priority" not in xml_text
        and "changefreq" not in xml_text
        and "<![CDATA[" not in xml_text
        and "&" not in xml_text
    ):
        return [SitemapURL(loc=m.strip()) for m in _LOC_FAST.findall(xml_text)]
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        raise ValueError("could not parse as XML")
    if _local(root.tag) != "urlset":
        raise ValueError("not a <urlset> sitemap")
    out = []
    for u in root:
        if _local(u.tag) != "url":
            continue
        su = SitemapURL(loc="")
        for child in u:
            t = _local(child.tag)
            text = (child.text or "").strip()
            if t == "loc":
                su.loc = text
            elif t == "lastmod":
                su.lastmod = text
            elif t == "changefreq":
                su.changefreq = text
            elif t == "priority":
                try:
                    su.priority = float(text)
                except ValueError:
                    pass
        out.append(su)
    return out


def sitemap_url_list(fetch, sitemap_url: str, robots_group=None) -> list[SitemapURL]:
    """getSitemapURLList (resources.go:125-171) with pluggable fetching.

    ``fetch(url) -> str`` resolves a sitemap URL to its XML text (HTTP in a
    live deployment; a file/fixture lookup in the sandbox). Raises on dead
    sitemaps so callers can accumulate MultiError-style and continue
    (resources.go:70-71,116-120).
    """
    xml_text = fetch(sitemap_url)
    children = parse_sitemap_index(xml_text)
    entries: list[SitemapURL] = []
    if len(children) < 1:
        entries = parse_sitemap(xml_text)
    else:
        for child_url in children:  # index order preserved
            entries.extend(parse_sitemap(fetch(child_url)))
    out = []
    for e in entries:
        if e.loc == "":
            continue
        loc = e.loc.strip().replace(" ", "").replace("\n", "")
        if robots_group is not None and not robots_group.test(loc):
            continue
        out.append(SitemapURL(loc=loc, lastmod=e.lastmod, changefreq=e.changefreq, priority=e.priority))
    return out
