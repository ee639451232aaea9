"""Seed expansion: config sources -> frontier table (Phase A).

Re-states ``ResourceURLs`` (/root/reference/internal/summoner/acquire/
resources.go:24-122) over pluggable fetching (``file://`` in the
sandbox, HTTP in a live deployment):

- sitemap sources: robots for the domain (skipped with ``rude``;
  missing robots -> continue without, resources.go:51-57), crawl-delay
  merge, index-or-flat sitemap expansion, per-URL robots filter;
- robots sources: the robots.txt's ``Sitemap:`` lines are the seeds
  (resources.go:81-115);
- per-source errors accumulate MultiError-style and do NOT block other
  sources (resources.go:70-71,116-120).

Output is an Arrow frontier table (schema.FRONTIER): ``sitemap_order``
is the in-source position — the per-host crawl order the north rule
requires us to reproduce. Cardinality is sources × sitemap entries;
driver-side for config-listed sources, or read straight from Parquet
(``frontier_from_parquet``) when the frontier itself is at 10^10 scale.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa

from ..config import USER_AGENT, GleanerConfig
from ..robots import parse_robots
from ..sitemaps import sitemap_url_list
from ..urlutils import canonical_host
from .. import schema

__all__ = ["default_fetch", "build_frontier", "frontier_from_parquet"]


def default_fetch(url: str) -> str:
    """file:// fetcher for the sandboxed data plane; HTTP would go here."""
    parsed = urlparse(url)
    if parsed.scheme == "file":
        with open(parsed.path) as f:
            return f.read()
    raise IOError("no network access for %s" % url)


def build_frontier(
    cfg: GleanerConfig,
    fetch=default_fetch,
    headless: bool | None = None,
) -> tuple[pa.Table, list[str]]:
    """Expand every active source; returns (frontier table, error list)."""
    errors: list[str] = []
    rows: dict[str, list] = {k.name: [] for k in schema.FRONTIER}

    if headless is None:
        sources = [s for s in cfg.sources if s.active]
    else:
        sources = cfg.filter_sources_by_headless(headless)

    def add(source, entries):
        for order, e in enumerate(entries):
            rows["url"].append(e.loc)
            rows["source"].append(source.name)
            rows["host"].append(canonical_host(e.loc))
            rows["sitemap_order"].append(order)
            rows["lastmod"].append(e.lastmod)
            rows["priority"].append(e.priority)
            rows["headless"].append(source.headless)

    for source in [s for s in sources if s.sourcetype == "sitemap"]:
        group = None
        if not cfg.rude:
            try:
                robots_txt = fetch(source.domain.rstrip("/") + "/robots.txt")
                group = parse_robots(robots_txt).find_group(USER_AGENT)
            except (IOError, OSError):
                group = None  # continue without robots (resources.go:51-57)
        if group is not None and group.crawl_delay:
            source.delay = max(int(group.crawl_delay * 1000), source.delay)
        try:
            entries = sitemap_url_list(fetch, source.url, group)
        except Exception as e:  # dead sitemap: isolate, continue
            errors.append("%s: %s" % (source.name, e))
            continue
        add(source, entries)

    for source in [s for s in sources if s.sourcetype == "robots"]:
        try:
            robots_data = parse_robots(fetch(source.url))
        except Exception as e:
            errors.append("%s: %s" % (source.name, e))
            continue
        group = robots_data.find_group(USER_AGENT)
        entries = []
        for sm_url in robots_data.sitemaps:
            try:
                entries.extend(sitemap_url_list(fetch, sm_url, group))
            except Exception as e:
                errors.append("%s: %s" % (source.name, e))
        add(source, entries)

    return pa.table(rows, schema=schema.FRONTIER), errors


def frontier_from_parquet(path: str, **read_kwargs):
    """10^10-scale path: the frontier is itself a Parquet table."""
    import ray.data as rd

    return rd.read_parquet(path, **read_kwargs)
