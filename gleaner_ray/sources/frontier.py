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
        # overrideCrawlDelayFromRobots runs for robots sources too
        # (resources.go:107-112)
        if group is not None and group.crawl_delay:
            source.delay = max(int(group.crawl_delay * 1000), source.delay)
        entries = []
        for sm_url in robots_data.sitemaps:
            try:
                entries.extend(sitemap_url_list(fetch, sm_url, group))
            except Exception as e:
                errors.append("%s: %s" % (source.name, e))
        add(source, entries)

    return pa.table(rows, schema=schema.FRONTIER), errors


def _expand_sitemap_doc(xml_text: str, source_name: str, headless: bool, group) -> dict:
    """Parse one sitemap document into frontier column lists (no global
    order yet — the caller offsets by index position). Used both inline
    and inside Ray tasks."""
    from ..sitemaps import parse_sitemap

    urls, hosts, lastmods, priorities = [], [], [], []
    try:
        entries = parse_sitemap(xml_text)
    except ValueError as e:
        return {
            "url": urls, "host": hosts, "lastmod": lastmods, "priority": priorities,
            "source": source_name, "headless": headless, "error": str(e),
        }
    for e in entries:
        if e.loc == "":
            continue
        loc = e.loc.strip()
        if " " in loc or "\n" in loc:
            loc = loc.replace(" ", "").replace("\n", "")
        if group is not None and not group.test(loc):
            continue
        urls.append(loc)
        hosts.append(canonical_host(loc))
        lastmods.append(e.lastmod)
        priorities.append(e.priority)
    return {
        "url": urls,
        "host": hosts,
        "lastmod": lastmods,
        "priority": priorities,
        "source": source_name,
        "headless": headless,
        "error": None,
    }


def build_frontier_parallel(cfg: GleanerConfig, fetch=default_fetch) -> tuple[pa.Table, list[str]]:
    """Seed expansion with one Ray task per sitemap document.

    Index files and robots are fetched on the driver (tiny); every child
    urlset parses + robots-filters in its own task; global
    ``sitemap_order`` is assigned by offsetting each child's local order
    by the post-filter counts of the children before it in index order —
    identical output to ``build_frontier``. Falls back to the serial
    builder when Ray isn't initialised."""
    import ray

    if not ray.is_initialized():
        return build_frontier(cfg, fetch)
    from ..robots import parse_robots
    from ..sitemaps import parse_sitemap_index

    expand_task = ray.remote(num_cpus=1)(_expand_sitemap_doc)
    errors: list[str] = []
    jobs: list = []  # ((source_order, sitemap_rank, child_rank), future)
    sources = [s for s in cfg.sources if s.active]

    for s_ord, source in enumerate(sources):
        group = None
        sitemap_urls: list[str] = []
        try:
            if source.sourcetype == "robots":
                robots_data = parse_robots(fetch(source.url))
                group = robots_data.find_group(USER_AGENT)
                # overrideCrawlDelayFromRobots runs for robots sources too
                # (resources.go:107-112)
                if group is not None and group.crawl_delay:
                    source.delay = max(int(group.crawl_delay * 1000), source.delay)
                sitemap_urls = list(robots_data.sitemaps)
            elif source.sourcetype == "sitemap":
                if not cfg.rude:
                    try:
                        group = parse_robots(fetch(source.domain.rstrip("/") + "/robots.txt")).find_group(
                            USER_AGENT
                        )
                    except (IOError, OSError):
                        group = None
                if group is not None and group.crawl_delay:
                    source.delay = max(int(group.crawl_delay * 1000), source.delay)
                sitemap_urls = [source.url]
            else:
                continue
        except Exception as e:
            errors.append("%s: %s" % (source.name, e))
            continue
        # every seed sitemap — config-listed or robots-advertised — gets
        # the same index-or-flat arbitration as sitemap_url_list
        # (resources.go:125-155): an index fans out one task per child in
        # index order, a flat urlset expands as its own task
        for sm_rank, sm_url in enumerate(sitemap_urls):
            try:
                top = fetch(sm_url)
                try:
                    children = parse_sitemap_index(top)
                except ValueError as e:
                    errors.append("%s: %s" % (source.name, e))
                    continue
                if children:
                    for child_rank, child_url in enumerate(children):
                        jobs.append(
                            (
                                (s_ord, sm_rank, child_rank),
                                expand_task.remote(fetch(child_url), source.name, source.headless, group),
                            )
                        )
                else:
                    jobs.append(
                        ((s_ord, sm_rank, 0), expand_task.remote(top, source.name, source.headless, group))
                    )
            except Exception as e:
                errors.append("%s: %s" % (source.name, e))

    parts = []
    results = ray.get([f for _, f in jobs])
    ordered = sorted(zip([key for key, _ in jobs], results))
    offsets: dict[str, int] = {}
    for _key, res in ordered:
        if res.get("error"):
            errors.append("%s: %s" % (res["source"], res["error"]))
            continue
        n = len(res["url"])
        base = offsets.get(res["source"], 0)
        offsets[res["source"]] = base + n
        parts.append(
            pa.table(
                {
                    "url": pa.array(res["url"], pa.string()),
                    "source": pa.array([res["source"]] * n, pa.string()),
                    "host": pa.array(res["host"], pa.string()),
                    "sitemap_order": pa.array(range(base, base + n), pa.int64()),
                    "lastmod": pa.array(res["lastmod"], pa.string()),
                    "priority": pa.array(res["priority"], pa.float32()),
                    "headless": pa.array([res["headless"]] * n, pa.bool_()),
                }
            )
        )
    if not parts:
        return pa.table({k.name: [] for k in schema.FRONTIER}, schema=schema.FRONTIER), errors
    return pa.concat_tables(parts), errors


def frontier_from_parquet(path: str, **read_kwargs):
    """10^10-scale path: the frontier is itself a Parquet table."""
    import ray.data as rd

    return rd.read_parquet(path, **read_kwargs)
