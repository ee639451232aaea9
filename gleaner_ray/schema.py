"""Arrow schemas for every table that crosses a stage boundary.

The canonical input is the Common-Crawl-style pages table from
``BASELINE.json``'s input_hint: ``(url:string, warc_ts:timestamp[ms],
html:binary, text:string, lang:string)``. Downstream tables mirror
SURVEY §1.2's mapping of the reference's in-memory abstractions.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# frontier rows after seed expansion (FIXTURES.md §3; sitemap.go:29-34)
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("source", pa.string()),
        ("host", pa.string()),
        ("sitemap_order", pa.int64()),
        ("lastmod", pa.string()),
        ("priority", pa.float32()),
        ("headless", pa.bool_()),
    ]
)

# one row per accepted JSON-LD document (post extract+validate)
CANDIDATES = pa.schema(
    [
        ("url", pa.string()),
        ("source", pa.string()),
        ("host", pa.string()),
        ("seq", pa.int64()),  # per-host crawl order
        ("doc_index", pa.int32()),  # candidate index within the page
        ("jsonld", pa.large_string()),
    ]
)

# final results table (FIXTURES.md §5)
RESULTS = pa.schema(
    [
        ("url", pa.string()),
        ("source", pa.string()),
        ("host", pa.string()),
        ("seq", pa.int64()),
        ("doc_index", pa.int32()),
        ("jsonld", pa.large_string()),
        ("sha", pa.string()),
        ("object_name", pa.string()),
        ("seen_first", pa.bool_()),
    ]
)

# per-partition metrics manifest rows (north rule: metrics + lineage)
METRICS = pa.schema(
    [
        ("partition", pa.string()),
        ("source", pa.string()),
        ("fetched", pa.int64()),
        ("extracted", pa.int64()),
        ("valid", pa.int64()),
        ("uploaded", pa.int64()),
        ("skipped_dup", pa.int64()),
        ("errors", pa.int64()),
    ]
)
