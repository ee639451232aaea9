"""Pages-table reader: the Common-Crawl-style Parquet input.

Schema per BASELINE.json input_hint: ``url:string, warc_ts:timestamp,
html:binary, text:string, lang:string``. The reader prunes to the
columns a stage needs (html never leaves the extract stage) and splits
blocks for parallelism.
"""

from __future__ import annotations

import ray.data as rd

__all__ = ["read_pages"]

CRAWL_COLUMNS = ["url", "html", "text"]


def read_pages(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    **kwargs,
):
    """read_parquet with crawl defaults: pruned columns + block splitting
    sized to the cluster (2 blocks per CPU unless overridden)."""
    import ray

    if num_blocks is None:
        from gleaner_ray.cluster import cluster_cpus

        total = cluster_cpus(4)
        num_blocks = max(8, total * 2)
    return rd.read_parquet(path, columns=columns or CRAWL_COLUMNS, override_num_blocks=num_blocks, **kwargs)
