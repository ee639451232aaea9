"""gleaner_ray — a Ray-Data-native structured-data harvesting engine.

A from-scratch reimplementation of the capabilities of
internetofwater/gleaner (reference at /root/reference, Go) on top of
ray.data: sitemap-seeded URL frontiers, robots/politeness admission,
JSON-LD extraction from Common-Crawl-style Parquet page tables,
context fixups, SHA-based identity and first-writer-wins dedup via a
sharded cuckoo-filter actor pool, plus the training-data operators a
large-scale pipeline needs (dedup families, similarity search, text
analysis).

Everything here is built on public Ray / Arrow APIs only. The data
plane is ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow
batches; stateful stages are actor pools; wide steps use
groupby/repartition keyed as documented per stage.
"""

__version__ = "0.1.0"

from . import rayfix as _rayfix  # noqa: E402,F401  (schema-broadcast race guard)
