"""Resumable partitioned parquet output for operator results.

The crawl pipeline has its own stronger group-checkpoint sink
(``pipelines/summon.py``); this is the general-purpose equivalent for
the ops surface: ONE streaming ``write_parquet(partition_cols=...)``
pass, per-partition ``_SUCCESS`` markers, and exactly-once-per-partition
resume semantics — a failed run never duplicates rows and a restart
skips finished partitions whole (reference analogue: the never-overwrite
StatObject-then-Put object sink, jsonutils.go:360-388).

Resume protocol:
1. partitions with a ``_SUCCESS`` marker are done — their rows are
   filtered out BEFORE the write (broadcast membership, no shuffle);
2. partition dirs WITHOUT a marker are incomplete leftovers of a
   crashed write — they are deleted before writing (rewriting them
   whole is the only way to exactly-once without a transaction log);
3. after the write pass succeeds, every unmarked partition dir gets
   its marker.

Partitioning assumption: ``by`` is a bounded-cardinality column
(source, language, date bucket) — the marker scan is one listdir. For
unbounded keys, bucket the key upstream (``hash(key) % N``), exactly
like the object sink shards.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

__all__ = ["write_partitioned"]

_MARKER = "_SUCCESS"


def _partition_dirs(out_dir: str, by: str) -> dict[str, str]:
    """Existing ``by=value`` partition dirs -> {value: path}."""
    out = {}
    if not os.path.isdir(out_dir):
        return out
    prefix = by + "="
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if name.startswith(prefix) and os.path.isdir(p):
            out[name[len(prefix):]] = p
    return out


def write_partitioned(ds, out_dir: str, by: str, resume: bool = True) -> dict:
    """Write ``ds`` as hive-partitioned parquet with per-partition
    resume. Returns {"written": [values], "skipped": [values]}.

    One streaming pass: done-partition rows are dropped inside
    ``map_batches`` (broadcast set membership), so a resume re-reads
    the input but only re-WRITES the missing partitions.
    """
    import ray

    existing = _partition_dirs(out_dir, by)
    done = sorted(v for v, p in existing.items() if os.path.exists(os.path.join(p, _MARKER)))
    if resume:
        # incomplete leftovers of a crashed write: rewrite them whole
        for v, p in existing.items():
            if v not in done:
                shutil.rmtree(p)
    else:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        done = []

    if done:
        done_ref = ray.put(np.array(sorted(done), dtype=object))

        def drop_done(df: pd.DataFrame) -> pd.DataFrame:
            arr = ray.get(done_ref)
            vals = df[by].astype(str).to_numpy(dtype=object)
            idx = np.searchsorted(arr, vals)
            hit = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == vals)
            return df[~hit]

        ds = ds.map_batches(drop_done, batch_format="pandas")

    ds.write_parquet(out_dir, partition_cols=[by])

    written = []
    for v, p in _partition_dirs(out_dir, by).items():
        marker = os.path.join(p, _MARKER)
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
            written.append(v)
    return {"written": sorted(written), "skipped": done}
