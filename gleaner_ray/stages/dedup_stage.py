"""Dedup (Phase D): first-writer-wins on content SHA.

Two interchangeable strategies, both yielding the identical object set
(A2 in SURVEY §2.5):

- ``SeenFilter`` — streaming: probes the sharded cuckoo-filter actor
  pool per batch (one bulk RPC per touched shard). No shuffle; the
  winning (url, seq) is whichever batch reaches the shard first —
  the same nondeterminism the reference's goroutines have, while the
  *object set* stays deterministic. This is the scale path: the pages
  stream never re-partitions.
- ``dedup_exact`` — batch: hash-shuffle on ``sha`` and keep the lowest
  ``(seq, url)`` per group. Deterministic winners; costs an all-to-all
  exchange. Used when reproducible winners matter (tests, oracles).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..state.seen import check_and_add_batched

__all__ = ["SeenFilter", "dedup_exact"]


class SeenFilter:
    """map_batches callable holding seen-shard actor handles."""

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        shas = batch.column("sha").to_pylist()
        real_pos = [i for i, s in enumerate(shas) if s]
        flags = [False] * len(shas)
        if real_pos:
            for i, flag in zip(real_pos, check_and_add_batched(self.shards, [shas[i] for i in real_pos])):
                flags[i] = flag
        return batch.append_column("seen_first", pa.array(flags, pa.bool_()))


def dedup_exact(ds, key: str = "sha"):
    """groupby(sha) -> min (seq, url) wins; adds ``seen_first``."""

    def mark_first(group: pa.Table) -> pa.Table:
        if group.num_rows and group.column("sha")[0].as_py() == "":
            # zero-candidate marker rows never win
            return group.append_column("seen_first", pa.array([False] * group.num_rows, pa.bool_()))
        if group.num_rows == 1:
            return group.append_column("seen_first", pa.array([True]))
        order = pc.sort_indices(
            group, sort_keys=[("seq", "ascending"), ("url", "ascending"), ("doc_index", "ascending")]
        )
        flags = [False] * group.num_rows
        flags[order[0].as_py()] = True
        return group.append_column("seen_first", pa.array(flags, pa.bool_()))

    return ds.groupby(key).map_groups(mark_first, batch_format="pyarrow")
