"""Sharded first-writer-wins seen-set — the crawl's dedup state (ST2).

The reference's dedup is object-store existence per SHA
(/root/reference/internal/summoner/acquire/jsonutils.go:383-386): the
first goroutine to StatObject-miss uploads; later ones skip; a benign
TOCTOU race means two writers can both pass the check and write
identical bytes (SURVEY §7.4). Here each shard is a Ray actor owning
``hash(sha) % n_shards`` of the key space, so check-and-add is
*serialized per shard* — strictly stronger than the reference's race.

Scale path (the one that runs): keys are stored as 8-byte truncated
digests — a small "hot" Python set of ints absorbs recent adds and is
periodically compacted into a sorted uint64 numpy array probed with
vectorized searchsorted. At 10^10 keys over 256 shards that is ~312 MB
flat per shard (vs ~4 GB for hex strings in a Python set). Truncation
to 64 bits admits ~3 expected birthday collisions at 10^10 keys (a
colliding unique document is treated as seen) — below the reference's
own SHA-1 collision exposure, and zero in practice below ~10^8 keys.

A cuckoo filter per shard mirrors the key set as the O(1) "maybe"
fast path for a future disk/object-store-backed exact authority; its
snapshot rides along with the compact array.

Batched RPC: callers group a whole Arrow batch's shas per shard and
make ONE call per shard per batch (SURVEY ST2 "bulk seen?/add RPCs").
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter, _h64

__all__ = ["SeenShard", "create_seen_shards", "check_and_add_batched"]


def _key64(sha: str) -> int:
    """Truncated 64-bit digest of a sha hex string (non-hex inputs fall
    back to a keyed siphash so arbitrary keys still work). The LAST 16
    hex chars: uniform for real digests, and zero-padded small test keys
    keep their distinguishing low digits (the first 16 would all be 0)."""
    try:
        return int(sha[-16:], 16)
    except ValueError:
        return _h64(sha.encode())


def _keys_arr(shas: list[str]) -> np.ndarray:
    return np.fromiter((_key64(s) for s in shas), dtype=np.uint64, count=len(shas))


@ray.remote(num_cpus=0.1)
class SeenShard:
    """One shard of the seen-set: hot set + compacted sorted array."""

    # hot set above this size is merged into the sorted cold array; the
    # bound caps per-key Python-set overhead at ~16 MB per shard
    COMPACT_AT = 1 << 18

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity)
        self.hot: set[int] = set()
        self.cold: np.ndarray = np.empty(0, dtype=np.uint64)

    # -- membership core ----------------------------------------------------
    def _in_cold(self, vals: np.ndarray) -> np.ndarray:
        if not len(self.cold) or not len(vals):
            return np.zeros(len(vals), dtype=bool)
        pos = np.searchsorted(self.cold, vals)
        pos = np.minimum(pos, len(self.cold) - 1)
        return self.cold[pos] == vals

    def _compact(self) -> None:
        if not self.hot:
            return
        hot_arr = np.fromiter(self.hot, dtype=np.uint64, count=len(self.hot))
        self.cold = np.union1d(self.cold, hot_arr)
        self.hot.clear()

    def check_and_add(self, shas: list[str]) -> list[bool]:
        """For each sha IN ORDER: True if this call is the first writer
        (intra-batch duplicates: only the first occurrence wins)."""
        vals = _keys_arr(shas)
        in_cold = self._in_cold(vals)
        out: list[bool] = []
        hot = self.hot
        new_shas: list[str] = []
        for i, v in enumerate(vals.tolist()):
            if in_cold[i] or v in hot:
                out.append(False)
            else:
                hot.add(v)
                new_shas.append(shas[i])
                out.append(True)
        self.filter.add_many(new_shas)
        if len(hot) >= self.COMPACT_AT:
            self._compact()
        return out

    def contains(self, shas: list[str]) -> list[bool]:
        vals = _keys_arr(shas)
        in_cold = self._in_cold(vals)
        hot = self.hot
        return [bool(c) or v in hot for c, v in zip(in_cold, vals.tolist())]

    def preload(self, shas: list[str]) -> int:
        """Warm the shard from a previous run's results (resume path)."""
        fresh_mask = [not f for f in self.contains(shas)]
        fresh = [s for s, m in zip(shas, fresh_mask) if m]
        self.hot.update(_key64(s) for s in fresh)
        self.filter.add_many(fresh)
        if len(self.hot) >= self.COMPACT_AT:
            self._compact()
        return len(self.hot) + len(self.cold)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "keys": len(self.hot) + len(self.cold),
            "cuckoo_load": self.filter.load_factor,
        }

    def snapshot(self, directory: str) -> str:
        """Persist shard state for per-partition checkpoint manifests.

        The compacted uint64 array IS the snapshot (8 bytes/key flat,
        mmap-able on restore) — not a hex dump."""
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, "seen_shard_%04d" % self.shard_id)
        self.filter.save(path)
        self._compact()
        np.save(path + ".keys.npy", self.cold)
        return path

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, "seen_shard_%04d" % self.shard_id)
        if os.path.exists(path + ".keys.npy"):
            self.cold = np.load(path + ".keys.npy").astype(np.uint64, copy=False)
            self.hot = set()
            self.filter = CuckooFilter.load(path)
        elif os.path.exists(path + ".keys"):  # legacy hex snapshot
            with open(path + ".keys") as f:
                keys = [line for line in f.read().splitlines() if line]
            self.cold = np.sort(_keys_arr(keys))
            self.hot = set()
            self.filter = CuckooFilter.load(path)
        return len(self.hot) + len(self.cold)


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
