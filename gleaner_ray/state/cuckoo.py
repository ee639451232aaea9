"""Cuckoo filter — the fast-path membership structure of the URL-seen set.

The reference's crawl-state is "does the SHA-named object exist"
(StatObject per document, /root/reference/internal/summoner/acquire/
jsonutils.go:383-386): one round-trip to the object store per candidate.
The north rule replaces that with a sharded cuckoo-filter seen-set held
in actor state; this module is the per-shard filter.

Standard cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014): 4-slot buckets of 16-bit fingerprints, two
candidate buckets per item (partial-key cuckoo hashing), bounded
eviction chains. Supports delete (Bloom can't), ~3% fp at 95% load with
this geometry. numpy-backed so snapshots are a single array write.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["CuckooFilter"]

_SLOTS = 4
_MAX_KICKS = 500


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _hash64_batch(items: list[str]) -> np.ndarray:
    """Vectorized stable 64-bit hashing for bulk ops (pandas siphash)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(items, dtype=object))


# alt-index mixing table: hash of each possible 16-bit fingerprint,
# precomputed once (partial-key cuckoo hashing needs hash(fp))
_FP_MIX = np.array([_h64(fp.to_bytes(2, "little")) for fp in range(1 << 16)], dtype=np.uint64)


class CuckooFilter:
    def __init__(self, capacity: int = 1_000_000, seed: int = 7):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    # -- hashing -----------------------------------------------------------
    # one hash family for scalar and bulk paths (pandas siphash)
    def _fingerprint_and_index(self, item: str) -> tuple[int, int]:
        h = int(_hash64_batch([item])[0])
        fp = (h & 0xFFFF) or 1  # fingerprint 0 is "empty"
        idx = (h >> 16) & (self.n_buckets - 1)
        return fp, idx

    def _alt_index(self, idx: int, fp: int) -> int:
        # partial-key cuckoo: i2 = i1 xor hash(fp)
        return (idx ^ int(_FP_MIX[fp])) & (self.n_buckets - 1)

    # -- ops ---------------------------------------------------------------
    def contains(self, item: str) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        if fp in self.table[i1]:
            return True
        i2 = self._alt_index(i1, fp)
        return fp in self.table[i2]

    def add(self, item: str) -> bool:
        """Insert; returns False when the filter is over-full (caller should
        grow / rotate the shard)."""
        fp, i1 = self._fingerprint_and_index(item)
        for idx in (i1, self._alt_index(i1, fp)):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        idx = i1 if self._rng.integers(2) else self._alt_index(i1, fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = self._alt_index(idx, fp)
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def delete(self, item: str) -> bool:
        fp, i1 = self._fingerprint_and_index(item)
        for idx in (i1, self._alt_index(i1, fp)):
            row = self.table[idx]
            hits = np.flatnonzero(row == fp)
            if hits.size:
                row[hits[0]] = 0
                self.count -= 1
                return True
        return False

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * _SLOTS)

    # -- bulk ops (vectorized hashing; used by the seen-set shards) ---------
    def _fp_idx_batch(self, items: list[str]):
        h = _hash64_batch(items)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint64)
        fp[fp == 0] = 1
        idx = ((h >> np.uint64(16)) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        alt = (idx.astype(np.uint64) ^ _FP_MIX[fp.astype(np.int64)]) & np.uint64(self.n_buckets - 1)
        return fp.astype(np.uint16), idx, alt.astype(np.int64)

    def contains_many(self, items: list[str]) -> np.ndarray:
        """Vectorized membership: one fancy-indexed comparison pass."""
        if not items:
            return np.zeros(0, dtype=bool)
        fp, idx, alt = self._fp_idx_batch(items)
        hit1 = (self.table[idx] == fp[:, None]).any(axis=1)
        hit2 = (self.table[alt] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def add_many(self, items: list[str], skip_mask=None) -> None:
        """Bulk insert with precomputed hashes; ``skip_mask`` marks items
        already present (no re-insert)."""
        if not items:
            return
        fp, idx, alt = self._fp_idx_batch(items)
        table = self.table
        for k in range(len(items)):
            if skip_mask is not None and skip_mask[k]:
                continue
            self._place(int(fp[k]), int(idx[k]), int(alt[k]))

    def _place(self, fp: int, i1: int, i2: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        idx = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = self._alt_index(idx, fp)
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    # -- persistence (per-partition checkpoint snapshots) -------------------
    def save(self, path: str) -> None:
        np.savez_compressed(path, table=self.table, count=self.count, seed=self.seed)

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        f = cls(capacity=1)
        f.table = data["table"]
        f.n_buckets = f.table.shape[0]
        f.count = int(data["count"])
        f.seed = int(data["seed"])
        f._rng = np.random.default_rng(f.seed)
        return f
