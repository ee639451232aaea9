"""Deduplication family over the ``documents`` table.

Every variant a large-scale training-data pipeline needs, each built on
the same Ray Data shapes the crawl uses (SURVEY §2.5 A2 generalized):

- ``exact_dedup``      — md5(text) hash-partition + per-group first
- ``minhash_lsh``      — shingle -> minhash -> banded LSH buckets ->
                         candidate pairs -> Jaccard verify
- ``simhash_dedup``    — 64-bit simhash, banded hamming buckets
- ``ngram_jaccard_pairs`` — exact Jaccard over LSH candidates
- ``embedding_near_dup``  — cosine near-dup over the embeddings table
                         (random-hyperplane LSH buckets, exact verify)

Scale shape: per-batch sketching is vectorized numpy; the only wide
steps are groupbys on *small* sketch keys (band hash, bucket id), never
on raw text; pair verification touches only candidate groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
]

_MERSENNE = (1 << 61) - 1


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def exact_dedup(ds):
    """Exact content dedup: keep the lowest doc_id per md5(text).

    Matches the DuckDB oracle
    ``SELECT md5(text) h, min(doc_id) keeper, count(*) n GROUP BY 1``.
    """

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["doc_id", "text"]].copy()
        batch["h"] = [_md5(t or "") for t in batch["text"]]
        return batch[["doc_id", "h"]]

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"h": [group["h"].iloc[0]], "keeper": [int(group["doc_id"].min())], "n": [len(group)]}
        )

    return ds.map_batches(add_hash, batch_format="pandas").groupby("h").map_groups(first, batch_format="pandas")


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles (k=5 words, lowercased)."""
    toks = text.lower().split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )
    return out


class _MinHasher:
    """n_perm multiply-shift minhash; coefficient state built once.

    h_i(x) = (a_i * x + b_i) mod 2^64 (odd a_i) — natural uint64
    wraparound, fully vectorized over (n_perm, n_shingles)."""

    def __init__(self, n_perm: int = 128, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, np.iinfo(np.int64).max, size=n_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, np.iinfo(np.int64).max, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * hashes[None, :] + self.b[:, None]
        return vals.min(axis=1)


class MinHashBatch:
    """Actor-pool stage: minhash signature + banded LSH keys per doc."""

    def __init__(self, n_perm: int = 128, bands: int = 32, shingle_k: int = 5, seed: int = 1):
        assert n_perm % bands == 0
        self.hasher = _MinHasher(n_perm, seed)
        self.bands = bands
        self.rows = n_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = self.hasher.signature(_shingle_hashes(text or "", self.shingle_k))
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows].tobytes()
                band_hashes.append(hashlib.blake2b(chunk, digest_size=8).hexdigest())
                band_ids.append(b)
                doc_ids.append(doc_id)
        return pd.DataFrame({"doc_id": doc_ids, "band_id": band_ids, "band_hash": band_hashes})


def minhash_signatures(ds, n_perm: int = 128, bands: int = 32, concurrency: int = 2):
    return ds.map_batches(
        MinHashBatch,
        fn_constructor_kwargs={"n_perm": n_perm, "bands": bands},
        batch_format="pandas",
        concurrency=concurrency,
    )


def _dedupe_pairs(pairs_ds):
    """Unique (a, b) rows. Candidate near-dup pairs are rare by LSH
    construction, so per-batch drop_duplicates + one single-task final
    pass beats a keyed shuffle by an order of magnitude; the bound is
    the candidate-pair count, not the corpus."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    return pairs_ds.map_batches(local, batch_format="pandas").repartition(1).map_batches(
        local, batch_size=None, batch_format="pandas"
    )


def minhash_lsh(ds, n_perm: int = 128, bands: int = 32, concurrency: int = 2):
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    shingle -> minhash -> explode (band_id, band_hash, doc_id) ->
    *self hash-join* on the band bucket -> (a < b) pairs -> dedupe.
    The self-join replaces a map_groups over millions of mostly-singleton
    buckets (measured 13x faster on Ray 2.49: per-group Python overhead
    dominates map_groups; the join's hash shuffle is all C). Returns
    unique (a, b) pairs; exact-Jaccard verification is
    ``ngram_jaccard_pairs``."""
    exploded = minhash_signatures(ds, n_perm, bands, concurrency).materialize()
    joined = exploded.join(
        exploded,
        join_type="inner",
        num_partitions=8,
        on=("band_id", "band_hash"),
        left_suffix="",
        right_suffix="_r",
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["doc_id"] < df["doc_id_r"]]
        return pd.DataFrame(
            {"a": m["doc_id"].astype("int64"), "b": m["doc_id_r"].astype("int64")}
        ).drop_duplicates()

    return _dedupe_pairs(joined.map_batches(mk, batch_format="pandas"))


def ngram_jaccard_pairs(ds, pairs_ds, shingle_k: int = 5, threshold: float = 0.8):
    """Verify candidate pairs with exact shingle-set Jaccard.

    The shingle sets of the (typically tiny) candidate set are broadcast;
    at larger candidate volumes this becomes a 2-pass join on doc_id."""
    import ray

    needed = set()
    pairs = pairs_ds.to_pandas()
    needed.update(pairs["a"].tolist())
    needed.update(pairs["b"].tolist())
    needed_ref = ray.put(needed)

    def collect(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(needed_ref) if not isinstance(needed_ref, set) else needed_ref
        sel = batch[batch["doc_id"].isin(want)]
        return pd.DataFrame(
            {
                "doc_id": sel["doc_id"],
                "shingles": [
                    ",".join(map(str, sorted(_shingle_hashes(t or "", shingle_k)))) for t in sel["text"]
                ],
            }
        )

    sets = {
        int(r["doc_id"]): set(r["shingles"].split(",")) if r["shingles"] else set()
        for r in ds.map_batches(collect, batch_format="pandas").take_all()
    }
    rows = []
    for _, p in pairs.iterrows():
        sa, sb = sets.get(int(p["a"]), set()), sets.get(int(p["b"]), set())
        union = len(sa | sb)
        jac = (len(sa & sb) / union) if union else 0.0
        if jac >= threshold:
            rows.append({"a": int(p["a"]), "b": int(p["b"]), "jaccard": jac})
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


class SimHashBatch:
    """64-bit simhash over token hashes + banded keys for hamming search."""

    def __init__(self, bands: int = 4):
        self.bands = bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, sims, band_ids, band_keys = [], [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = (text or "").lower().split()
            acc = np.zeros(64, dtype=np.int64)
            for t in toks:
                h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
                acc += bits.astype(np.int64) * 2 - 1
            sim = 0
            for bit in np.where(acc > 0)[0]:
                sim |= 1 << int(bit)
            width = 64 // self.bands
            for b in range(self.bands):
                key = (sim >> (b * width)) & ((1 << width) - 1)
                doc_ids.append(doc_id)
                sims.append(np.uint64(sim))
                band_ids.append(b)
                band_keys.append(np.uint64(key))
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "simhash": pd.array(sims, dtype="UInt64"),
                "band_id": band_ids,
                "band_key": pd.array(band_keys, dtype="UInt64"),
            }
        )


def simhash_dedup(ds, bands: int = 4, max_hamming: int = 3, concurrency: int = 2):
    """Near-dup pairs with hamming(simhash) <= max_hamming; candidates
    from shared 16-bit band keys (a pair within hamming 3 of 64 bits
    shares at least one of 4 bands by pigeonhole). Pairing is a self
    hash-join on the band key (same rationale as minhash_lsh)."""
    exploded = ds.map_batches(
        SimHashBatch, fn_constructor_kwargs={"bands": bands}, batch_format="pandas", concurrency=concurrency
    ).materialize()
    joined = exploded.join(
        exploded,
        join_type="inner",
        num_partitions=8,
        on=("band_id", "band_key"),
        left_suffix="",
        right_suffix="_r",
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["doc_id"] < df["doc_id_r"]]
        if m.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"), "hamming": pd.Series([], dtype="int64")}
            )
        x = m["simhash"].to_numpy(dtype=np.uint64) ^ m["simhash_r"].to_numpy(dtype=np.uint64)
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": m["doc_id"].to_numpy()[keep].astype("int64"),
                "b": m["doc_id_r"].to_numpy()[keep].astype("int64"),
                "hamming": ham[keep],
            }
        ).drop_duplicates()

    return _dedupe_pairs(joined.map_batches(mk, batch_format="pandas"))


def embedding_near_dup(ds, threshold: float = 0.95, n_planes: int = 12, seed: int = 3, concurrency: int = 2):
    """Cosine near-dup over an embedding column via random-hyperplane LSH.

    bucket = sign pattern of ``n_planes`` random projections; candidate
    pairs from a self hash-join on the bucket id (same rationale as
    minhash_lsh); exact cosine verify vectorized over the joined pairs.
    Two plane seeds (seed, seed+1) cut the miss rate of borderline
    pairs."""

    def make_bucketer(seed_: int):
        def bucketer(batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy())
            rng = np.random.default_rng(seed_)
            planes = rng.standard_normal((mat.shape[1], n_planes))
            signs = (mat @ planes) > 0
            keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            # plain binary column: Arrow's hash join cannot carry the
            # tensor-extension type as a payload field
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": keys.astype("int64"),
                    "emb": [v.astype(np.float32).tobytes() for v in np.asarray(mat)],
                }
            )

        return bucketer

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["vec_id"] < df["vec_id_r"]]
        if m.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"), "cosine": pd.Series([], dtype="float64")}
            )
        x = np.stack([np.frombuffer(b, dtype=np.float32) for b in m["emb"]]).astype(np.float64)
        y = np.stack([np.frombuffer(b, dtype=np.float32) for b in m["emb_r"]]).astype(np.float64)
        nx = np.linalg.norm(x, axis=1)
        ny = np.linalg.norm(y, axis=1)
        denom = np.where(nx * ny == 0, 1.0, nx * ny)
        cos = (x * y).sum(axis=1) / denom
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a": m["vec_id"].to_numpy()[keep].astype("int64"),
                "b": m["vec_id_r"].to_numpy()[keep].astype("int64"),
                "cosine": cos[keep],
            }
        ).drop_duplicates(subset=["a", "b"])

    out = None
    for s in (seed, seed + 1):
        bucketed = ds.map_batches(make_bucketer(s), batch_format="pandas").materialize()
        joined = bucketed.join(
            bucketed, join_type="inner", num_partitions=8, on=("bucket",), left_suffix="", right_suffix="_r"
        )
        cand = joined.map_batches(verify, batch_format="pandas")
        out = cand if out is None else out.union(cand)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"], ignore_index=True)

    return out.map_batches(local, batch_format="pandas").repartition(1).map_batches(
        local, batch_size=None, batch_format="pandas"
    )
