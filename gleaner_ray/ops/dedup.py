"""Deduplication family over the ``documents`` table.

Every variant a large-scale training-data pipeline needs, each built on
the same Ray Data shapes the crawl uses (SURVEY §2.5 A2 generalized):

- ``exact_dedup``      — md5(text) hash-partition + C-side Min/Count
- ``minhash_lsh``      — shingle -> minhash -> banded LSH buckets ->
                         candidate pairs (self hash-join)
- ``simhash_dedup``    — 64-bit simhash, banded hamming buckets
- ``ngram_jaccard_pairs`` — exact Jaccard verify of candidate pairs
                         (2-pass semi-join, no driver materialization)
- ``ngram_jaccard_dedup`` — exact near-dup pairs via the inverted
                         shingle index (ANSI-SQL-expressible oracle)
- ``embedding_near_dup``  — cosine near-dup over the embeddings table
                         (random-hyperplane LSH buckets, exact verify;
                         ``n_planes=0`` = exact all-pairs mode)
- ``minhash_jaccard_dedup`` / ``simhash_jaccard_dedup`` — the composed
                         production shape: sketch-LSH candidate pairs ->
                         exact shingle-Jaccard verify.  With recall-1
                         sketch parameters the output equals the exact
                         all-pairs answer, so the ANSI-SQL shingle oracle
                         applies to the full sketch->verify path.

Scale shape: per-batch sketching is vectorized numpy; the only wide
steps are hash-joins on *small* sketch keys (band hash, bucket id,
shingle hash), never on raw text; pair verification touches only
candidate groups. Pair-set dedup is keyed (hash-partitioned) above a
size threshold — no single-task tails at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "exact_dedup",
    "substring_dedup",
    "minhash_signatures",
    "minhash_lsh",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_dedup",
    "ngram_containment_dedup",
    "NGRAM_SCALE_MAX_DF",
    "decontaminate",
    "decontaminate_bloom",
    "decontaminate_fuzzy",
    "span_dedup_clean",
    "embedding_near_dup",
    "minhash_jaccard_dedup",
    "simhash_jaccard_dedup",
    "connected_components",
    "fuzzy_dedup_keep",
    "fuzzy_dedup_keep_best",
    "chunk_dedup",
    "dup_count_weights",
]

_MERSENNE = (1 << 61) - 1


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _default_partitions(minimum: int = 8, n_rows: int | None = None) -> int:
    """Scale shuffle width with the cluster instead of a hardcoded 8.

    When the caller knows the row count (e.g. a materialized sketch
    table), the width is also capped by data size — Ray's hash shuffle
    pays a fixed per-partition cost, so 32 partitions on a 16k-row table
    is pure overhead (measured ~2x on the sf0.1 dedup bench)."""
    from gleaner_ray.cluster import cluster_cpus

    cpus = cluster_cpus(minimum)
    width = max(minimum, cpus)
    if n_rows is not None:
        width = min(width, max(2, n_rows // 50_000))
    return width


def exact_dedup(ds):
    """Exact content dedup: keep the lowest doc_id per md5(text).

    Matches the DuckDB oracle
    ``SELECT md5(text) h, min(doc_id) keeper, count(*) n GROUP BY 1``.
    The reduce is ``groupby(h).aggregate(Min, Count)`` — C-side
    combiners, no per-group Python call (on a mostly-unique corpus
    ``map_groups`` costs one Python call per document)."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"], "h": [_md5(t or "") for t in batch["text"]]})

    agg = (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n"))
    )
    return agg


def cross_corpus_dedup(ds, ref_ds, broadcast_cap: int = 5_000_000, num_partitions: int | None = None):
    """Incremental / cross-snapshot exact dedup: flag every corpus
    document whose md5(text) digest already appears in a reference
    corpus (previous crawl snapshot, another source, an already-curated
    training set) — the corpus-granularity analogue of the reference's
    skip-if-object-exists idempotency (StatObject-then-Put,
    internal/summoner/acquire/jsonutils.go:384-388).

    Dual path: the reference side's DISTINCT digest set folds to the
    driver while it stays under ``broadcast_cap`` keys — as RAW 16-byte
    md5 digests in a fixed-width numpy 'S16' array (16 B/key: 80 MB at
    the 5M cap, vs ~640 MB as UCS-4 hex strings; memcmp searchsorted;
    trailing-null stripping cannot alias two equal-length digests) —
    broadcast once via ``ray.put``, each corpus batch probing with one
    vectorized searchsorted (the corpus never shuffles). Beyond the cap
    both sides reduce to digest tables and exchange in ONE
    hash-partitioned left_outer join (bounded by distinct digests plus
    doc ids, never text payloads).

    Returns (doc_id, h, is_new) for every corpus document."""
    import hashlib as _hl

    import ray as _ray
    import ray.data  # noqa: F401

    from gleaner_ray.cluster import cluster_cpus

    def digests(d):
        def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"doc_id": batch["doc_id"], "h": [_md5(t or "") for t in batch["text"]]}
            )

        return d.map_batches(add_hash, batch_format="pandas")

    def ref_distinct_local(batch: pd.DataFrame) -> pd.DataFrame:
        # raw 16-byte digests for the broadcast set (hex only in output)
        raw = [
            _hl.md5((t or "").encode("utf-8")).digest() for t in batch["text"]
        ]
        return pd.DataFrame({"hb": pd.Series(raw, dtype=object).drop_duplicates(ignore_index=True)})

    ref_digests = ref_ds.map_batches(ref_distinct_local, batch_format="pandas")

    # driver fold of the reference digest set under the cap (exact:
    # distinct-set union commutes)
    seen: list = []
    total = 0
    folded: np.ndarray | None = np.zeros(0, dtype="S16")
    for b in ref_digests.iter_batches(batch_format="pandas"):
        if not len(b):
            continue
        seen.append(np.asarray(list(b["hb"]), dtype="S16"))
        total += len(b)
        if total > broadcast_cap:
            u = np.unique(np.concatenate(seen))
            if len(u) > broadcast_cap:
                folded = None  # reference too wide for the driver
                break
            seen, total = [u], len(u)
    if folded is not None and seen:
        folded = np.unique(np.concatenate(seen))

    if folded is not None:
        ref_arr = np.sort(folded)
        ref_ref = _ray.put(ref_arr)

        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            arr = _ray.get(ref_ref)
            raw = [_hl.md5((t or "").encode("utf-8")).digest() for t in batch["text"]]
            h = np.asarray(raw, dtype="S16") if raw else np.zeros(0, dtype="S16")
            if len(arr) and len(h):
                idx = np.searchsorted(arr, h)
                dup = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == h)
            else:
                dup = np.zeros(len(h), dtype=bool)
            return pd.DataFrame(
                {
                    "doc_id": np.asarray(batch["doc_id"], dtype=np.int64),
                    "h": [d.hex() for d in raw],
                    "is_new": ~dup,
                }
            )

        return ds.map_batches(probe, batch_format="pandas")

    # scale fallback: digest-table left_outer join, one exchange bounded
    # by distinct digests (the marker column flags matched rows)
    width = num_partitions or max(8, cluster_cpus(8))

    def ref_hex_local(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": batch["hb"].map(bytes.hex).drop_duplicates(ignore_index=True)})

    ref_marked = (
        ref_digests.map_batches(ref_hex_local, batch_format="pandas")
        .groupby("h")
        .count()
        .map_batches(
            lambda df: pd.DataFrame({"ref_h": df["h"], "seen": np.ones(len(df), dtype=np.int8)}),
            batch_format="pandas",
        )
    )
    joined = digests(ds).join(
        ref_marked, join_type="left_outer", num_partitions=width, on=("h",), right_on=("ref_h",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "h": df["h"],
                "is_new": df["seen"].isna(),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


# odd multiplier for the positional-polynomial shingle combine and a
# splitmix64 finalizer for key mixing — both pure uint64 array math
_SHINGLE_P = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — decorrelates polynomial sums
    before they become join keys."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _shingle_hashes_batch(texts, k: int = 5) -> list[np.ndarray]:
    """Word-k-shingle hashes for EVERY document of a batch in one pass.

    All tokens of the batch are hashed with a single ``pd.util.
    hash_array`` call (siphash, C speed); each document's shingle
    hashes are then positional polynomials over its token-hash sliding
    windows — pure numpy, no per-shingle Python, no shingle-string
    construction. Identity contract (all that the Jaccard math needs):
    equal word sequences hash equal, distinct ones collide w.p. ~2^-64.
    Matches the old per-shingle semantics: no tokens -> empty; fewer
    than k tokens -> ONE shingle of the whole token list."""
    from itertools import chain

    token_lists = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    total = int(lens.sum())
    if total == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in token_lists]
    flat = np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
    th = pd.util.hash_array(flat, hash_key="gleaner_shingle!").astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_P ** np.arange(k, dtype=np.uint64)
    out: list[np.ndarray] = []
    pos = 0
    for n in lens:
        h = th[pos : pos + int(n)]
        pos += int(n)
        if n == 0:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        with np.errstate(over="ignore"):
            if n < k:
                vals = np.asarray([(h * powers[:n]).sum()], dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, k)
                vals = (win * powers).sum(axis=1, dtype=np.uint64)
        out.append(_mix64(vals))
    return out


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Single-document convenience wrapper over the batch kernel."""
    return _shingle_hashes_batch([text], k)[0]


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


def _band_keys(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, n_perm) signatures -> (n_docs, bands) banded LSH keys.

    Band key = mixed positional polynomial over the band's rows — equal
    chunks always collide; distinct ones w.p. ~2^-64 (false candidates
    are removed by the exact verify stage)."""
    n_docs = len(sigs)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_P ** np.arange(rows, dtype=np.uint64)
        return _mix64(
            (sigs.reshape(n_docs, bands, rows) * powers).sum(axis=2, dtype=np.uint64)
        )


class MinHashBatch:
    """Actor-pool stage: minhash signature + banded LSH keys per doc."""

    def __init__(self, n_perm: int = 128, bands: int = 32, shingle_k: int = 5, seed: int = 1):
        assert n_perm % bands == 0
        self.hasher = _MinHasher(n_perm, seed)
        self.bands = bands
        self.rows = n_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh_list = _shingle_hashes_batch(list(batch["text"]), self.shingle_k)
        n_docs = len(sh_list)
        sigs = np.empty((n_docs, self.hasher.n_perm), dtype=np.uint64)
        for i, sh in enumerate(sh_list):
            sigs[i] = self.hasher.signature(sh)
        keys = _band_keys(sigs, self.bands, self.rows)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(np.asarray(batch["doc_id"], dtype=np.int64), self.bands),
                "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n_docs),
                "band_hash": pd.array(keys.ravel(), dtype="UInt64"),
            }
        )


def minhash_signatures(ds, n_perm: int = 128, bands: int = 32, concurrency: int = 2):
    return ds.map_batches(
        MinHashBatch,
        fn_constructor_kwargs={"n_perm": n_perm, "bands": bands},
        batch_format="pandas",
        concurrency=concurrency,
    )


# below this many candidate pairs a single-task pandas dedupe beats a
# keyed shuffle (the common case: LSH candidates are rare by design)
_SMALL_PAIRSET = 250_000

# candidate-vector matrices up to this many bytes broadcast through
# plasma for join-free verification (zero-copy read per task); larger
# sets fall back to the hash-join attach path
_BROADCAST_VERIFY_BYTES = 256 << 20


def _dedupe_pairs(pairs_ds, subset=("a", "b")):
    """Unique pair rows, first occurrence kept.

    Local per-batch drop_duplicates first (cheap, shrinks the exchange),
    then: small pair sets collapse in one bounded task; large ones go
    through a hash-partitioned repartition keyed on the pair columns so
    every duplicate lands in the same block — no single-task tail when
    near-dup pairs number in the billions."""
    subset = list(subset)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=subset, ignore_index=True)

    pairs_ds = pairs_ds.map_batches(local, batch_format="pandas").materialize()
    n = pairs_ds.count()
    if n == 0:
        # Anchor the schema: a repartition+map over zero-row blocks would
        # emit a zero-field block that breaks downstream hash joins.
        import ray.data as _rd

        return _rd.from_pandas(pd.DataFrame({c: pd.Series(dtype="int64") for c in subset}))
    if n <= _SMALL_PAIRSET:
        return pairs_ds.repartition(1).map_batches(local, batch_size=None, batch_format="pandas")
    # large pair sets: co-locate duplicates by a bounded hash partition id
    # (every duplicate of a pair lands in one group; group count is the
    # partition count, so the per-group Python call is amortized)
    nparts = _default_partitions(n_rows=pairs_ds.count())

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df[subset].astype("int64"), index=False)
        df["_pid"] = (h % np.uint64(nparts)).astype("int64")
        return df

    def local_drop_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=subset, ignore_index=True).drop(columns=["_pid"])

    return (
        pairs_ds.map_batches(add_pid, batch_format="pandas")
        .groupby("_pid")
        .map_groups(local_drop_pid, batch_format="pandas")
    )


def minhash_lsh(ds, n_perm: int = 128, bands: int = 32, concurrency: int = 2, num_partitions: int | None = None):
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
        num_partitions=num_partitions or _default_partitions(n_rows=exploded.count()),
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


class _ShingleSets:
    """Per-doc sorted distinct shingle-hash array (actor-pool stage)."""

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh_list = _shingle_hashes_batch(list(batch["text"]), self.k)
        ids, sets_, sizes = [], [], []
        for doc_id, sh_raw in zip(batch["doc_id"], sh_list):
            sh = np.unique(sh_raw)
            ids.append(doc_id)
            sets_.append(sh.tobytes())
            sizes.append(len(sh))
        return pd.DataFrame({"doc_id": ids, "shingles": sets_, "n_shingles": sizes})


def ngram_jaccard_pairs(ds, pairs_ds, shingle_k: int = 5, threshold: float = 0.8):
    """Verify candidate pairs with exact shingle-set Jaccard.

    2-pass join — nothing materializes on the driver:
    pass 1: semi-join documents against candidate doc_ids (hash join on
    doc_id) to compute each candidate's shingle set once;
    pass 2: join the shingle sets onto the pair rows (once per side) and
    verify vectorized per batch. The exchanged payload is candidate
    shingle sets only — bounded by the candidate count, not the corpus.
    Join widths scale with the candidate count (not a fixed cluster
    width): each hash-shuffle partition costs a fixed aggregator spin-up,
    pure overhead when candidates are rare — the common case."""
    # candidate ids (either side), deduped — tiny relative to the corpus
    ids_a = pairs_ds.map_batches(lambda df: pd.DataFrame({"doc_id": df["a"]}), batch_format="pandas")
    ids_b = pairs_ds.map_batches(lambda df: pd.DataFrame({"doc_id": df["b"]}), batch_format="pandas")
    cand_ids = _dedupe_pairs(ids_a.union(ids_b), subset=("doc_id",)).materialize()
    nparts = _default_partitions(minimum=2, n_rows=cand_ids.count())
    if cand_ids.count() == 0:
        # No candidates: return a typed empty result instead of running
        # joins whose inputs would be all zero-field blocks.
        import ray.data as _rd

        return _rd.from_pandas(
            pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "jaccard": pd.Series(dtype="float64"),
                }
            )
        )

    # pass 1: shingle sets for candidates only. The candidate id set is
    # bounded and already counted: when it fits a broadcast (<= ~5M ids,
    # 40 MB), semi-join as a map_batches membership filter — the corpus
    # is never shuffled at all. Only beyond that fall back to a hash
    # join at CLUSTER width (the corpus side dictates the width there,
    # not the candidate count).
    docs = ds.map_batches(lambda df: df[["doc_id", "text"]], batch_format="pandas")
    if cand_ids.count() <= 5_000_000:
        import ray as _ray

        ids_ref = _ray.put(np.sort(cand_ids.to_pandas()["doc_id"].to_numpy(dtype=np.int64)))

        def member(df: pd.DataFrame) -> pd.DataFrame:
            arr = _ray.get(ids_ref)
            v = df["doc_id"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(arr, v)
            ok = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == v)
            return df[ok]

        cand_docs = docs.map_batches(member, batch_format="pandas")
    else:
        cand_docs = docs.join(
            cand_ids, join_type="inner", num_partitions=_default_partitions(), on=("doc_id",)
        )
    sets_ds = cand_docs.map_batches(
        _ShingleSets, fn_constructor_kwargs={"shingle_k": shingle_k}, batch_format="pandas", concurrency=2
    ).materialize()

    def _jaccard_rows(a_ids, b_ids, blobs_a, blobs_b) -> pd.DataFrame:
        rows_a, rows_b, jac = [], [], []
        for a, b, ba, bb in zip(a_ids, b_ids, blobs_a, blobs_b):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = (inter / union) if union else 0.0
            if j >= threshold:
                rows_a.append(int(a))
                rows_b.append(int(b))
                jac.append(j)
        return pd.DataFrame(
            {
                "a": pd.Series(rows_a, dtype="int64"),
                "b": pd.Series(rows_b, dtype="int64"),
                "jaccard": pd.Series(jac, dtype="float64"),
            }
        )

    # pass 2a: bounded set tables skip the attach joins — each hash
    # join pays a fixed multi-second shuffle spin-up, pure overhead when
    # candidates are rare (the LSH regime). The sorted (ids, blobs)
    # tuple broadcasts once through plasma; each pairs batch looks its
    # sides up by searchsorted.
    if cand_ids.count() <= _SMALL_PAIRSET:
        sets_pdf = sets_ds.to_pandas()  # bounded: candidate sets only
        if int(sets_pdf["n_shingles"].sum()) * 8 <= _BROADCAST_VERIFY_BYTES:
            import ray as _ray

            order = np.argsort(sets_pdf["doc_id"].to_numpy(), kind="stable")
            ids_sorted = sets_pdf["doc_id"].to_numpy()[order].astype(np.int64)
            blobs = list(sets_pdf["shingles"].iloc[order])
            sets_ref = _ray.put((ids_sorted, blobs))

            def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty:
                    return _jaccard_rows((), (), (), ())
                ids_s, bl = _ray.get(sets_ref)
                ia = np.searchsorted(ids_s, df["a"].to_numpy(dtype=np.int64))
                ib = np.searchsorted(ids_s, df["b"].to_numpy(dtype=np.int64))
                return _jaccard_rows(
                    df["a"], df["b"], (bl[i] for i in ia), (bl[j] for j in ib)
                )

            return pairs_ds.map_batches(verify_broadcast, batch_format="pandas")

    # pass 2b: attach each side's set to the pair rows (large sets)
    def _as(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(
                columns={"doc_id": side, "shingles": "sh_%s" % side, "n_shingles": "n_%s" % side}
            )

        return fn

    left = sets_ds.map_batches(_as("a"), batch_format="pandas")
    right = sets_ds.map_batches(_as("b"), batch_format="pandas")
    paired = pairs_ds.join(left, join_type="inner", num_partitions=nparts, on=("a",)).join(
        right, join_type="inner", num_partitions=nparts, on=("b",)
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        return _jaccard_rows(df["a"], df["b"], df["sh_a"], df["sh_b"])

    return paired.map_batches(verify, batch_format="pandas")


# Scale preset for ``ngram_jaccard_dedup(max_df="auto")``: a shingle
# kept by the prefix filter emits at most max_df^2 ≈ 262k self-join
# rows, so the join size is bounded by (distinct shingles) x 262k
# regardless of how Zipfian the corpus is; a stopword 5-gram with
# df=10^7 would otherwise emit 10^14 rows on its own.
NGRAM_SCALE_MAX_DF = 512


def ngram_jaccard_dedup(
    ds,
    shingle_k: int = 5,
    threshold: float = 0.8,
    concurrency: int = 2,
    num_partitions: int | None = None,
    max_df: int | str | None = None,
):
    """EXACT near-dup pairs by shingle Jaccard via the inverted index.

    explode distinct (shingle_hash, doc_id, set_size) -> self hash-join
    on the shingle -> per-batch partial pair counts -> small groupby of
    partials -> jaccard = i / (n_a + n_b - i) >= threshold. Exact (no
    sketching), so the DuckDB shingle-set oracle reproduces it
    value-for-value.

    ``max_df`` is the web-scale prefix filter: shingles appearing in
    more than ``max_df`` documents are dropped from the inverted index
    BEFORE the self-join (standard prefix-filter practice — a stopword
    shingle emits df^2 join rows, so one df=10^7 shingle alone would
    dwarf the rest of the exchange). ``"auto"`` selects the documented
    scale preset ``NGRAM_SCALE_MAX_DF``; ``None`` keeps every shingle
    (oracle-parity mode — the default so the DuckDB all-pairs oracle
    matches value-for-value). NB the filter only removes candidate
    evidence: set sizes n_a/n_b are computed before it, so filtered
    Jaccard is a lower bound and near-dup pairs sharing only stopword
    shingles are (intentionally) not reported."""
    totals = _ngram_pair_totals(ds, shingle_k, concurrency, num_partitions, max_df)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        jac = df["i"] / (df["n_a"] + df["n_b"] - df["i"])
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "a": df["a"][keep].astype("int64"),
                "b": df["b"][keep].astype("int64"),
                "jaccard": jac[keep].astype("float64"),
            }
        )

    return totals.map_batches(finish, batch_format="pandas")


def ngram_containment_dedup(
    ds,
    shingle_k: int = 5,
    threshold: float = 0.8,
    concurrency: int = 2,
    num_partitions: int | None = None,
    max_df: int | str | None = None,
):
    """EXACT asymmetric near-dup pairs by shingle CONTAINMENT (Broder
    1997's companion metric): C(A,B) = |S(A)∩S(B)| / |S(A)| — the
    fraction of the SMALLER document reproduced inside the larger one.
    Jaccard misses quote-inclusion (a doc fully embedded in a 10x
    larger page scores i/(n_a+n_b-i) ≈ 0.1); containment catches it
    (C = 1.0). The pair is kept when either direction clears
    ``threshold``; ``containment`` reports the max of the two, each a
    single double division in a fixed operand order.

    Same inverted-index plan (and the same ``max_df`` prefix-filter
    scale preset) as :func:`ngram_jaccard_dedup` — only the finish
    arithmetic differs."""
    totals = _ngram_pair_totals(ds, shingle_k, concurrency, num_partitions, max_df)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "containment": pd.Series([], dtype="float64"),
                }
            )
        c = np.maximum(df["i"] / df["n_a"], df["i"] / df["n_b"])
        keep = c >= threshold
        return pd.DataFrame(
            {
                "a": df["a"][keep].astype("int64"),
                "b": df["b"][keep].astype("int64"),
                "containment": c[keep].astype("float64"),
            }
        )

    return totals.map_batches(finish, batch_format="pandas")


def _ngram_pair_totals(
    ds,
    shingle_k: int,
    concurrency: int,
    num_partitions: int | None,
    max_df: int | str | None,
):
    """Shared inverted-index pair-count plan: (a, b, n_a, n_b, i)."""
    if max_df == "auto":
        max_df = NGRAM_SCALE_MAX_DF
    exploded = ds.map_batches(
        _ExplodeShingles,
        fn_constructor_kwargs={"shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=concurrency,
    ).materialize()
    nparts = num_partitions or _default_partitions(n_rows=exploded.count())
    if max_df is not None:
        from ray.data.aggregate import Count

        df_counts = exploded.groupby("sh").aggregate(Count(alias_name="df"))
        hot = df_counts.map_batches(
            lambda d: d[d["df"] > max_df][["sh"]], batch_format="pandas"
        ).materialize()
        n_hot = hot.count()
        if n_hot == 0:
            pass  # no stopword shingles — index unchanged
        elif n_hot <= 5_000_000:
            # the hot set is tiny by construction (each member has >max_df
            # index rows): broadcast it and drop members in map_batches —
            # the inverted index itself is never re-shuffled for the filter.
            # Gather via Arrow refs: Dataset.to_pandas pads empty blocks
            # into the concat, promoting int64 keys to float64 (exactness
            # loss on 64-bit hashes).
            import ray as _ray

            parts = [
                t.column("sh").to_numpy(zero_copy_only=False)
                for t in _ray.get(hot.to_arrow_refs())
                if t.num_rows and "sh" in t.column_names
            ]
            hot_arr = (
                np.sort(np.concatenate(parts).astype(np.int64))
                if parts
                else np.zeros(0, np.int64)
            )
            hot_ref = _ray.put(hot_arr)

            def drop_hot(df: pd.DataFrame) -> pd.DataFrame:
                arr = _ray.get(hot_ref)
                v = df["sh"].to_numpy(dtype=np.int64)
                idx = np.searchsorted(arr, v)
                is_hot = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == v)
                return df[~is_hot]

            exploded = exploded.map_batches(drop_hot, batch_format="pandas")
        else:
            # degenerate corpus (millions of distinct stopword shingles):
            # fall back to a keyed semi-join at cluster width
            keep = df_counts.map_batches(
                lambda d: d[d["df"] <= max_df][["sh"]], batch_format="pandas"
            )
            exploded = exploded.join(keep, join_type="inner", num_partitions=nparts, on=("sh",))
    joined = exploded.join(
        exploded, join_type="inner", num_partitions=nparts, on=("sh",), left_suffix="", right_suffix="_r"
    )

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["doc_id"] < df["doc_id_r"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                    "i": pd.Series([], dtype="int64"),
                }
            )
        g = (
            m.groupby(["doc_id", "doc_id_r", "n", "n_r"], as_index=False)
            .size()
            .rename(columns={"doc_id": "a", "doc_id_r": "b", "n": "n_a", "n_r": "n_b", "size": "i"})
        )
        return g.astype({"a": "int64", "b": "int64", "n_a": "int64", "n_b": "int64", "i": "int64"})

    from ray.data.aggregate import Sum

    partials = joined.map_batches(partial_counts, batch_format="pandas")
    return partials.groupby(["a", "b", "n_a", "n_b"]).aggregate(Sum("i", alias_name="i"))


class _ExplodeShingles:
    """(doc_id, distinct shingle hash, set size) rows — the inverted index."""

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh_list = [np.unique(sh) for sh in _shingle_hashes_batch(list(batch["text"]), self.k)]
        sizes = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=len(sh_list))
        flat = np.concatenate(sh_list) if sh_list else np.zeros(0, np.uint64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(np.asarray(batch["doc_id"], dtype=np.int64), sizes),
                # bit-cast uint64 -> int64: equality-preserving, and the
                # plain numpy dtype survives groupby/join block round
                # trips exactly (the nullable UInt64 extension can get
                # promoted to float64 when empty blocks concat, which
                # silently corrupts 64-bit keys)
                "sh": flat.view(np.int64),
                "n": np.repeat(sizes, sizes),
            }
        )


# 8-bit popcount lookup table: hamming distance of a uint64 array is
# table[bytes].sum(axis=1) — no per-row Python bin() calls
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Stable uint64 hash of a flat object array of token strings —
    one vectorized siphash pass (pandas' C kernel) over the whole batch
    instead of a per-token Python blake2b call."""
    return pd.util.hash_array(tokens, hash_key="gleaner_simhash!")


class SimHashBatch:
    """64-bit simhash over token hashes + banded keys for hamming search.

    Fully vectorized per batch: every token of every document is hashed
    in ONE ``pd.util.hash_array`` call, the sign accumulation is a
    cumulative-sum difference over document boundaries (handles empty
    documents exactly like the per-row version: no tokens -> simhash 0),
    and band keys are shift/mask array ops."""

    def __init__(self, bands: int = 4):
        self.bands = bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        token_lists = [(t or "").lower().split() for t in batch["text"]]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
        total = int(lens.sum())
        n_docs = len(token_lists)
        if total:
            flat = np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
            h = _hash_tokens(flat)
            # (total, 64) bit matrix, bit i of the hash at column i
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            ends = np.cumsum(lens)
            starts = ends - lens
            # per-doc segment sums: one contiguous C-sum per document
            # (sign sum = 2*ones - n). Axis-0 cumsum/reduceat over the
            # whole (total, 64) matrix is ~20x slower in this numpy
            # build than these row-major partial sums.
            acc = np.zeros((n_docs, 64), dtype=np.int64)
            for j in range(n_docs):
                if lens[j]:
                    ones = bits[starts[j] : ends[j]].sum(axis=0, dtype=np.int64)
                    acc[j] = 2 * ones - lens[j]
        else:
            acc = np.zeros((n_docs, 64), dtype=np.int64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sims = ((acc > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        width = 64 // self.bands
        mask = np.uint64((1 << width) - 1)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int64), n_docs)
        doc_rep = np.repeat(np.asarray(batch["doc_id"], dtype=np.int64), self.bands)
        sims_rep = np.repeat(sims, self.bands)
        keys = (sims_rep >> (band_ids.astype(np.uint64) * np.uint64(width))) & mask
        return pd.DataFrame(
            {
                "doc_id": doc_rep,
                "simhash": pd.array(sims_rep, dtype="UInt64"),
                "band_id": band_ids,
                "band_key": pd.array(keys, dtype="UInt64"),
            }
        )


def simhash_dedup(ds, bands: int = 4, max_hamming: int = 3, concurrency: int = 2, num_partitions: int | None = None):
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
        num_partitions=num_partitions or _default_partitions(n_rows=exploded.count()),
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
        ham = _popcount64(x)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": m["doc_id"].to_numpy()[keep].astype("int64"),
                "b": m["doc_id_r"].to_numpy()[keep].astype("int64"),
                "hamming": ham[keep],
            }
        ).drop_duplicates()

    return _dedupe_pairs(joined.map_batches(mk, batch_format="pandas"))


class _PlaneBucketer:
    """Actor-pool stage: random-hyperplane LSH bucket keys per vector.

    The ``{seed: planes}`` matrices are state — built ONCE per actor on
    the first non-empty batch (the embedding dim is read from the data),
    never regenerated per batch. Deterministic across actors: the planes
    depend only on (seed, dim, n_planes)."""

    _EMPTY = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype="int64"),
            "seed": pd.Series(dtype="int64"),
            "bucket": pd.Series(dtype="int64"),
        }
    )

    def __init__(self, n_planes: int, seed_list: list):
        self.n_planes = n_planes
        self.seed_list = seed_list
        self.planes: dict | None = None  # dim known from the first batch

    def __call__(self, batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        if batch.num_rows == 0:
            return self._EMPTY
        mat = embedding_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype("int64")
        if self.n_planes > 0 and self.planes is None:
            self.planes = {
                s: np.random.default_rng(s).standard_normal((mat.shape[1], self.n_planes))
                for s in self.seed_list
            }
        frames = []
        for s in self.seed_list:
            if self.n_planes > 0:
                signs = (mat @ self.planes[s]) > 0
                keys = (signs * (1 << np.arange(self.n_planes))).sum(axis=1).astype("int64")
            else:
                keys = np.zeros(len(mat), dtype="int64")
            frames.append(
                pd.DataFrame({"vec_id": vec_ids, "seed": np.int64(s), "bucket": keys})
            )
        return pd.concat(frames, ignore_index=True)


def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seeds: tuple = (3, 4),
    concurrency: int = 2,
    num_partitions: int | None = None,
):
    """Cosine near-dup over an embedding column via random-hyperplane LSH.

    2-pass shape (same rationale as ``ngram_jaccard_pairs``): the wide
    self hash-join exchanges only (vec_id, seed, bucket) int64 rows —
    never the vector payload — and the same pair colliding under many
    seeds is deduped BEFORE any payload moves.  Embedding payloads are
    then attached to the deduped candidate pairs only (two hash joins on
    the small candidate set) and the exact cosine verify runs vectorized
    in float64, bit-identical to a float64 all-pairs oracle.  Multiple
    seeds cut the miss rate of borderline pairs at the cost of candidate
    generation only, not payload traffic.

    ``n_planes=0`` is EXACT mode: every vector lands in one bucket, so
    the join produces all pairs — quadratic, for oracle checks and
    corpora <= ~1e5 vectors only; the LSH mode is the scale path."""
    seed_list = list(seeds) if n_planes > 0 else [0]

    bucketed = ds.map_batches(
        _PlaneBucketer,
        fn_constructor_kwargs={"n_planes": n_planes, "seed_list": seed_list},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()
    joined = bucketed.join(
        bucketed,
        join_type="inner",
        num_partitions=num_partitions or _default_partitions(minimum=2, n_rows=bucketed.count()),
        on=("seed", "bucket"),
        left_suffix="",
        right_suffix="_r",
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["vec_id"] < df["vec_id_r"]]
        return pd.DataFrame(
            {"a": m["vec_id"].astype("int64"), "b": m["vec_id_r"].astype("int64")}
        ).drop_duplicates()

    pairs = _dedupe_pairs(joined.map_batches(mk, batch_format="pandas")).materialize()
    if pairs.count() == 0:
        # no candidates: typed empty result instead of joining all
        # zero-field blocks
        import ray.data as _rd

        return _rd.from_pandas(
            pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        )

    # Restrict payloads to candidate vectors BEFORE the attach joins.
    # Small pair sets (the LSH regime): broadcast the sorted candidate
    # id array and filter inside the payload stage — the embedding
    # corpus is never hash-shuffled, and the joins below move candidate
    # payloads only, at candidate-scaled width. Huge pair sets (exact
    # mode on a big corpus): no filter; the attach joins shuffle at
    # cluster width. Arrow batch format with an explicit schema so
    # filtered-to-empty blocks keep the binary payload type.
    import pyarrow as _pa
    import ray as _ray

    payload_schema = _pa.schema([("vec_id", _pa.int64()), ("emb", _pa.binary())])
    if pairs.count() <= _SMALL_PAIRSET:
        pairs_df = pairs.to_pandas()
        cand_vec_ids = np.sort(pd.concat([pairs_df["a"], pairs_df["b"]]).unique().astype(np.int64))
        ids_ref = _ray.put(cand_vec_ids)
        nparts = num_partitions or _default_partitions(minimum=2, n_rows=len(pairs_df))
    else:
        ids_ref = None
        nparts = num_partitions or _default_partitions()

    def payload(t: "_pa.Table") -> "_pa.Table":
        if t.num_rows == 0:
            return payload_schema.empty_table()
        v = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if ids_ref is not None:
            arr = _ray.get(ids_ref)
            idx = np.searchsorted(arr, v)
            ok = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == v)
            if not ok.any():
                return payload_schema.empty_table()
            t = t.filter(_pa.array(ok))
            v = v[ok]
        # plain binary column: Arrow's hash join cannot carry the
        # tensor-extension type as a payload
        from .embutil import embedding_matrix

        mat = np.ascontiguousarray(embedding_matrix(t.column("embedding")))
        row_bytes = mat.shape[1] * 8
        flat = mat.tobytes()  # one buffer; rows sliced as fixed strides
        return _pa.Table.from_arrays(
            [
                _pa.array(v, _pa.int64()),
                _pa.array(
                    [flat[i * row_bytes : (i + 1) * row_bytes] for i in range(len(mat))],
                    _pa.binary(),
                ),
            ],
            schema=payload_schema,
        )

    emb_ds = ds.map_batches(payload, batch_format="pyarrow").materialize()

    def _cosine_keep(df: pd.DataFrame, x: np.ndarray, y: np.ndarray) -> pd.DataFrame:
        nx = np.linalg.norm(x, axis=1)
        ny = np.linalg.norm(y, axis=1)
        denom = np.where(nx * ny == 0, 1.0, nx * ny)
        cos = (x * y).sum(axis=1) / denom
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a": df["a"].to_numpy()[keep].astype("int64"),
                "b": df["b"].to_numpy()[keep].astype("int64"),
                "cosine": cos[keep],
            }
        )

    _EMPTY_VERIFY = pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")}
    )

    # Bounded candidate sets: skip the attach joins entirely. Ray's
    # hash-shuffle join pays ~10s fixed cost per join even at sf0.01
    # (measured: the two attach joins dominated the exact-mode query);
    # instead the candidate matrix broadcasts ONCE through plasma
    # ((ids, float64 matrix) tuple, zero-copy on read) and each pairs
    # batch gathers its rows by searchsorted. Cap: candidate-vector
    # bytes <= _BROADCAST_VERIFY_BYTES; beyond that, the join path.
    if ids_ref is not None:
        emb_pdf = emb_ds.to_pandas()  # bounded: candidate vectors only
        dim = len(emb_pdf["emb"].iloc[0]) // 8 if len(emb_pdf) else 0
        if len(emb_pdf) * dim * 8 <= _BROADCAST_VERIFY_BYTES:
            order = np.argsort(emb_pdf["vec_id"].to_numpy(), kind="stable")
            ids_sorted = emb_pdf["vec_id"].to_numpy()[order].astype(np.int64)
            mat = (
                np.frombuffer(b"".join(emb_pdf["emb"].iloc[order]), dtype=np.float64)
                .reshape(len(emb_pdf), -1)
                if len(emb_pdf)
                else np.zeros((0, 0))
            )
            mat_ref = _ray.put((ids_sorted, mat))

            def verify_broadcast(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty:
                    return _EMPTY_VERIFY.copy()
                ids_s, m = _ray.get(mat_ref)
                ia = np.searchsorted(ids_s, df["a"].to_numpy(dtype=np.int64))
                ib = np.searchsorted(ids_s, df["b"].to_numpy(dtype=np.int64))
                return _cosine_keep(df, m[ia], m[ib])

            return pairs.map_batches(verify_broadcast, batch_format="pandas")

    def _as(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"vec_id": side, "emb": "emb_%s" % side})

        return fn

    left = emb_ds.map_batches(_as("a"), batch_format="pandas")
    right = emb_ds.map_batches(_as("b"), batch_format="pandas")
    paired = pairs.join(left, join_type="inner", num_partitions=nparts, on=("a",)).join(
        right, join_type="inner", num_partitions=nparts, on=("b",)
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_VERIFY.copy()
        # ONE C-level concat + reshape per side: np.stack over per-row
        # frombuffer views costs ~60x more at 100k+ pairs (measured
        # 11.8s -> 0.19s on 124,750 sf0.01 exact-mode pairs), and the
        # doubles are bit-identical
        x = np.frombuffer(b"".join(df["emb_a"]), dtype=np.float64).reshape(len(df), -1)
        y = np.frombuffer(b"".join(df["emb_b"]), dtype=np.float64).reshape(len(df), -1)
        return _cosine_keep(df, x, y)

    return paired.map_batches(verify, batch_format="pandas")


def _bench_shingle_ref(bench_ds, shingle_k: int):
    """Collect the benchmark corpus's distinct shingle-hash set (sorted
    int64, bounded by the benchmark size — never the corpus) and
    broadcast it once via ``ray.put``. Shared by ``decontaminate`` and
    ``novelty_scores``."""
    import ray as _ray

    def bench_shingles(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"sh": pd.Series(dtype="int64")})
        flat = np.concatenate(_shingle_hashes_batch(list(df["text"]), shingle_k))
        return pd.DataFrame({"sh": np.unique(flat).view(np.int64)})

    parts = [
        t.column("sh").to_numpy(zero_copy_only=False)
        for t in _ray.get(
            bench_ds.map_batches(bench_shingles, batch_format="pandas").to_arrow_refs()
        )
        if t.num_rows and "sh" in t.column_names
    ]
    bench_arr = (
        np.unique(np.concatenate(parts).astype(np.int64)) if parts else np.zeros(0, np.int64)
    )
    return _ray.put(bench_arr)


def decontaminate(ds, bench_ds, shingle_k: int = 5):
    """Benchmark decontamination: flag documents sharing ANY word
    k-shingle with a benchmark corpus (the standard training-data
    hygiene step — GPT-3 Appendix C / Gopher A.2 style n-gram overlap).

    Scale shape: benchmark corpora are small by definition, so the
    benchmark's distinct shingle-hash set is collected once (bounded by
    the benchmark size, never the corpus), broadcast via ``ray.put``,
    and every corpus batch probes it with a vectorized searchsorted —
    the corpus is never shuffled and nothing corpus-sized reaches the
    driver. Returns (doc_id, contaminated) for every document."""
    import ray as _ray

    bench_ref = _bench_shingle_ref(bench_ds, shingle_k)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        arr = _ray.get(bench_ref)
        sh_list = _shingle_hashes_batch(list(df["text"]), shingle_k)
        sizes = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=len(sh_list))
        total = int(sizes.sum())
        if total == 0 or len(arr) == 0:
            hit_any = np.zeros(len(sh_list), dtype=bool)
        else:
            flat = np.concatenate(sh_list).view(np.int64)
            idx = np.searchsorted(arr, flat)
            hits = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == flat)
            # per-doc "any" via cumsum difference (empty docs -> False)
            c = np.concatenate([[0], np.cumsum(hits)])
            ends = np.cumsum(sizes)
            hit_any = (c[ends] - c[ends - sizes]) > 0
        return pd.DataFrame(
            {
                "doc_id": np.asarray(df["doc_id"], dtype=np.int64),
                "contaminated": hit_any,
            }
        )

    return ds.map_batches(probe, batch_format="pandas")


def novelty_scores(ds, bench_ds, shingle_k: int = 5):
    """Continuous novelty scoring against a benchmark/reference corpus:
    for every document, the fraction of its DISTINCT word k-shingles
    NOT present in the benchmark's shingle set — the graded companion
    to ``decontaminate``'s boolean flag (rank documents by how much new
    content they add vs a held-out set / previous snapshot, the
    "novelty" selection signal of data-curation pipelines; cf. GPT-3
    Appendix C overlap *fractions*). A document with no shingles scores
    novelty 1.0.

    Scale shape: identical to ``decontaminate`` — the benchmark shingle
    set broadcasts once via ``ray.put``, every corpus batch probes it
    with one vectorized searchsorted; per-document DISTINCT shingle
    counts come from one lexsort over the batch's (row, hash) pairs +
    bincount segment sums (no per-document Python loop, no shuffle,
    nothing corpus-sized on the driver). Returns
    (doc_id, n_shingles, n_hit, novelty)."""
    import ray as _ray

    bench_ref = _bench_shingle_ref(bench_ds, shingle_k)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        arr = _ray.get(bench_ref)
        sh_list = _shingle_hashes_batch(list(df["text"]), shingle_k)
        nrows = len(sh_list)
        sizes = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=nrows)
        total = int(sizes.sum())
        ns = np.zeros(nrows, dtype=np.int64)
        nh = np.zeros(nrows, dtype=np.int64)
        if total:
            flat = np.concatenate(sh_list).view(np.int64)
            row = np.repeat(np.arange(nrows), sizes)
            o = np.lexsort((flat, row))
            fr, fh = row[o], flat[o]
            first = np.ones(total, dtype=bool)
            first[1:] = (fr[1:] != fr[:-1]) | (fh[1:] != fh[:-1])
            ur, uh = fr[first], fh[first]
            ns = np.bincount(ur, minlength=nrows).astype(np.int64)
            if len(arr):
                idx = np.searchsorted(arr, uh)
                hits = (idx < len(arr)) & (arr[np.minimum(idx, len(arr) - 1)] == uh)
                nh = np.bincount(ur, weights=hits, minlength=nrows).astype(np.int64)
        # (ns - nh) / ns in float64 — the exact expression the SQL oracle
        # uses, so the doubles are bit-identical
        novelty = np.where(ns > 0, (ns - nh) / np.maximum(ns, 1), 1.0)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(df["doc_id"], dtype=np.int64),
                "n_shingles": ns,
                "n_hit": nh,
                "novelty": novelty,
            }
        )

    return ds.map_batches(probe, batch_format="pandas")


def decontaminate_bloom(
    ds, bench_ds, shingle_k: int = 5, bits_log2: int = 20, n_hashes: int = 4
):
    """Bloom-filter decontamination — the scale path of
    ``decontaminate`` for benchmark/test sets whose distinct shingle
    set is too large to broadcast exactly (the exact sorted-array
    broadcast is 8 bytes/shingle; the Bloom filter is
    2**bits_log2 / 8 bytes TOTAL, e.g. 1 GiB covers ~10^9 shingles at
    n_hashes=4 with ~2% FPR).

    One-sided error: NO false negatives — every document the exact
    path flags is flagged here (pinned by a superset test); a false
    positive only costs discarding a clean document, the safe
    direction for training-data hygiene.  Probe positions come from
    double hashing (pos_i = h + i*h2 mod m, h2 odd), all vectorized;
    the corpus is never shuffled and only the bit array crosses the
    wire (ray.put once, zero-copy view per actor)."""
    import ray as _ray

    m_bits = 1 << bits_log2
    mask = np.uint64(m_bits - 1)  # m is a power of two

    def positions(sh: np.ndarray) -> np.ndarray:
        """(n_hashes, len(sh)) probe bit positions for shingle hashes.

        The input hash is re-mixed with a splitmix64 finalizer before
        the double-hash split: without full avalanche, ``h2 & mask``
        would be a function of h1's LOW bits alone (multiplication mod
        2**k only sees the low k bits), so any two shingles sharing the
        low ``bits_log2`` bits would collide on ALL probes and the
        filter would degrade to a ``bits_log2``-bit hash."""
        z = sh.astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        h1 = z & mask
        h2 = (z >> np.uint64(32)) | np.uint64(1)  # odd, from the high bits
        return np.stack(
            [((h1 + np.uint64(i) * h2) & mask) for i in range(n_hashes)]
        )

    def bench_bits(df: pd.DataFrame) -> pd.DataFrame:
        """One bench block -> the packed bit array it lights up."""
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        if len(df):
            flat = np.concatenate(_shingle_hashes_batch(list(df["text"]), shingle_k))
            if len(flat):
                pos = positions(np.unique(flat)).ravel()
                np.bitwise_or.at(bits, pos >> np.uint64(3), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    # OR-merge the per-block filters: tiny (m/8 bytes each), associative
    parts = bench_ds.map_batches(bench_bits, batch_format="pandas").to_pandas()
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    for blob in parts["bits"]:
        bits |= np.frombuffer(blob, dtype=np.uint8)
    bits_ref = _ray.put(bits)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        arr = _ray.get(bits_ref)  # zero-copy numpy view of plasma
        sh_list = _shingle_hashes_batch(list(df["text"]), shingle_k)
        sizes = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=len(sh_list))
        total = int(sizes.sum())
        if total == 0:
            hit_any = np.zeros(len(sh_list), dtype=bool)
        else:
            pos = positions(np.concatenate(sh_list))
            set_ = (arr[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
            hits = set_.all(axis=0)  # shingle hit iff ALL n_hashes bits set
            c = np.concatenate([[0], np.cumsum(hits)])
            ends = np.cumsum(sizes)
            hit_any = (c[ends] - c[ends - sizes]) > 0
        return pd.DataFrame(
            {
                "doc_id": np.asarray(df["doc_id"], dtype=np.int64),
                "contaminated": hit_any,
            }
        )

    return ds.map_batches(probe, batch_format="pandas")


def decontaminate_fuzzy(
    ds,
    bench_ds,
    threshold: float = 0.8,
    n_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
):
    """FUZZY benchmark decontamination: flag documents whose word-
    shingle Jaccard similarity with ANY benchmark document is >=
    ``threshold`` — near-duplicate contamination that the exact
    shingle-overlap paths (``decontaminate`` / ``decontaminate_bloom``)
    would also catch, but with far fewer false flags: a single common
    5-gram does not condemn a document, only genuine near-duplication
    of a benchmark item does (the GPT-3 Appendix C / Llama "dirty
    at 13-gram" family's stricter sibling).

    Scale shape: the benchmark side is small by definition, so BOTH
    its banded-minhash LSH index and its per-doc sorted shingle sets
    are built once (bounded by benchmark size), broadcast via ONE
    ``ray.put``, and every corpus batch (a) probes the band index with
    a vectorized searchsorted to get candidate (doc, bench) pairs and
    (b) exactly verifies only those candidates against the bench
    shingle sets. ONE streaming pass over the corpus, zero shuffles,
    zero joins, nothing corpus-sized on the driver.

    Oracle validity (same contract as dedup_minhash_lsh): at the
    shipped parameters (128 perms / 32 bands, r=4) candidate recall
    for J>=0.8 (doc, bench) pairs is 1.0 on the test corpora — pinned
    by ``test_fuzzy_decontaminate_recall_precondition`` — so the exact
    all-pairs Jaccard SQL reproduces the sketch->verify path
    value-for-value. Returns (doc_id, contaminated) for every doc."""
    import ray as _ray

    assert n_perm % bands == 0
    rows = n_perm // bands

    def bench_index(df: pd.DataFrame) -> pd.DataFrame:
        """One bench block -> its (band keys, shingle sets) as ONE row
        of packed numpy buffers (bounded: bench-sized, not corpus)."""
        sh_list = [
            np.unique(s) for s in _shingle_hashes_batch(list(df["text"]), shingle_k)
        ]
        keep = [i for i, s in enumerate(sh_list) if len(s)]
        hasher = _MinHasher(n_perm)
        sigs = np.empty((len(keep), n_perm), dtype=np.uint64)
        for j, i in enumerate(keep):
            sigs[j] = hasher.signature(sh_list[i])
        keys = _band_keys(sigs, bands, rows) if keep else np.zeros((0, bands), np.uint64)
        sets = [sh_list[i] for i in keep]
        sizes = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        flat = np.concatenate(sets) if sets else np.zeros(0, np.uint64)
        return pd.DataFrame(
            {
                "keys": [keys.tobytes()],
                "flat": [flat.tobytes()],
                "sizes": [sizes.tobytes()],
            }
        )

    parts = bench_ds.map_batches(bench_index, batch_format="pandas").to_pandas()
    key_blocks, set_blocks, size_blocks = [], [], []
    for _, r in parts.iterrows():
        k = np.frombuffer(r["keys"], dtype=np.uint64).reshape(-1, bands)
        if len(k):
            key_blocks.append(k)
            set_blocks.append(np.frombuffer(r["flat"], dtype=np.uint64))
            size_blocks.append(np.frombuffer(r["sizes"], dtype=np.int64))
    if key_blocks:
        bkeys = np.concatenate(key_blocks)  # (n_bench, bands)
        bsizes = np.concatenate(size_blocks)
        boffs = np.concatenate([[0], np.cumsum(bsizes)])
        bflat = np.concatenate(set_blocks)
        # flatten the index: one sorted array of per-band-slot keys with
        # parallel bench-row ids (band slot folded into the key so only
        # same-slot chunks match, as in banded LSH)
        slot = _SHINGLE_P * np.arange(bands, dtype=np.uint64)
        with np.errstate(over="ignore"):
            comb = _mix64(bkeys + slot[None, :])
        browz = np.repeat(np.arange(len(bkeys), dtype=np.int64), bands)
        order = np.argsort(comb.ravel(), kind="stable")
        index = (comb.ravel()[order], browz[order], bflat, boffs, bsizes)
    else:
        index = None
    idx_ref = _ray.put(index)

    class Probe:
        """Actor-pool probe: hasher coefficients + the broadcast bench
        index are bound ONCE per actor (zero-copy plasma views), not
        per batch."""

        def __init__(self):
            self.hasher = _MinHasher(n_perm)
            self.idx = _ray.get(idx_ref)
            self.slot = _SHINGLE_P * np.arange(bands, dtype=np.uint64)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            doc_ids = np.asarray(df["doc_id"], dtype=np.int64)
            out = np.zeros(len(df), dtype=bool)
            if self.idx is not None and len(df):
                ckeys, crows, bflat, boffs, bsizes = self.idx
                sh_list = [
                    np.unique(s)
                    for s in _shingle_hashes_batch(list(df["text"]), shingle_k)
                ]
                keep = [i for i, s in enumerate(sh_list) if len(s)]
                sigs = np.empty((len(keep), n_perm), dtype=np.uint64)
                for j, i in enumerate(keep):
                    sigs[j] = self.hasher.signature(sh_list[i])
                all_keys = (
                    _band_keys(sigs, bands, rows)
                    if keep
                    else np.zeros((0, bands), np.uint64)
                )
                for j, i in enumerate(keep):
                    sh = sh_list[i]
                    with np.errstate(over="ignore"):
                        comb = _mix64(all_keys[j] + self.slot)
                    lo = np.searchsorted(ckeys, comb, side="left")
                    hi = np.searchsorted(ckeys, comb, side="right")
                    if not (hi > lo).any():
                        continue
                    cands = np.unique(
                        np.concatenate([crows[a:b] for a, b in zip(lo, hi) if b > a])
                    )
                    for c in cands:
                        bset = bflat[boffs[c] : boffs[c + 1]]
                        pos = np.searchsorted(bset, sh)
                        inter = int(
                            (
                                (pos < len(bset))
                                & (bset[np.minimum(pos, len(bset) - 1)] == sh)
                            ).sum()
                        )
                        union = len(sh) + int(bsizes[c]) - inter
                        if union and inter / union >= threshold:
                            out[i] = True
                            break
            return pd.DataFrame({"doc_id": doc_ids, "contaminated": out})

    return ds.map_batches(Probe, batch_format="pandas", concurrency=2)


def minhash_jaccard_dedup(
    ds,
    threshold: float = 0.8,
    n_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency: int = 2,
):
    """Production MinHash-LSH near-dup: banded-LSH candidates -> exact
    shingle-Jaccard verify (the standard two-stage shape; see e.g.
    Leskovec et al., *Mining of Massive Datasets* ch. 3).

    Output = exact pairs with Jaccard >= ``threshold`` *restricted to
    LSH candidates*.  At the default parameters (128 perms / 32 bands,
    r=4) candidate recall for J>=0.8 pairs is 1.0 on the sf0.01 corpus
    (measured), so the DuckDB all-pairs shingle oracle reproduces the
    full sketch->verify pipeline value-for-value.  Only the verify pass
    touches candidate text; the wide steps shuffle sketch keys only."""
    cands = minhash_lsh(ds, n_perm=n_perm, bands=bands, concurrency=concurrency)
    return ngram_jaccard_pairs(ds, cands, shingle_k=shingle_k, threshold=threshold)


def simhash_jaccard_dedup(
    ds,
    threshold: float = 0.8,
    bands: int = 8,
    max_hamming: int = 16,
    shingle_k: int = 5,
    concurrency: int = 2,
):
    """SimHash-bucketed near-dup with exact shingle-Jaccard verify.

    8-bit bands widen candidate generation (pigeonhole guarantees any
    pair within hamming 7 shares a band; on the sf0.01 corpus every
    J>=0.8 pair sits within hamming 8 and all collide — measured recall
    1.0), ``max_hamming`` keeps the hamming pre-filter permissive, and
    the exact verify makes the output equal the all-pairs answer, so
    the same ANSI-SQL shingle oracle applies.

    SCALE DIAL: band width trades recall for candidate volume — with
    b bands over 64 bits each band key has 64/b bits, so a corpus of N
    docs yields ~b * N^2 / 2^(64/b) candidate pairs from random
    collisions alone. bands=8 (8-bit keys, this oracle-recall preset)
    is quadratic beyond ~10^4 docs; at corpus scale use bands=4
    (16-bit keys, the classic hamming<=3 pigeonhole config,
    ``simhash_dedup``'s default) or bands=2 (32-bit keys), accepting
    the standard recall/cost tradeoff the verify stage makes safe."""
    cands = simhash_dedup(ds, bands=bands, max_hamming=max_hamming, concurrency=concurrency)
    pairs = cands.select_columns(["a", "b"])
    return ngram_jaccard_pairs(ds, pairs, shingle_k=shingle_k, threshold=threshold)


def connected_components(pairs_ds, max_iters: int = 64):
    """Connected components over a near-dup pair graph.

    Input: a Dataset of undirected edges ``(a, b)`` (any near-dup pair
    producer above). Output: one row ``(node, component)`` per distinct
    endpoint, where ``component`` is the minimum node id reachable —
    the canonical-doc id of that duplicate cluster. This is the step
    that turns *pairs* into corpus-level fuzzy dedup (keep one doc per
    cluster), the tail of the CCNet/SlimPajama-style pipeline.

    Scale shape: the pair graph is bounded by the duplicate count, not
    the corpus. Small graphs (<= _SMALL_PAIRSET edges, the same bound
    the pair-dedupe uses for driver work) collapse with one union-find
    pass on the driver. Larger graphs run distributed min-label
    propagation: each round hash-joins labels across edges and then
    shortcuts ``label -> label(label)`` (pointer doubling), giving
    O(log diameter) rounds; labels are monotone non-increasing, so
    convergence is detected by an unchanged Sum aggregate.
    """
    import ray.data as _rd
    from ray.data.aggregate import Min, Sum

    pairs_ds = pairs_ds.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["a"].astype("int64"), "b": df["b"].astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()
    n_edges = pairs_ds.count()
    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "component": pd.Series(dtype="int64")}
    )
    if n_edges == 0:
        return _rd.from_pandas(empty)

    if n_edges <= _SMALL_PAIRSET:
        # bounded driver-side union-find (path halving + union by min)
        df = pairs_ds.to_pandas()
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        idx = {int(n): i for i, n in enumerate(nodes)}
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for x, y in zip(a, b):
            rx, ry = find(idx[int(x)]), find(idx[int(y)])
            if rx != ry:
                # union by smaller ORIGINAL id so the root is the min node
                if nodes[rx] < nodes[ry]:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        comp = nodes[[find(i) for i in range(len(nodes))]]
        return _rd.from_pandas(
            pd.DataFrame({"node": nodes, "component": comp.astype(np.int64)})
        )

    # distributed min-label propagation with pointer doubling
    nparts = _default_partitions(n_rows=n_edges)
    edges = pairs_ds.map_batches(
        lambda df: pd.concat(
            [
                pd.DataFrame({"u": df["a"], "v": df["b"]}),
                pd.DataFrame({"u": df["b"], "v": df["a"]}),
            ],
            ignore_index=True,
        ).astype("int64"),
        batch_format="pandas",
    ).materialize()
    nodes_ds = _dedupe_pairs(
        edges.map_batches(
            lambda df: pd.DataFrame({"node": df["u"]}), batch_format="pandas"
        ),
        subset=("node",),
    )
    labels = nodes_ds.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "label": df["node"]}),
        batch_format="pandas",
    ).materialize()
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]
    for _ in range(max_iters):
        # relax across edges: node v receives label(u) for each (u, v)
        relaxed = edges.join(
            labels,
            join_type="inner",
            num_partitions=nparts,
            on=("u",),
            right_on=("node",),
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["v"], "label": df["label"]}),
            batch_format="pandas",
        )
        merged = (
            relaxed.union(labels)
            .groupby("node")
            .aggregate(Min("label"))
            .map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["node"], "label": df["min(label)"]}
                ),
                batch_format="pandas",
            )
        )
        # pointer doubling: label <- label(label) (labels are monotone,
        # so the mapped value is always <= the current one)
        shortcut = merged.join(
            merged.map_batches(
                lambda df: pd.DataFrame({"node2": df["node"], "label2": df["label"]}),
                batch_format="pandas",
            ),
            join_type="left_outer",
            num_partitions=nparts,
            on=("label",),
            right_on=("node2",),
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "label": df["label2"].fillna(df["label"]).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        labels = shortcut.materialize()
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "component": df["label"]}),
        batch_format="pandas",
    )


def fuzzy_dedup_keep(ds, pairs_ds, key: str = "doc_id", broadcast_limit: int = 5_000_000):
    """Corpus-level fuzzy dedup: assign every doc to its duplicate
    cluster and flag the canonical keeper.

    Output: ``(doc_id, component, keep)`` for EVERY input doc —
    singletons are their own component; ``keep`` is true iff the doc is
    the minimum id of its cluster (the standard keep-first policy).

    Scale shape: the component table is bounded by the duplicate count;
    when it fits a broadcast (<= ~5M nodes) the corpus is never
    shuffled — membership is a sorted-array lookup inside map_batches
    (the same semi-join pattern the Jaccard verify uses); beyond that
    it falls back to a left-outer hash join at cluster width.
    """
    import ray as _ray

    comp = connected_components(pairs_ds).materialize()
    ids = ds.map_batches(
        lambda df: pd.DataFrame({key: df[key].astype("int64")}), batch_format="pandas"
    )
    if comp.count() <= broadcast_limit:
        cdf = comp.to_pandas()
        order = np.argsort(cdf["node"].to_numpy())
        nodes_arr = cdf["node"].to_numpy(dtype=np.int64)[order]
        comp_arr = cdf["component"].to_numpy(dtype=np.int64)[order]
        ref = _ray.put((nodes_arr, comp_arr))

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            nodes_a, comp_a = _ray.get(ref)
            v = df[key].to_numpy(dtype=np.int64)
            idx = np.searchsorted(nodes_a, v)
            hit = (idx < len(nodes_a)) & (
                nodes_a[np.minimum(idx, len(nodes_a) - 1)] == v
            )
            component = np.where(hit, comp_a[np.minimum(idx, len(nodes_a) - 1)], v)
            return pd.DataFrame(
                {
                    key: v,
                    "component": component.astype(np.int64),
                    "keep": component == v,
                }
            )

        return ids.map_batches(assign, batch_format="pandas")

    joined = ids.join(
        comp,
        join_type="left_outer",
        num_partitions=_default_partitions(),
        on=(key,),
        right_on=("node",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        component = df["component"].fillna(df[key]).astype("int64")
        return pd.DataFrame(
            {key: df[key].astype("int64"), "component": component, "keep": component == df[key]}
        )

    return joined.map_batches(finish, batch_format="pandas")


# chunks per document are encoded into one int64 rank (doc_id << 20 | idx)
# so keep-first arbitration is a single Min aggregate; 2^20 chunks/doc is
# the documented ceiling (a 1M-paragraph web page does not exist).
_CHUNK_IDX_BITS = 20


def chunk_dedup(
    ds,
    key: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    broadcast_limit: int = 5_000_000,
):
    """Chunk-level (paragraph) exact dedup, CCNet/RefinedWeb-style.

    Splits every document on ``sep``, and for each distinct chunk string
    keeps only its globally-first occurrence — lowest ``(doc_id,
    chunk_idx)``. Output: one row per chunk ``(doc_id, chunk_idx,
    keep)``; a reassembly of ``keep`` chunks is the boilerplate-stripped
    corpus (the step CCNet runs before document-level dedup).

    Scale shape: the explode is vectorized (one str.split + repeat per
    batch); global arbitration is ONE ``groupby(h).aggregate(Min(rank),
    Count)`` over narrow (hash, rank) rows — the only shuffle. Hashes
    seen more than once (bounded by the *duplicate* volume, not the
    corpus) are filtered distributed; when that winners table fits
    ``broadcast_limit`` it is broadcast once (``ray.put``) and ``keep``
    is a vectorized merge inside ``map_batches`` — the chunk stream is
    never shuffled a second time. Larger winner tables fall back to a
    hash join at cluster width.
    """
    import ray as _ray
    import ray.data as _rd
    from ray.data.aggregate import Count, Min

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("")
        parts = texts.str.split(sep)
        n = parts.str.len().to_numpy(dtype=np.int64)
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    key: pd.Series(dtype="int64"),
                    "chunk_idx": pd.Series(dtype="int64"),
                    "h": pd.Series(dtype="object"),
                }
            )
        doc = np.repeat(df[key].to_numpy(dtype=np.int64), n)
        starts = np.repeat(np.cumsum(n) - n, n)
        idx = np.arange(total, dtype=np.int64) - starts
        flat = [c for chunks in parts for c in chunks]
        return pd.DataFrame(
            {
                key: doc,
                "chunk_idx": idx,
                "h": [_md5(c) for c in flat],
            }
        )

    chunks = ds.map_batches(explode, batch_format="pandas")

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": df["h"],
                "rank": (df[key].to_numpy(dtype=np.int64) << _CHUNK_IDX_BITS)
                | df["chunk_idx"].to_numpy(dtype=np.int64),
            }
        )

    agg = (
        chunks.map_batches(add_rank, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("rank", alias_name="min_rank"), Count(alias_name="n"))
    )
    # only hashes that actually repeat need arbitration; filtered
    # DISTRIBUTED before anything reaches the driver
    dups = agg.map_batches(
        lambda df: df.loc[df["n"] > 1, ["h", "min_rank"]], batch_format="pandas"
    ).materialize()

    def finish(df: pd.DataFrame, winners: pd.DataFrame) -> pd.DataFrame:
        rank = (df[key].to_numpy(dtype=np.int64) << _CHUNK_IDX_BITS) | df[
            "chunk_idx"
        ].to_numpy(dtype=np.int64)
        merged = df[["h"]].merge(winners, on="h", how="left")
        min_rank = merged["min_rank"].to_numpy()
        keep = np.isnan(min_rank) | (min_rank == rank)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(dtype=np.int64),
                "chunk_idx": df["chunk_idx"].to_numpy(dtype=np.int64),
                "keep": keep,
            }
        )

    if dups.count() <= broadcast_limit:
        wdf = dups.to_pandas()
        if wdf.empty:
            wdf = pd.DataFrame(
                {"h": pd.Series(dtype="object"), "min_rank": pd.Series(dtype="int64")}
            )
        ref = _ray.put(wdf)
        return chunks.map_batches(
            lambda df: finish(df, _ray.get(ref)), batch_format="pandas"
        )

    joined = chunks.join(
        dups,
        join_type="left_outer",
        num_partitions=_default_partitions(),
        on=("h",),
    )

    def finish_joined(df: pd.DataFrame) -> pd.DataFrame:
        rank = (df[key].to_numpy(dtype=np.int64) << _CHUNK_IDX_BITS) | df[
            "chunk_idx"
        ].to_numpy(dtype=np.int64)
        min_rank = df["min_rank"].to_numpy(dtype="float64", na_value=np.nan)
        keep = np.isnan(min_rank) | (min_rank == rank)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(dtype=np.int64),
                "chunk_idx": df["chunk_idx"].to_numpy(dtype=np.int64),
                "keep": keep,
            }
        )

    return joined.map_batches(finish_joined, batch_format="pandas")


def span_dedup_clean(
    ds,
    width: int = 10,
    key: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 5_000_000,
):
    """C4-style span dedup WITH reassembly: chunk every document into
    non-overlapping ``width``-token windows, keep only each distinct
    window's globally-first occurrence (lowest ``(doc_id, chunk_idx)``),
    and return the cleaned corpus ``(doc_id, text_clean)`` — kept
    windows re-joined in document order, whitespace normalized to
    single spaces.

    Scale shape (two passes over the corpus, ONE shuffle):
    pass 1 explodes narrow ``(md5, rank)`` rows and arbitrates with a
    single ``groupby(h).aggregate(Min(rank), Count)``; only hashes seen
    MORE than once survive the distributed filter, so the winners table
    is bounded by the duplicate volume, not the corpus.  When it fits
    ``broadcast_limit`` it ships once via ``ray.put`` and pass 2 is
    fully map-side: each batch re-windows its own documents, merges
    against the broadcast winners, and reassembles locally — a document
    never crosses batches, so reconstruction needs NO doc_id shuffle.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Min

    def windows_of(texts: pd.Series) -> list[list[str]]:
        out = []
        for t in texts.fillna(""):
            w = t.split()
            out.append([" ".join(w[i : i + width]) for i in range(0, len(w), width)])
        return out

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        wins = windows_of(df[text_col])
        n = np.fromiter((len(w) for w in wins), dtype=np.int64, count=len(wins))
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame(
                {"h": pd.Series(dtype="object"), "rank": pd.Series(dtype="int64")}
            )
        doc = np.repeat(df[key].to_numpy(dtype=np.int64), n)
        starts = np.repeat(np.cumsum(n) - n, n)
        idx = np.arange(total, dtype=np.int64) - starts
        return pd.DataFrame(
            {
                "h": [_md5(c) for w in wins for c in w],
                "rank": (doc << _CHUNK_IDX_BITS) | idx,
            }
        )

    agg = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("rank", alias_name="min_rank"), Count(alias_name="n"))
    )
    dups = agg.map_batches(
        lambda df: df.loc[df["n"] > 1, ["h", "min_rank"]], batch_format="pandas"
    ).materialize()
    n_dups = dups.count()
    if n_dups > broadcast_limit:  # pragma: no cover - corpus-scale leg
        raise NotImplementedError(
            "winners table above broadcast_limit: reassembly needs the "
            "hash-join leg (chunk_dedup) followed by a doc_id-keyed "
            "ordered regroup; wire chunk_dedup + string_agg for that path"
        )
    wdf = dups.to_pandas()
    win_map = dict(zip(wdf["h"], wdf["min_rank"].astype("int64"))) if len(wdf) else {}
    ref = _ray.put(win_map)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        winners = _ray.get(ref)
        docs = df[key].to_numpy(dtype=np.int64)
        out = []
        for d, wins in zip(docs, windows_of(df[text_col])):
            kept = []
            base = int(d) << _CHUNK_IDX_BITS
            for i, c in enumerate(wins):
                r = winners.get(_md5(c))
                if r is None or r == base | i:
                    kept.append(c)
            out.append(" ".join(kept))
        return pd.DataFrame({key: docs, "text_clean": out})

    return ds.map_batches(clean, batch_format="pandas")


def dup_count_weights(ds, num_partitions: int | None = None):
    """Duplicate-count reweighting: ``(doc_id, dup_count, weight)`` with
    ``weight = 1 / |exact-duplicate cluster|`` — the standard way to
    keep every copy in the corpus but make each duplicated document
    contribute one unit of training mass in total (soft dedup).

    Scale shape: per-batch md5 + per-batch partial counts, ONE
    groupby(h) Sum over hash-count partials, then one hash join of the
    (doc_id, h) table against the counts table — two key-width
    exchanges, no payload beyond the 32-byte hash. The division is one
    exact float64 op (1.0 / int), bit-identical to the SQL window
    ``COUNT(*) OVER (PARTITION BY md5(text))``."""
    from ray.data.aggregate import Sum

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"], "h": [_md5(t or "") for t in batch["text"]]})

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False).agg(n=("h", "size"))

    counts = (
        hashed.map_batches(partial, batch_format="pandas")
        .groupby("h")
        .aggregate(Sum("n", alias_name="dup_count"))
    )
    if num_partitions is None:
        num_partitions = _default_partitions()
    joined = hashed.join(
        counts, join_type="inner", num_partitions=num_partitions, on=("h",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "dup_count": df["dup_count"].astype("int64"),
                "weight": 1.0 / df["dup_count"].astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def fuzzy_dedup_keep_best(
    ds,
    pairs_ds,
    key: str = "doc_id",
    quality_col: str = "n_chars",
    broadcast_limit: int = 5_000_000,
):
    """Corpus-level fuzzy dedup with QUALITY arbitration: within each
    near-dup cluster keep the highest-``quality_col`` copy (ties to the
    lowest id) instead of blind keep-first — the policy real pipelines
    want when duplicates differ (a full article vs its truncated
    scrape). Singletons keep themselves.

    Output: ``(doc_id, component, keep)`` for EVERY input doc.

    Scale shape: everything cluster-sized stays bounded — components
    from the pair graph, member qualities collected by ONE corpus pass
    that ships only member rows (sorted-array membership probe), the
    winner table broadcast back; the corpus is never shuffled. The
    ``broadcast_limit`` join fallback seam is the same as
    ``fuzzy_dedup_keep``'s."""
    import ray as _ray

    comp = connected_components(pairs_ds).materialize()
    cdf = comp.to_pandas()
    if len(cdf) > broadcast_limit:
        raise NotImplementedError(
            "cluster table exceeds broadcast budget; wire the left-outer "
            "join fallback as in fuzzy_dedup_keep"
        )
    order = np.argsort(cdf["node"].to_numpy())
    nodes_arr = cdf["node"].to_numpy(dtype=np.int64)[order]
    comp_arr = cdf["component"].to_numpy(dtype=np.int64)[order]
    members_ref = _ray.put(nodes_arr)

    def member_quality(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(members_ref)
        v = df[key].to_numpy(dtype=np.int64)
        idx = np.searchsorted(m, v)
        hit = (idx < len(m)) & (m[np.minimum(idx, len(m) - 1)] == v)
        out = df.loc[hit, [key, quality_col]]
        return pd.DataFrame(
            {key: out[key].astype("int64"), "q": out[quality_col].astype("int64")}
        )

    qdf = ds.map_batches(member_quality, batch_format="pandas").to_pandas()
    merged = pd.DataFrame({"node": nodes_arr, "component": comp_arr}).merge(
        qdf.rename(columns={key: "node"}), on="node", how="left"
    )
    merged["q"] = merged["q"].fillna(-1).astype("int64")
    merged = merged.sort_values(
        ["component", "q", "node"], ascending=[True, False, True], ignore_index=True
    )
    winners = merged.groupby("component", as_index=False).first()[["component", "node"]]
    win_by_node = dict(zip(winners["component"], winners["node"]))
    win_arr = np.fromiter(
        (win_by_node[c] for c in comp_arr), dtype=np.int64, count=len(comp_arr)
    )
    ref = _ray.put((nodes_arr, comp_arr, win_arr))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        nodes_a, comp_a, win_a = _ray.get(ref)
        v = df[key].to_numpy(dtype=np.int64)
        idx = np.searchsorted(nodes_a, v)
        hit = (idx < len(nodes_a)) & (nodes_a[np.minimum(idx, len(nodes_a) - 1)] == v)
        cl = np.minimum(idx, max(len(nodes_a) - 1, 0))
        component = np.where(hit, comp_a[cl] if len(comp_a) else v, v)
        winner = np.where(hit, win_a[cl] if len(win_a) else v, v)
        return pd.DataFrame(
            {
                key: v,
                "component": component.astype(np.int64),
                "keep": winner == v,
            }
        )

    return ds.map_batches(
        lambda df: pd.DataFrame({key: df[key].astype("int64")}), batch_format="pandas"
    ).map_batches(assign, batch_format="pandas")


def substring_dedup(
    ds,
    width: int = 10,
    key: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 5_000_000,
):
    """Exact duplicated-substring detection, Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    semantics at token granularity: every OVERLAPPING ``width``-token
    window (stride 1 — unlike ``span_dedup_clean``'s aligned chunks, a
    duplicated passage is caught at ANY offset) is hashed, and an
    occurrence is duplicated unless it is the globally-first
    ``(doc_id, position)`` for its window.  Output: one row per
    document with >= 1 full window — ``(doc_id, n_windows,
    n_dup_windows, dup_frac)`` — the per-document signal the corpus
    cleaner thresholds on.

    Scale shape: the explode ships narrow (md5, packed-rank) rows and
    arbitration is ONE ``groupby(h).aggregate(Min, Count)``; only
    window hashes seen more than once survive (bounded by the
    duplicate volume), broadcast once via ``ray.put``, and the stats
    pass is map-side — documents never shuffle.  The paper's suffix
    array finds matches of ANY length >= width in one structure; the
    rolling-window form trades that for shuffle-free distribution
    (a match of length L >= width appears as L-width+1 duplicated
    windows, so dup_frac is a monotone proxy).  Windows are hashed as
    joined strings for oracle parity; the production kernel would
    Rabin-Karp over per-token hashes (documented seam).
    """
    import ray as _ray
    from ray.data.aggregate import Count, Min

    if width <= 0:
        raise ValueError("width must be positive")

    def windows_of(texts: pd.Series) -> list[list[str]]:
        out = []
        for t in texts.fillna(""):
            w = t.split()
            out.append([" ".join(w[i : i + width]) for i in range(len(w) - width + 1)])
        return out

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        wins = windows_of(df[text_col])
        n = np.fromiter((len(w) for w in wins), dtype=np.int64, count=len(wins))
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame({"h": pd.Series(dtype="object"), "rank": pd.Series(dtype="int64")})
        doc = np.repeat(df[key].to_numpy(dtype=np.int64), n)
        starts = np.repeat(np.cumsum(n) - n, n)
        idx = np.arange(total, dtype=np.int64) - starts
        return pd.DataFrame(
            {"h": [_md5(c) for w in wins for c in w], "rank": (doc << _CHUNK_IDX_BITS) | idx}
        )

    agg = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("rank", alias_name="min_rank"), Count(alias_name="n"))
    )
    dups = agg.map_batches(
        lambda df: df.loc[df["n"] > 1, ["h", "min_rank"]], batch_format="pandas"
    ).materialize()
    if dups.count() > broadcast_limit:  # pragma: no cover - corpus-scale leg
        raise NotImplementedError(
            "dup-window table above broadcast_limit: wire the stats pass "
            "as a hash join of the exploded (h, rank) stream against the "
            "winners table (chunk_dedup's join leg) instead of a broadcast"
        )
    wdf = dups.to_pandas()
    win_map = dict(zip(wdf["h"], wdf["min_rank"].astype("int64"))) if len(wdf) else {}
    ref = _ray.put(win_map)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        winners = _ray.get(ref)
        docs = df[key].to_numpy(dtype=np.int64)
        ids, n_wins, n_dups = [], [], []
        for d, wins in zip(docs, windows_of(df[text_col])):
            if not wins:
                continue
            base = int(d) << _CHUNK_IDX_BITS
            nd = 0
            for i, c in enumerate(wins):
                r = winners.get(_md5(c))
                if r is not None and r != base | i:
                    nd += 1
            ids.append(int(d))
            n_wins.append(len(wins))
            n_dups.append(nd)
        return pd.DataFrame(
            {
                key: pd.Series(ids, dtype="int64"),
                "n_windows": pd.Series(n_wins, dtype="int64"),
                "n_dup_windows": pd.Series(n_dups, dtype="int64"),
                "dup_frac": np.asarray(n_dups, dtype=np.float64)
                / np.maximum(np.asarray(n_wins, dtype=np.float64), 1.0),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")
