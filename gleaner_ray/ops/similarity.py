"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_bruteforce``: exact cosine top-k — the baseline. The query
  matrix is broadcast once (``ray.put``), each batch does one numpy
  matmul and emits its local top-k; the driver merges the tiny partial
  top-k lists. Matches DuckDB's ``list_cosine_similarity`` oracle.
- ``ivf_knn``: IVF-style scale path — coarse centroids trained on a
  deterministic sample (k-means, a few Lloyd iterations), batches
  assign rows to centroids, probes search only the ``n_probe`` nearest
  cells. Approximate; recall measured against the brute-force baseline
  in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray

__all__ = ["knn_bruteforce", "ivf_knn", "train_centroids", "knn_quantized", "pq_codebooks", "pq_knn"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BatchTopK:
    """Per-batch cosine top-k against the broadcast query matrix.

    Arrow batch in (the embedding matrix is a reshape of the list
    column's values buffer — no per-row Python), vectorized top-k
    selection and output construction."""

    def __init__(self, query_ref, k: int):
        queries = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = np.asarray(queries["qids"])
        self.qmat = _normalize(np.asarray(queries["vectors"], dtype=np.float64))
        self.k = k

    def __call__(self, batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        if batch.num_rows == 0:
            return pd.DataFrame({"qid": [], "vec_id": [], "cosine": []})
        mat = _normalize(embedding_matrix(batch.column("embedding")))
        sims = self.qmat @ mat.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "qid": np.repeat(self.qids, k),
                "vec_id": vec_ids[idx].ravel().astype("int64"),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
        )


def knn_bruteforce(ds, query_vectors: dict, k: int = 10, concurrency: int = 2) -> pd.DataFrame:
    """Exact top-k for each query: {'qids': [...], 'vectors': [[...]]}.

    Per-batch local top-k -> driver merge (k × n_queries rows total per
    batch, trivially small next to the scanned embeddings)."""
    query_ref = ray.put(query_vectors)
    partials = ds.map_batches(
        _BatchTopK, fn_constructor_args=(query_ref, k), batch_format="pyarrow", concurrency=concurrency
    )
    best: dict = {}
    for row in partials.take_all():
        heap = best.setdefault(row["qid"], [])
        item = (row["cosine"], row["vec_id"])
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    rows = []
    for qid, heap in best.items():
        for cosine, vec_id in sorted(heap, reverse=True):
            rows.append({"qid": qid, "vec_id": vec_id, "cosine": cosine})
    return pd.DataFrame(rows, columns=["qid", "vec_id", "cosine"]).sort_values(
        ["qid", "cosine", "vec_id"], ascending=[True, False, True], ignore_index=True
    )


def train_centroids(ds, n_centroids: int = 16, sample: int = 2048, iters: int = 5, seed: int = 11) -> np.ndarray:
    """Deterministic mini k-means on a sample (driver-side, tiny)."""
    rows = ds.limit(sample).take_all()
    mat = _normalize(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows]))
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_knn(ds, query_vectors: dict, k: int = 10, n_centroids: int = 16, n_probe: int = 4, concurrency: int = 2):
    """IVF top-k: scan only batch rows whose centroid is among the
    n_probe cells nearest to any query. Returns same shape as brute."""
    centroids = train_centroids(ds, n_centroids)
    qmat = _normalize(np.asarray(query_vectors["vectors"], dtype=np.float64))
    probe_cells = set()
    cell_sims = qmat @ centroids.T
    for qi in range(len(qmat)):
        probe_cells.update(np.argsort(-cell_sims[qi])[:n_probe].tolist())
    cent_ref = ray.put({"centroids": centroids, "cells": sorted(probe_cells)})
    query_ref = ray.put(query_vectors)

    class ProbeTopK(_BatchTopK):
        def __init__(self):
            super().__init__(query_ref, k)
            info = ray.get(cent_ref)
            self.centroids = info["centroids"]
            self.cells = np.asarray(info["cells"])

        def __call__(self, batch) -> pd.DataFrame:
            import pyarrow as pa

            from .embutil import embedding_matrix

            if batch.num_rows == 0:
                return pd.DataFrame({"qid": [], "vec_id": [], "cosine": []})
            mat = _normalize(embedding_matrix(batch.column("embedding")))
            assign = np.argmax(mat @ self.centroids.T, axis=1)
            mask = np.isin(assign, self.cells)
            if not mask.any():
                return pd.DataFrame({"qid": [], "vec_id": [], "cosine": []})
            return super().__call__(batch.filter(pa.array(mask)))

    partials = ds.map_batches(ProbeTopK, batch_format="pyarrow", concurrency=concurrency)
    best: dict = {}
    for row in partials.take_all():
        heap = best.setdefault(row["qid"], [])
        item = (row["cosine"], row["vec_id"])
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    rows = []
    for qid, heap in best.items():
        for cosine, vec_id in sorted(heap, reverse=True):
            rows.append({"qid": qid, "vec_id": int(vec_id), "cosine": cosine})
    return pd.DataFrame(rows, columns=["qid", "vec_id", "cosine"]).sort_values(
        ["qid", "cosine", "vec_id"], ascending=[True, False, True], ignore_index=True
    )


def knn_quantized(ds, query_ids: list, k: int = 10, concurrency: int = 2) -> pd.DataFrame:
    """Exact-integer top-k over uint8-quantized vectors — the
    compressed-ANN scale path (a 4x smaller scan than float32 brute
    force; at 100 TB the quantized corpus is what actually fits the
    object store). Similarity = dot product of CENTERED codes
    ``sum((qa-128)*(qb-128))`` — exact int64, so ranking ties break
    deterministically on (score DESC, vec_id ASC) and the SQL oracle
    matches hash-for-hash (no float tolerance anywhere).

    Pipeline: ``quantize_uint8`` (bounds partials -> broadcast ->
    quantize) -> bounded take of the query rows -> per-batch int32
    matmul local top-k -> driver merge of k x queries x blocks partials.
    Local top-k partitions on the composite key ``score << 32 | ~vec_id``
    so within-batch ties keep the smaller vec_id — required for the
    global merge to be exact."""
    import pyarrow as pa

    from .embutil import embedding_matrix, quantize_uint8

    # materialized ONCE: the quantized corpus (4x smaller than float32)
    # is consumed twice (query-row take + the scan), and chaining the
    # Quantize pool directly into the QTopK pool would reserve both
    # pools' CPUs in one execution (starving the read tasks on small
    # sessions). At 100 TB this seam is a write_parquet of the
    # quantized corpus + re-read — the standard compressed-index build.
    quantized = quantize_uint8(ds).materialize()
    qid_arr = np.sort(np.asarray(list(query_ids), dtype=np.int64))

    def pick(t):
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("vec_id"), value_set=pa.array(qid_arr)))

    qrows = quantized.map_batches(pick, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = np.stack([np.asarray(r["q"], dtype=np.int64) for r in qrows]) - 128
    qids = np.asarray([r["vec_id"] for r in qrows], dtype=np.int64)
    query_ref = ray.put((qids, qmat))

    class QTopK:
        def __init__(self):
            self.qids, self.qmat = ray.get(query_ref)
            self.k = k

        def __call__(self, t) -> pd.DataFrame:
            if t.num_rows == 0:
                return pd.DataFrame({"qid": [], "vec_id": [], "score": []})
            mat = embedding_matrix(t.column("q"), dtype=np.int64) - 128
            scores = self.qmat @ mat.T  # (n_queries, batch) int64
            vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            kk = min(self.k, scores.shape[1])
            # composite: ties on score keep the SMALLER vec_id
            comp = (scores << np.int64(32)) | (np.int64(0xFFFFFFFF) - vec_ids)[None, :]
            idx = np.argpartition(-comp, kk - 1, axis=1)[:, :kk]
            return pd.DataFrame(
                {
                    "qid": np.repeat(self.qids, kk),
                    "vec_id": vec_ids[idx].ravel(),
                    "score": np.take_along_axis(scores, idx, axis=1).ravel(),
                }
            )

    partials = quantized.map_batches(QTopK, batch_format="pyarrow", concurrency=concurrency)
    best: dict = {}
    for row in partials.take_all():
        heap = best.setdefault(row["qid"], [])
        item = (row["score"], -row["vec_id"])
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    rows = []
    for qid, heap in best.items():
        for score, neg_id in sorted(heap, reverse=True):
            rows.append({"qid": int(qid), "vec_id": int(-neg_id), "score": int(score)})
    return pd.DataFrame(rows, columns=["qid", "vec_id", "score"]).sort_values(
        ["qid", "score", "vec_id"], ascending=[True, False, True], ignore_index=True
    )


def _pq_partial_stage(books_ref):
    """Per-batch Lloyd partials for every PQ subspace in one pass:
    emits (sub, cluster, count, float64-sum bytes) rows against the
    broadcast per-subspace codebooks.

    A plain task function, not an actor class: the only state is the
    plasma-resident codebook list and ``ray.get`` inside a task is a
    zero-copy view, so tasks skip the per-execution actor-pool spin-up
    that dominated each (short) training iteration — the same seam
    ``linkgraph._edge_id_stage`` documents."""

    def fn(batch) -> pd.DataFrame:
        from .cluster import _assign
        from .embutil import embedding_matrix

        books = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        if batch.num_rows == 0:
            return pd.DataFrame({"sub": [], "cluster": [], "count": [], "vsum": []})
        mat = embedding_matrix(batch.column("embedding"))
        subs, clusters, counts, sums = [], [], [], []
        span = mat.shape[1] // len(books)
        for s, book in enumerate(books):
            sub = mat[:, s * span : (s + 1) * span]
            assign = _assign(sub, book)
            for c in np.unique(assign):
                members = sub[assign == c]
                subs.append(s)
                clusters.append(int(c))
                counts.append(len(members))
                sums.append(members.sum(axis=0).tobytes())
        return pd.DataFrame(
            {
                "sub": pd.Series(subs, dtype="int64"),
                "cluster": pd.Series(clusters, dtype="int64"),
                "count": pd.Series(counts, dtype="int64"),
                "vsum": pd.Series(sums, dtype="object"),
            }
        )

    return fn


def pq_codebooks(
    ds,
    m: int = 2,
    k_sub: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> list:
    """Product-quantization codebooks: an independent Lloyd k-means per
    dimension subspace, all subspaces trained in the SAME streaming
    pass per iteration (one bounded (m x k_sub x blocks) driver
    combine, no shuffle). Deterministic convention shared with the
    ``cluster_kmeans`` oracle: init = the rows with ``id_col < k_sub``,
    squared-euclid assignment with ties to the lowest cluster id,
    empty clusters keep their previous centroid.

    The input materializes once up front (Pregel-checkpoint seam, same
    as the pagerank edge table): the seed take plus one streaming pass
    per iteration then reuse plasma blocks instead of re-running the
    read — at sf0.01 this halved sim_knn_pq wall time."""
    ds = ds.materialize()
    seed = ds.map_batches(
        lambda df: df[df[id_col] < k_sub], batch_format="pandas"
    ).take_all()
    seed.sort(key=lambda r: r[id_col])
    full = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed])
    span = full.shape[1] // m
    books = [full[:, s * span : (s + 1) * span].copy() for s in range(m)]

    for _ in range(iters):
        ref = ray.put(books)
        parts = ds.map_batches(
            _pq_partial_stage(ref),
            batch_format="pyarrow",
        ).to_pandas()  # bounded: <= m * k_sub rows per input block
        new_books = [b.copy() for b in books]
        for s in range(m):
            sp = parts[parts["sub"] == s]
            for c in range(k_sub):
                rows = sp[sp["cluster"] == c]
                total = int(rows["count"].sum())
                if total:
                    vsum = np.zeros(span, dtype=np.float64)
                    for b in rows["vsum"]:
                        vsum += np.frombuffer(b, dtype=np.float64)
                    new_books[s][c] = vsum / total
        books = new_books
    return books


def pq_knn(ds, query_ids: list, k: int = 10, m: int = 2, k_sub: int = 4, iters: int = 2, concurrency: int = 2) -> pd.DataFrame:
    """Product-quantization ADC top-k (Jégou et al. 2011) — the
    memory-bound ANN scale path: each vector is stored as ``m`` small
    codes (2 bytes here vs 256 float32 bytes), and query-time distance
    is ``m`` lookup-table adds instead of a ``dim``-wide dot product.

    Pipeline: ``pq_codebooks`` (streaming Lloyd per subspace) ->
    bounded take of the query rows -> one ADC scan pass (per batch:
    assign codes per subspace, distance = sum of broadcast per-query
    LUT entries, local top-k on (adist ASC, vec_id ASC)) -> driver
    merge of k x queries x blocks partials.

    Ranking is oracle-stable by construction: a query sees only
    ``k_sub**m`` distinct approximate distances (16 here), so ordering
    margins between distinct code pairs are macroscopic and equal-code
    ties break exactly on vec_id in both engines."""
    from .cluster import _assign
    from .embutil import embedding_matrix

    import pyarrow as pa

    ds = ds.materialize()  # reused by codebook training, query pick, ADC scan
    books = pq_codebooks(ds, m=m, k_sub=k_sub, iters=iters, concurrency=concurrency)
    qid_arr = np.sort(np.asarray(list(query_ids), dtype=np.int64))

    def pick(t):
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("vec_id"), value_set=pa.array(qid_arr)))

    qrows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qids = np.asarray([r["vec_id"] for r in qrows], dtype=np.int64)
    span = qmat.shape[1] // m
    # per-query ADC lookup tables: (n_queries, m, k_sub) squared dists
    luts = np.stack(
        [
            ((qmat[:, s * span : (s + 1) * span, None] - books[s].T[None]) ** 2).sum(axis=1)
            for s in range(m)
        ],
        axis=1,
    )
    state_ref = ray.put({"books": books, "luts": luts, "qids": qids})

    def adc_scan(t) -> pd.DataFrame:
        # task fn, not an actor: state is one plasma ref (zero-copy get)
        st = ray.get(state_ref)
        books_b, luts, qids = st["books"], st["luts"], st["qids"]
        if t.num_rows == 0:
            return pd.DataFrame({"qid": [], "vec_id": [], "adist": []})
        mat = embedding_matrix(t.column("embedding"))
        codes = [
            _assign(mat[:, s * span : (s + 1) * span], books_b[s]) for s in range(m)
        ]
        # (n_queries, batch): sum of LUT entries per subspace
        adist = np.zeros((len(qids), t.num_rows), dtype=np.float64)
        for s in range(m):
            adist += luts[:, s, :][:, codes[s]]
        vec_ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, t.num_rows)
        # local top-k on (adist ASC, vec_id ASC): lexsort per query
        order = np.lexsort((np.broadcast_to(vec_ids, adist.shape), adist), axis=1)[:, :kk]
        return pd.DataFrame(
            {
                "qid": np.repeat(qids, kk),
                "vec_id": vec_ids[order].ravel(),
                "adist": np.take_along_axis(adist, order, axis=1).ravel(),
            }
        )

    partials = ds.map_batches(adc_scan, batch_format="pyarrow")
    best: dict = {}
    for row in partials.take_all():
        heap = best.setdefault(row["qid"], [])
        item = (-row["adist"], -row["vec_id"])  # keep k smallest (adist, vec_id)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    rows = []
    for qid, heap in best.items():
        for neg_d, neg_id in sorted(heap, reverse=True):
            rows.append({"qid": int(qid), "vec_id": int(-neg_id), "adist": -neg_d})
    return pd.DataFrame(rows, columns=["qid", "vec_id", "adist"]).sort_values(
        ["qid", "adist", "vec_id"], ignore_index=True
    )
