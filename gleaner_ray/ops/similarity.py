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

__all__ = ["knn_bruteforce", "ivf_knn", "train_centroids"]


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
