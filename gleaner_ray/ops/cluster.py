"""Document clustering over the ``embeddings`` table.

``kmeans_assign`` — distributed Lloyd k-means with a deterministic
init (the rows whose id is < k), the standard corpus-clustering step a
training-data pipeline uses for data mixing / domain discovery
(SemDeDup/TLDR-style cluster-then-prune).

Scale shape: centroids are tiny (k x dim) and broadcast once per
iteration (``ray.put``); each batch does one vectorized distance
matmul and emits k partial rows (per-cluster running sums), so an
iteration is one streaming pass with a bounded (k x n_blocks) driver
combine — no shuffle at any point. Assignment ties break to the lowest
cluster id (argmin), mirroring the SQL oracle's ``ORDER BY dist, cid``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

__all__ = ["kmeans_assign"]


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # squared euclidean via the expansion; argmin is tie-stable (first
    # minimum = lowest cluster id)
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ centroids.T)
        + (centroids * centroids).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


class _Partial:
    """Per-batch cluster partial sums against broadcast centroids."""

    def __init__(self, centroids_ref):
        self.centroids = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )

    def __call__(self, batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        if batch.num_rows == 0:
            return pd.DataFrame({"cluster": [], "count": [], "vsum": []})
        mat = embedding_matrix(batch.column("embedding"))
        assign = _assign(mat, self.centroids)
        clusters, counts, sums = [], [], []
        for c in np.unique(assign):
            members = mat[assign == c]
            clusters.append(int(c))
            counts.append(len(members))
            sums.append(members.sum(axis=0).tobytes())
        return pd.DataFrame(
            {
                "cluster": pd.Series(clusters, dtype="int64"),
                "count": pd.Series(counts, dtype="int64"),
                "vsum": pd.Series(sums, dtype="object"),
            }
        )


class _Assign:
    def __init__(self, centroids_ref, id_col: str):
        self.centroids = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        self.id_col = id_col

    def __call__(self, batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        if batch.num_rows == 0:
            return pd.DataFrame(
                {
                    self.id_col: pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                }
            )
        mat = embedding_matrix(batch.column("embedding"))
        assign = _assign(mat, self.centroids)
        return pd.DataFrame(
            {
                self.id_col: batch.column(self.id_col).to_numpy(
                    zero_copy_only=False
                ).astype("int64"),
                "cluster": assign.astype("int64"),
            }
        )


def kmeans_assign(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
):
    """Full-corpus Lloyd k-means; returns a Dataset of (id, cluster).

    Deterministic convention shared with the SQL oracle: initial
    centroids are the vectors whose ``id_col < k`` (ids are dense from
    0 in the input_hint tables); each iteration assigns every row to
    the nearest centroid (squared euclidean, ties to the lowest cluster
    id) and recomputes centroids as member means in float64; a cluster
    that loses all members keeps its previous centroid.
    """
    seed = ds.map_batches(
        lambda df: df[df[id_col] < k], batch_format="pandas"
    ).take_all()
    seed.sort(key=lambda r: r[id_col])
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed])

    for _ in range(iters):
        ref = ray.put(centroids)
        parts = ds.map_batches(
            _Partial,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=concurrency,
        ).to_pandas()  # bounded: <= k rows per input block
        new = centroids.copy()
        for c in range(len(centroids)):
            rows = parts[parts["cluster"] == c]
            total = int(rows["count"].sum())
            if total:
                vsum = np.zeros(centroids.shape[1], dtype=np.float64)
                for b in rows["vsum"]:
                    vsum += np.frombuffer(b, dtype=np.float64)
                new[c] = vsum / total
        centroids = new

    ref = ray.put(centroids)
    return ds.map_batches(
        _Assign,
        fn_constructor_args=(ref, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
