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

__all__ = ["kmeans_assign", "kmeans_centroids", "semdedup"]


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # squared euclidean via the expansion; argmin is tie-stable (first
    # minimum = lowest cluster id)
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ centroids.T)
        + (centroids * centroids).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


def _partial_stage(centroids_ref):
    """Per-batch cluster partial sums against broadcast centroids.

    A plain task function, not an actor class: the only state is the
    plasma-resident centroid matrix (``ray.get`` in a task is a
    zero-copy view), so each short training iteration skips the
    actor-pool spin-up — the ``linkgraph._edge_id_stage`` seam."""

    def fn(batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        centroids = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        if batch.num_rows == 0:
            return pd.DataFrame({"cluster": [], "count": [], "vsum": []})
        mat = embedding_matrix(batch.column("embedding"))
        assign = _assign(mat, centroids)
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

    return fn


def _assign_stage(centroids_ref, id_col: str):
    """(id, cluster) assignment task against broadcast centroids —
    task-based for the same spin-up reason as ``_partial_stage``."""

    def fn(batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        centroids = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        if batch.num_rows == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                }
            )
        mat = embedding_matrix(batch.column("embedding"))
        assign = _assign(mat, centroids)
        return pd.DataFrame(
            {
                id_col: batch.column(id_col).to_numpy(
                    zero_copy_only=False
                ).astype("int64"),
                "cluster": assign.astype("int64"),
            }
        )

    return fn


def kmeans_centroids(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> np.ndarray:
    """Final (k, dim) float64 centroids after ``iters`` Lloyd rounds.

    Deterministic convention shared with the SQL oracle: initial
    centroids are the vectors whose ``id_col < k`` (ids are dense from
    0 in the input_hint tables); each iteration assigns every row to
    the nearest centroid (squared euclidean, ties to the lowest cluster
    id) and recomputes centroids as member means in float64; a cluster
    that loses all members keeps its previous centroid.

    The input materializes once (Pregel-checkpoint seam): the seed take
    and every iteration pass reuse plasma blocks instead of re-running
    the upstream read.
    """
    ds = ds.materialize()
    seed = ds.map_batches(
        lambda df: df[df[id_col] < k], batch_format="pandas"
    ).take_all()
    seed.sort(key=lambda r: r[id_col])
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed])

    for _ in range(iters):
        ref = ray.put(centroids)
        parts = ds.map_batches(
            _partial_stage(ref),
            batch_format="pyarrow",
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
    return centroids


def kmeans_assign(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
):
    """Full-corpus Lloyd k-means; returns a Dataset of (id, cluster).

    See ``kmeans_centroids`` for the deterministic convention."""
    # materialize HERE so the assignment pass scans the same plasma
    # blocks the training iterations used (centroids' internal
    # materialize of an already-materialized dataset is a no-op)
    ds = ds.materialize()
    centroids = kmeans_centroids(ds, k, iters, id_col, vec_col, concurrency)
    ref = ray.put(centroids)
    return ds.map_batches(_assign_stage(ref, id_col), batch_format="pyarrow")


class _AssignKeepVec:
    """Cluster assignment that keeps the embedding column for the
    downstream per-cluster prune (one pass, no re-read)."""

    def __init__(self, centroids_ref, id_col: str, vec_col: str):
        self.centroids = (
            ray.get(centroids_ref)
            if isinstance(centroids_ref, ray.ObjectRef)
            else centroids_ref
        )
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch) -> pd.DataFrame:
        from .embutil import embedding_matrix

        if batch.num_rows == 0:
            return pd.DataFrame(
                {
                    self.id_col: pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                    self.vec_col: pd.Series(dtype="object"),
                }
            )
        mat = embedding_matrix(batch.column(self.vec_col))
        assign = _assign(mat, self.centroids)
        return pd.DataFrame(
            {
                self.id_col: batch.column(self.id_col).to_numpy(
                    zero_copy_only=False
                ).astype("int64"),
                "cluster": assign.astype("int64"),
                self.vec_col: list(mat),
            }
        )


def semdedup(
    ds,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering the embedding space, then dropping rows whose cosine
    similarity to any LOWER-id member of the same cluster reaches
    ``threshold`` (deterministic keep-first, SQL-expressible as an
    EXISTS over within-cluster pairs).

    Output: one row per input: ``(id, cluster, keep)``.

    Scale shape: this is the whole point of the algorithm — the O(n^2)
    cosine work is confined within clusters, so k is chosen to bound
    the expected cluster size (SemDeDup uses k ~ sqrt(n); 100k clusters
    over 10^9 embeddings keeps each group's similarity matrix ~10^4^2).
    The corpus is shuffled ONCE by cluster id (`groupby.map_groups`);
    within a group the prune is one normalized matmul plus a
    lower-triangle any-reduction — no per-pair Python.
    """
    centroids = kmeans_centroids(ds, k, iters, id_col, vec_col, concurrency)
    ref = ray.put(centroids)
    assigned = ds.map_batches(
        _AssignKeepVec,
        fn_constructor_args=(ref, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(group[id_col].to_numpy())
        ids = group[id_col].to_numpy(dtype=np.int64)[order]
        mat = np.stack(group[vec_col].to_numpy()[order]).astype(np.float64, copy=False)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T
        # keep iff no lower-id member reaches the threshold
        dup = np.tril(sim >= threshold, -1).any(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": group["cluster"].to_numpy(dtype=np.int64)[order],
                "keep": ~dup,
            }
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pandas")
