"""Zero-copy embedding-column access shared by the similarity / dedup
operator families.

The embeddings table stores vectors as ``list<float>`` (TESTDATA.md;
BASELINE.json input_hint). ``to_pylist()`` / object-Series stacking
materializes every float as a Python object before re-packing — this
helper instead reshapes the Arrow values buffer directly (one
contiguous dtype cast for the whole batch, no per-row Python).
"""

from __future__ import annotations

import numpy as np

__all__ = ["embedding_matrix", "covariance"]


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from an Arrow list/fixed_size_list column (or a
    pandas Series of sequences as a fallback). Assumes non-null rows;
    ragged lists fall back to per-row stacking."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        t = col.type
        if pa.types.is_fixed_size_list(t):
            vals = col.values.to_numpy(zero_copy_only=False)
            dim = t.list_size
            start = col.offset * dim
            return np.ascontiguousarray(
                vals[start : start + dim * len(col)].reshape(len(col), dim)
            ).astype(dtype, copy=False)
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if len(widths) == 0:
                return np.zeros((0, 0), dtype=dtype)
            if (widths == widths[0]).all():
                dim = int(widths[0])
                vals = col.values.to_numpy(zero_copy_only=False)
                return (
                    vals[offs[0] : offs[0] + dim * len(col)]
                    .reshape(len(col), dim)
                    .astype(dtype, copy=False)
                )
            return np.stack([np.asarray(v, dtype=dtype) for v in col.to_pylist()])
    arr = np.asarray(col, dtype=object)
    return np.stack([np.asarray(v, dtype=dtype) for v in arr])


def covariance(ds, vec_col: str = "embedding"):
    """Exact population covariance matrix of an embedding column — the
    kernel PCA / whitening / SemDeDup preprocessing needs. Returns a
    pandas DataFrame of ``(i, j, cov)`` rows (0-based dims, full dense
    matrix) with ``cov[i,j] = E[x_i x_j] - E[x_i] E[x_j]``.

    Scale shape: ONE streaming pass; each batch contributes a single
    partial row (flattened ``X^T X`` sum of dim^2 floats, the dim sum
    vector, the row count) — the classic map-side moment combine. The
    driver folds the bounded ``batches x dim^2`` partials; vectors never
    shuffle and the corpus is read once with one projected column. For
    dim=1k (4 MB/partial) raise the batch size so partial count stays
    small; beyond that, tree-reduce the partials (seam at the
    ``to_pandas`` below)."""
    import pandas as pd

    def partial(batch) -> "pd.DataFrame":
        m = embedding_matrix(batch.column(vec_col))
        if m.size == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="object"),
                                 "ss": pd.Series(dtype="object")})
        return pd.DataFrame(
            {"n": [len(m)], "s": [m.sum(axis=0)], "ss": [(m.T @ m).ravel()]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "cov": pd.Series(dtype="float64")})
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0)
    dim = len(s)
    mean = s / n
    cov = ss.reshape(dim, dim) / n - np.outer(mean, mean)
    ii, jj = np.indices((dim, dim))
    return pd.DataFrame(
        {"i": ii.ravel().astype("int64"), "j": jj.ravel().astype("int64"),
         "cov": cov.ravel()}
    )
