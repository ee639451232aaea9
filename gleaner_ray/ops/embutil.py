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

__all__ = ["embedding_matrix", "covariance", "dim_bounds", "quantize_uint8", "quantization_error", "power_iteration"]


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


def dim_bounds(ds, vec_col: str = "embedding"):
    """Per-dimension (lo, hi) of an embedding column — ONE streaming
    pass of map-side partials (each batch contributes a single
    min-vector/max-vector row); the driver folds the bounded
    ``batches x dim`` table. Returns ``(lo, hi)`` float64 arrays."""
    import pandas as pd

    def partial(batch) -> "pd.DataFrame":
        m = embedding_matrix(batch.column(vec_col))
        if m.size == 0:
            return pd.DataFrame({"lo": pd.Series(dtype="object"),
                                 "hi": pd.Series(dtype="object")})
        return pd.DataFrame({"lo": [m.min(axis=0)], "hi": [m.max(axis=0)]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return np.zeros(0), np.zeros(0)
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    return lo, hi


def quantize_uint8(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Per-dimension uint8 scalar quantization (the 4x vector-compression
    step in front of a disk-resident ANN index):
    ``q = floor((x - lo_d) / (hi_d - lo_d) * 255 + 0.5)`` (0 when a
    dimension is constant). Two streaming passes: ``dim_bounds`` folds
    map-side min/max partials, then the bounds broadcast once via
    ``ray.put`` and each batch quantizes as one float64 matrix op —
    vectors never shuffle, no driver materialization of the corpus.

    The arithmetic is the literal float64 expression the SQL oracle
    evaluates — float32 inputs widen exactly, so the result is
    bit-identical across engines (no accumulation anywhere)."""
    import pyarrow as pa
    import ray

    lo, hi = dim_bounds(ds, vec_col)
    bounds_ref = ray.put((lo, hi))

    class Quantize:
        def __init__(self):
            self.lo, self.hi = ray.get(bounds_ref)
            self.rng = self.hi - self.lo
            self.const = self.rng == 0.0

        def __call__(self, t: "pa.Table") -> "pa.Table":
            if t.num_rows == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "q": pa.array([], pa.list_(pa.uint8()))}
                )
            m = embedding_matrix(t.column(vec_col))
            q = np.floor((m - self.lo) / np.where(self.const, 1.0, self.rng) * 255.0 + 0.5)
            q[:, self.const] = 0.0
            qarr = q.astype(np.uint8)
            n, dim = qarr.shape
            lists = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
                pa.array(qarr.ravel()),
            )
            return pa.table({id_col: t.column(id_col), "q": lists})

    return ds.map_batches(Quantize, batch_format="pyarrow", concurrency=2)


def power_iteration(ds, vec_col: str = "embedding", iters: int = 3):
    """Distributed PCA, first principal direction — the moment-matrix
    shape: ONE streaming covariance pass (:func:`covariance`; vectors
    never shuffle), then ``iters`` power-iteration steps on the driver
    over the bounded dim x dim matrix (Mises & Pollaczek-Geiringer
    1929; the PCA prep for whitening / SemDeDup / spectral data
    selection).

    Exactness device: the float covariance rounds ONCE to micro-units
    (``floor(cov*1e6 + 0.5)``, the same pinned expression as the
    ``emb_covariance`` oracle) and every power step is an INTEGER
    matrix-vector product from the all-ones start vector — exact,
    order-independent, hash-identical to the oracle's unrolled HUGEINT
    joins. The unnormalized iterate is the output; normalizing to a
    unit eigvector (one float sqrt per dim) is a driver postprocess
    left outside the oracle boundary.

    Output: ``(i, pc)`` — dimension index and the exact integer
    ``iters``-step iterate (magnitudes ~ (dim * |cov_micro|)^iters;
    int64-checked, widen iters with care)."""
    import pandas as pd

    cov = covariance(ds, vec_col=vec_col)
    if not len(cov):
        return pd.DataFrame({"i": pd.Series(dtype="int64"), "pc": pd.Series(dtype="int64")})
    dim = int(cov["i"].max()) + 1
    c_micro = np.floor(cov["cov"].to_numpy() * 1_000_000 + 0.5).astype(object)
    mat = c_micro.reshape(dim, dim)  # object dtype -> exact Python ints
    v = np.ones(dim, dtype=object)
    for _ in range(iters):
        v = mat @ v
    as_i64 = v.astype(np.int64)
    if not (as_i64.astype(object) == v).all():
        raise OverflowError("power_iteration iterate exceeds int64; reduce iters")
    return pd.DataFrame({"i": np.arange(dim, dtype=np.int64), "pc": as_i64})


def quantization_error(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Per-vector uint8-quantization distortion audit: for each vector,
    the MAX over dimensions of |scaled − round(scaled)| where scaled =
    (x − lo_d)/(hi_d − lo_d)·255 — the worst-case per-dimension error
    in quantization steps (∈ [0, 0.5]; constant dimensions contribute
    0). The report a compression rollout reads before trusting
    ``sim_knn_quantized`` rankings: a corpus whose max errors crowd 0.5
    has dimensions straddling rounding boundaries and needs per-block
    scales.

    Exactness: every |scaled − q| is ONE float64 expression and MAX is
    order-independent, so the result is bit-identical to the SQL
    oracle at any parallelism (no error sums anywhere — a sum of
    floats would be accumulation-order-dependent). Same two-pass shape
    as :func:`quantize_uint8`: bounds fold once, broadcast, then one
    row-local streaming pass."""
    import pandas as pd
    import pyarrow as pa
    import ray

    lo, hi = dim_bounds(ds, vec_col)
    bounds_ref = ray.put((lo, hi))

    class MaxErr:
        def __init__(self):
            self.lo, self.hi = ray.get(bounds_ref)
            rng = self.hi - self.lo
            self.const = rng == 0.0
            self.rng = np.where(self.const, 1.0, rng)

        def __call__(self, t: "pa.Table") -> "pd.DataFrame":
            if t.num_rows == 0:
                return pd.DataFrame(
                    {id_col: pd.Series(dtype="int64"), "max_err": pd.Series(dtype="float64")}
                )
            m = embedding_matrix(t.column(vec_col))
            s = (m - self.lo) / self.rng * 255.0
            err = np.abs(s - np.floor(s + 0.5))
            err[:, self.const] = 0.0
            return pd.DataFrame(
                {
                    id_col: t.column(id_col).to_pandas().astype("int64"),
                    "max_err": err.max(axis=1),
                }
            )

    return ds.map_batches(MaxErr, batch_format="pyarrow", concurrency=2)
