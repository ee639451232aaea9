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

__all__ = ["embedding_matrix"]


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
