"""Zero-copy helpers for embedding (`list<float>`) columns.

`pc.list_flatten(...).to_numpy().reshape(n, dim)` is the zero-copy form of
matrix extraction from an Arrow list column — `np.asarray(col.to_pylist())`
boxes every float through Python objects and shows up in every
embedding-consuming stage at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a fixed-width list<float> column.

    Zero-copy from the Arrow buffer where dtypes allow (pass the column's
    own value dtype to avoid the cast copy); assumes no nulls and uniform
    row length (embedding tables guarantee both).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    dim = len(flat) // n
    return flat.reshape(n, dim).astype(dtype, copy=False)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
