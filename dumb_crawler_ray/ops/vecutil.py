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


# ------------------------------------------------------- fixed-shape gemm
#
# BLAS picks its blocking (= the float summation order) by MATRIX SHAPE,
# so the same row matmul'd in a 3-row batch and a 200-row batch can differ
# in the last ulp — which is exactly what made every embedding-consuming
# op batch-shape-dependent (and therefore rows-only for the driver's SQL
# oracle: a Ray pipeline's batch boundaries are not deterministic).
# Padding every gemm call to ONE fixed row count makes every call the
# same shape → same kernel → same per-row summation order, so row i's
# result depends only on row i's data: bit-identical at any batch size,
# partition count, or BLAS thread count (verified in
# tests/test_codec.py::test_fixed_gemm_batch_independence; OpenBLAS
# splits threads over output columns, never the k reduction, at these
# shapes). The padding cost is ≤ GEMM_ROWS−1 zero rows per call — noise
# next to the decode that feeds these matmuls.

GEMM_ROWS = 64


def fixed_gemm(a: np.ndarray, w: np.ndarray) -> np.ndarray:
    """`a @ w` computed in fixed (GEMM_ROWS, k) @ (k, n) chunks so each
    row's float result is independent of len(a). dtype follows BLAS
    promotion of the inputs (use float32 in, float32 out)."""
    m = a.shape[0]
    out = np.empty((m, w.shape[1]), dtype=np.result_type(a, w))
    buf = np.zeros((GEMM_ROWS, a.shape[1]), dtype=a.dtype)
    for s in range(0, m, GEMM_ROWS):
        c = min(GEMM_ROWS, m - s)
        buf[:c] = a[s:s + c]
        if c < GEMM_ROWS:
            buf[c:] = 0
        out[s:s + c] = (buf @ w)[:c]
    return out


def fixed_sims(qm: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Cosine/dot similarity block `qm @ mat.T` with the corpus side
    chunked to the fixed gemm shape: sims[q, i] is bit-identical no
    matter how `mat`'s rows were batched across blocks — the property
    that lets brute-force top-k ops pin their candidate sets (and their
    stored-pact oracles) under any partitioning."""
    return fixed_gemm(mat, np.ascontiguousarray(qm.T)).T
