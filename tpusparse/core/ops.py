"""Host sparse BLAS over CSC matrices (reference layer L1, SURVEY.md §2.2).

Every routine is a numpy-vectorized re-design of the corresponding
reference component (cited per function).  These are the *host* versions
used for planning, small problems, and as ground truth; the performance
path lives in ``tpusparse.device``.
"""

from __future__ import annotations

import numpy as np

from .matrix import COOMatrix, CSCMatrix

__all__ = [
    "cumsum", "transpose", "add", "multiply", "gaxpy", "norm1",
    "permute", "symperm", "scale_cols",
]

_IDX = np.int64


def cumsum(c: np.ndarray):
    """Exclusive prefix sum; returns (p, total).

    Reference: csparse::cs_cumsum / cs_cumsum.c (which also copies p back
    into c; callers here keep both arrays explicitly instead).
    """
    c = np.asarray(c, dtype=_IDX)
    p = np.zeros(c.size + 1, dtype=_IDX)
    np.cumsum(c, out=p[1:])
    return p, int(p[-1])


def _expand_cols(A: CSCMatrix) -> np.ndarray:
    """Column index of every stored entry of A (COO expansion of indptr)."""
    return np.repeat(np.arange(A.n, dtype=_IDX), np.diff(A.indptr))


def transpose(A: CSCMatrix, values: bool = True) -> CSCMatrix:
    """C = A'.

    Reference: csparse::cs_transpose / cs_transpose.c (bucket counting +
    scatter).  Vectorized as a lexsort of the COO expansion; output columns
    are sorted, matching the reference's guarantee that its transpose
    produces sorted columns.
    """
    cols = _expand_cols(A)
    order = np.lexsort((cols, A.indices))          # sort by (new col=row, new row=col)
    p = np.zeros(A.m + 1, dtype=_IDX)
    np.cumsum(np.bincount(A.indices, minlength=A.m), out=p[1:])
    data = None
    if values and A.data is not None:
        data = A.data[order]
    return CSCMatrix(A.n, A.m, p, cols[order], data)


def add(A: CSCMatrix, B: CSCMatrix, alpha: float = 1.0,
        beta: float = 1.0) -> CSCMatrix:
    """C = alpha*A + beta*B.

    Reference: csparse::cs_add / cs_add.c (per-column cs_scatter into a
    dense accumulator).  Re-designed as COO concatenation + duplicate
    summation — same result, O(nnz log nnz) vectorized.
    Pattern-only inputs produce a pattern-only union.
    """
    if A.m != B.m or A.n != B.n:
        raise ValueError("dimension mismatch")
    row = np.concatenate([A.indices, B.indices])
    col = np.concatenate([_expand_cols(A), _expand_cols(B)])
    if A.data is not None and B.data is not None:
        val = np.concatenate([alpha * A.data, beta * B.data])
    else:
        val = None
    C = COOMatrix(A.m, A.n, row, col, val).tocsc()
    if val is None:
        # union pattern: drop duplicate coordinates
        cols = _expand_cols(C)
        keep = np.ones(C.nnz, dtype=bool)
        if C.nnz:
            keep[1:] = (C.indices[1:] != C.indices[:-1]) | (cols[1:] != cols[:-1])
        p = np.zeros(C.n + 1, dtype=_IDX)
        np.cumsum(np.bincount(cols[keep], minlength=C.n), out=p[1:])
        return CSCMatrix(C.m, C.n, p, C.indices[keep], None)
    return C


def multiply(A: CSCMatrix, B: CSCMatrix) -> CSCMatrix:
    """C = A @ B.

    Reference: csparse::cs_multiply / cs_multiply.c (Gustavson's
    column-at-a-time scatter/gather).  Re-designed fully vectorized: every
    stored product A(i,k)*B(k,j) is materialized as a COO entry via a
    repeat/gather expansion, then compressed with duplicate summation.
    Memory is O(flops) — fine for host planning sizes; the device SpGEMM
    (tpusparse.device.spgemm) handles large cases in tiles.
    """
    if A.n != B.m:
        raise ValueError("dimension mismatch")
    # For each entry (k, j, bval) of B, expand column k of A.
    bcols = _expand_cols(B)                         # j per B-entry
    k = B.indices                                   # k per B-entry
    seg_len = (A.indptr[k + 1] - A.indptr[k]).astype(_IDX)  # |A(:,k)|
    total = int(seg_len.sum())
    if total == 0:
        return CSCMatrix(A.m, B.n, np.zeros(B.n + 1, dtype=_IDX),
                         np.zeros(0, dtype=_IDX),
                         None if (A.data is None or B.data is None)
                         else np.zeros(0))
    # flat gather indices into A's entry arrays for each expanded product
    starts = A.indptr[k]
    seg_id = np.repeat(np.arange(k.size, dtype=_IDX), seg_len)
    # position within each segment
    seg_off = np.arange(total, dtype=_IDX) - np.repeat(
        np.concatenate([[0], np.cumsum(seg_len)[:-1]]).astype(_IDX), seg_len)
    gather = starts[seg_id] + seg_off
    rows = A.indices[gather]
    cols = bcols[seg_id]
    if A.data is not None and B.data is not None:
        vals = A.data[gather] * B.data[seg_id]
    else:
        vals = None
    C = COOMatrix(A.m, B.n, rows, cols, vals).tocsc()
    if vals is None:
        ccols = _expand_cols(C)
        keep = np.ones(C.nnz, dtype=bool)
        if C.nnz:
            keep[1:] = (C.indices[1:] != C.indices[:-1]) | (ccols[1:] != ccols[:-1])
        p = np.zeros(C.n + 1, dtype=_IDX)
        np.cumsum(np.bincount(ccols[keep], minlength=C.n), out=p[1:])
        return CSCMatrix(C.m, C.n, p, C.indices[keep], None)
    return C


def gaxpy(A: CSCMatrix, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """y + A@x (dense x, y); returns a new array.

    Reference: csparse::cs_gaxpy / cs_gaxpy.c.  The reference mutates y in
    place; we return y + A@x functionally (the api layer preserves the
    in-place convention).  Device version: tpusparse.device.spmv.
    """
    if A.data is None:
        raise ValueError("gaxpy requires numeric matrix")
    x = np.asarray(x, dtype=np.float64)
    out = np.array(y, dtype=np.float64, copy=True)
    contrib = A.data * x[_expand_cols(A)]
    np.add.at(out, A.indices, contrib)
    return out


def norm1(A: CSCMatrix) -> float:
    """1-norm: max column sum of |A| (reference: csparse::cs_norm / cs_norm.c)."""
    if A.data is None or A.n == 0:
        return 0.0
    colsum = np.bincount(_expand_cols(A), weights=np.abs(A.data),
                         minlength=A.n)
    return float(colsum.max()) if colsum.size else 0.0


def permute(A: CSCMatrix, pinv=None, q=None, values: bool = True) -> CSCMatrix:
    """C = P A Q, given *inverse* row permutation pinv (row i of A becomes
    row pinv[i] of C) and column permutation q (column j of C is column
    q[j] of A).

    Reference: csparse::cs_permute / cs_permute.c — identical conventions.
    """
    n, m = A.n, A.m
    q = np.arange(n, dtype=_IDX) if q is None else np.asarray(q, dtype=_IDX)
    lens = (A.indptr[q + 1] - A.indptr[q]).astype(_IDX)
    p, total = cumsum(lens)
    seg_id = np.repeat(np.arange(n, dtype=_IDX), lens)
    seg_off = np.arange(total, dtype=_IDX) - p[seg_id]
    gather = A.indptr[q][seg_id] + seg_off
    rows = A.indices[gather]
    if pinv is not None:
        rows = np.asarray(pinv, dtype=_IDX)[rows]
    data = A.data[gather] if (values and A.data is not None) else None
    return CSCMatrix(m, n, p, rows, data).sort_columns()


def symperm(A: CSCMatrix, pinv, values: bool = True) -> CSCMatrix:
    """C = P A P' for symmetric A with only the UPPER triangle stored;
    C is also upper-triangular.

    Reference: csparse::cs_symperm / cs_symperm.c.  Each stored entry
    (i, j), i<=j maps to (pinv[i], pinv[j]) placed in the upper triangle
    (swap if needed).
    """
    n = A.n
    pinv = (np.arange(n, dtype=_IDX) if pinv is None
            else np.asarray(pinv, dtype=_IDX))
    cols = _expand_cols(A)
    keep = A.indices <= cols                       # ignore any lower entries
    i2 = pinv[A.indices[keep]]
    j2 = pinv[cols[keep]]
    r = np.minimum(i2, j2)
    c = np.maximum(i2, j2)
    v = A.data[keep] if (values and A.data is not None) else None
    return COOMatrix(n, n, r, c, v).tocsc()


def scale_cols(A: CSCMatrix, s: np.ndarray) -> CSCMatrix:
    """Column scaling helper (no direct reference analog; used by tests)."""
    if A.data is None:
        raise ValueError("numeric matrix required")
    return CSCMatrix(A.m, A.n, A.indptr.copy(), A.indices.copy(),
                     A.data * np.asarray(s)[_expand_cols(A)])
