"""Entry filtering: fkeep / droptol / dropzeros / dupl.

Reference: csparse::cs_fkeep / cs_fkeep.c, cs_droptol.c, cs_dropzeros.c,
cs_dupl.c (SURVEY.md §2.2).  Vectorized with boolean masks instead of the
reference's in-place repacking loop.
"""

from __future__ import annotations

import numpy as np

from .matrix import CSCMatrix

__all__ = ["fkeep", "droptol", "dropzeros", "dupl"]

_IDX = np.int64


def fkeep(A: CSCMatrix, pred) -> CSCMatrix:
    """Keep entries where pred(i, j, x) is truthy.

    ``pred`` receives vectorized arrays (rows, cols, vals-or-None) and must
    return a boolean mask — the vectorized analog of the reference's
    per-entry callback (csparse::cs_fkeep / cs_fkeep.c).
    """
    cols = np.repeat(np.arange(A.n, dtype=_IDX), np.diff(A.indptr))
    mask = np.asarray(pred(A.indices, cols, A.data), dtype=bool)
    p = np.zeros(A.n + 1, dtype=_IDX)
    np.cumsum(np.bincount(cols[mask], minlength=A.n), out=p[1:])
    return CSCMatrix(A.m, A.n, p, A.indices[mask],
                     None if A.data is None else A.data[mask])


def droptol(A: CSCMatrix, tol: float) -> CSCMatrix:
    """Drop entries with |x| <= tol (reference: csparse::cs_droptol)."""
    if A.data is None:
        return A.copy()
    return fkeep(A, lambda i, j, x: np.abs(x) > tol)


def dropzeros(A: CSCMatrix) -> CSCMatrix:
    """Drop exactly-zero entries (reference: csparse::cs_dropzeros)."""
    if A.data is None:
        return A.copy()
    return fkeep(A, lambda i, j, x: x != 0.0)


def dupl(A: CSCMatrix) -> CSCMatrix:
    """Sum duplicate entries within columns (reference: csparse::cs_dupl).

    Constructors in this package already deduplicate; this exists for
    matrices assembled by external code.
    """
    return A.tocoo().tocsc(sum_duplicates=True)
