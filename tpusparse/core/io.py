"""Matrix I/O and pretty printing.

Reference: csparse::cs_load / cs_load.c (0-based ``i j x`` triplet text)
and csparse::cs_print / cs_print.c (SURVEY.md §2.2, §2.3).  Also reads the
MatrixMarket coordinate subset so standard demo matrices drop in.
"""

from __future__ import annotations

import io as _io

import numpy as np

from .matrix import COOMatrix, CSCMatrix
from .ops import norm1

__all__ = ["load", "load_file", "save", "sprint", "pprint"]


def load(fh) -> COOMatrix:
    """Read whitespace-separated 0-based ``i j x`` lines into a triplet
    matrix (reference: csparse::cs_load).  Accepts a file handle or str
    content; tolerates MatrixMarket headers (``%`` comments + a size line
    that is detected and consumed).
    """
    if isinstance(fh, str):
        fh = _io.StringIO(fh)
    rows, cols, vals = [], [], []
    mm = False
    mm_size_pending = False
    m = n = 0
    for line in fh:
        s = line.strip()
        if not s:
            continue
        if s.startswith("%"):
            if s.lower().startswith("%%matrixmarket"):
                mm = True
                mm_size_pending = True
            continue
        parts = s.split()
        if mm and mm_size_pending:
            m, n = int(parts[0]), int(parts[1])
            mm_size_pending = False
            continue
        i, j = int(parts[0]), int(parts[1])
        x = float(parts[2]) if len(parts) > 2 else 1.0
        if mm:  # MatrixMarket is 1-based
            i -= 1
            j -= 1
        rows.append(i)
        cols.append(j)
        vals.append(x)
    r = np.asarray(rows, dtype=np.int64)
    c = np.asarray(cols, dtype=np.int64)
    if not mm:
        m = int(r.max()) + 1 if r.size else 0
        n = int(c.max()) + 1 if c.size else 0
    return COOMatrix(m, n, r, c, np.asarray(vals))


def load_file(path: str) -> COOMatrix:
    with open(path) as fh:
        return load(fh)


def save(A, fh) -> None:
    """Write 0-based ``i j x`` triplet lines (inverse of :func:`load`)."""
    close = False
    if isinstance(fh, str):
        fh = open(fh, "w")
        close = True
    try:
        T = A.tocoo() if isinstance(A, CSCMatrix) else A
        for i, j, x in zip(T.row, T.col,
                           T.val if T.val is not None else np.ones(T.nnz)):
            fh.write(f"{int(i)} {int(j)} {float(x)!r}\n")
    finally:
        if close:
            fh.close()


def sprint(A, brief: bool = True) -> str:
    """Format a matrix like the reference's cs_print (header with dims,
    nnz, 1-norm; entries per column; brief mode truncates).

    Reference: csparse::cs_print / cs_print.c.
    """
    out = []
    if isinstance(A, COOMatrix):
        out.append(f"triplet: {A.m}-by-{A.n}, nzmax: {A.nnz} nnz: {A.nnz}")
        limit = 20 if brief else A.nnz
        for k in range(min(A.nnz, limit)):
            v = A.val[k] if A.val is not None else 1.0
            out.append(f"    {A.row[k]} {A.col[k]} : {v:.10g}")
        if brief and A.nnz > limit:
            out.append("  ...")
        return "\n".join(out)
    out.append(f"{A.m}-by-{A.n}, nzmax: {A.nnz} nnz: {A.nnz}, "
               f"1-norm: {norm1(A) if A.data is not None else 0:.10g}")
    printed = 0
    limit = 20 if brief else A.nnz
    for j in range(A.n):
        lo, hi = int(A.indptr[j]), int(A.indptr[j + 1])
        if lo == hi:
            continue
        out.append(f"    col {j} : locations {lo} to {hi - 1}")
        for k in range(lo, hi):
            v = A.data[k] if A.data is not None else 1.0
            out.append(f"      {A.indices[k]} : {v:.10g}")
            printed += 1
            if brief and printed >= limit:
                out.append("  ...")
                return "\n".join(out)
    return "\n".join(out)


def pprint(A, brief: bool = True) -> None:
    print(sprint(A, brief))
