"""Core sparse matrix containers: triplet (COO) and compressed sparse column.

Capability parity with the reference's `cs` struct (reference:
csparse::cs / upstream cs.h struct cs — see SURVEY.md §2.1), re-designed
for a host-planner / device-kernel split:

- The reference uses ONE struct for both triplet and CSC form, flagged by
  `nz >= 0`.  Here we use two explicit classes, `COOMatrix` and `CSCMatrix`,
  with numpy array storage.  The thin cs_* parity layer in
  ``tpusparse.api`` reproduces the reference's calling conventions on top.
- Values may be absent (``x is None``) for pattern-only matrices, exactly as
  in the reference (symbolic routines accept value-free matrices).
- All index arrays are int64 numpy, values are float64 on host.  Device
  code converts to padded int32/float32 blocks via the planner
  (tpusparse.device).
"""

from __future__ import annotations

import numpy as np

__all__ = ["COOMatrix", "CSCMatrix", "coo_from_arrays", "csc_from_dense"]

_IDX = np.int64
_VAL = np.float64


class COOMatrix:
    """Triplet-form sparse matrix (reference: cs with nz >= 0).

    Fields mirror the reference contract (SURVEY.md §2.1): ``row``/``col``
    entry coordinates and optional ``val``.  Duplicates are legal here (and
    only here); they are summed by :meth:`tocsc` (reference: cs_compress
    followed by cs_dupl).
    """

    __slots__ = ("m", "n", "row", "col", "val")

    def __init__(self, m: int, n: int, row=None, col=None, val=None):
        self.m = int(m)
        self.n = int(n)
        self.row = np.asarray(row if row is not None else [], dtype=_IDX)
        self.col = np.asarray(col if col is not None else [], dtype=_IDX)
        if val is None:
            self.val = None
        else:
            self.val = np.asarray(val, dtype=_VAL)
            if self.val.shape != self.row.shape:
                raise ValueError("val/row length mismatch")
        if self.row.shape != self.col.shape:
            raise ValueError("row/col length mismatch")

    @property
    def nnz(self) -> int:
        return int(self.row.size)

    def entry(self, i: int, j: int, x: float) -> "COOMatrix":
        """Append one entry, growing the matrix dims if needed.

        Reference: csparse::cs_entry / cs_entry.c.  Returns self.
        """
        if i < 0 or j < 0:
            raise ValueError("negative index")
        self.row = np.append(self.row, _IDX(i))
        self.col = np.append(self.col, _IDX(j))
        if self.val is None:
            self.val = np.zeros(0, dtype=_VAL)
        self.val = np.append(self.val, _VAL(x))
        self.m = max(self.m, i + 1)
        self.n = max(self.n, j + 1)
        return self

    def tocsc(self, sum_duplicates: bool = True) -> "CSCMatrix":
        """Triplet -> CSC (reference: csparse::cs_compress / cs_compress.c,
        plus cs_dupl when ``sum_duplicates``).

        Vectorized: lexsort by (col, row) then segment-reduce duplicates.
        The reference compresses with a counting pass and leaves columns
        unsorted; we always produce sorted, deduplicated columns (callers
        of the reference obtain sorted columns by double transpose —
        SURVEY.md Appendix A).
        """
        if self.nnz == 0:
            return CSCMatrix(
                self.m, self.n,
                np.zeros(self.n + 1, dtype=_IDX),
                np.zeros(0, dtype=_IDX),
                None if self.val is None else np.zeros(0, dtype=_VAL),
            )
        if np.any(self.row >= self.m) or np.any(self.col >= self.n):
            raise ValueError("entry out of range")
        order = np.lexsort((self.row, self.col))
        r = self.row[order]
        c = self.col[order]
        v = self.val[order] if self.val is not None else None
        if sum_duplicates:
            # first element of each run of equal (c, r)
            new_run = np.empty(r.size, dtype=bool)
            new_run[0] = True
            np.not_equal(r[1:], r[:-1], out=new_run[1:])
            new_run[1:] |= c[1:] != c[:-1]
            run_id = np.cumsum(new_run) - 1
            r_u = r[new_run]
            c_u = c[new_run]
            if v is not None:
                v = np.bincount(run_id, weights=v, minlength=run_id[-1] + 1)
            r, c = r_u, c_u
        p = np.zeros(self.n + 1, dtype=_IDX)
        np.cumsum(np.bincount(c, minlength=self.n), out=p[1:])
        return CSCMatrix(self.m, self.n, p, r, v)

    def todense(self) -> np.ndarray:
        d = np.zeros((self.m, self.n), dtype=_VAL)
        if self.val is not None:
            np.add.at(d, (self.row, self.col), self.val)
        else:
            d[self.row, self.col] = 1.0
        return d


class CSCMatrix:
    """Compressed-sparse-column matrix (reference: cs with nz == -1).

    Contract (SURVEY.md §2.1): ``indptr`` has length n+1, ``indices`` holds
    row indices per column, ``data`` the values (or None for pattern-only).
    Columns are not required to be sorted (routines must tolerate unsorted
    input where the reference's do), but constructors in this package
    produce sorted columns.
    """

    __slots__ = ("m", "n", "indptr", "indices", "data")

    def __init__(self, m, n, indptr, indices, data):
        self.m = int(m)
        self.n = int(n)
        self.indptr = np.asarray(indptr, dtype=_IDX)
        self.indices = np.asarray(indices, dtype=_IDX)
        self.data = None if data is None else np.asarray(data, dtype=_VAL)
        if self.indptr.size != self.n + 1:
            raise ValueError("indptr must have length n+1")

    # ------------------------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def has_values(self) -> bool:
        return self.data is not None

    def copy(self) -> "CSCMatrix":
        return CSCMatrix(
            self.m, self.n, self.indptr.copy(), self.indices.copy(),
            None if self.data is None else self.data.copy(),
        )

    def pattern(self) -> "CSCMatrix":
        """Value-free copy (reference passes values=False to routines)."""
        return CSCMatrix(self.m, self.n, self.indptr.copy(),
                         self.indices.copy(), None)

    def col(self, j: int):
        """(row indices, values) of column j."""
        lo, hi = self.indptr[j], self.indptr[j + 1]
        vals = self.data[lo:hi] if self.data is not None else None
        return self.indices[lo:hi], vals

    def todense(self) -> np.ndarray:
        d = np.zeros((self.m, self.n), dtype=_VAL)
        cols = np.repeat(np.arange(self.n), np.diff(self.indptr))
        if self.data is not None:
            np.add.at(d, (self.indices, cols), self.data)
        else:
            d[self.indices, cols] = 1.0
        return d

    def tocoo(self) -> COOMatrix:
        cols = np.repeat(np.arange(self.n, dtype=_IDX), np.diff(self.indptr))
        return COOMatrix(self.m, self.n, self.indices.copy(), cols,
                         None if self.data is None else self.data.copy())

    def toscipy(self):
        import scipy.sparse as sp
        return sp.csc_matrix(
            (self.data if self.data is not None
             else np.ones(self.nnz, dtype=_VAL),
             self.indices.astype(np.int64), self.indptr.astype(np.int64)),
            shape=(self.m, self.n))

    @staticmethod
    def fromscipy(S) -> "CSCMatrix":
        S = S.tocsc()
        S.sort_indices()
        return CSCMatrix(S.shape[0], S.shape[1], S.indptr, S.indices, S.data)

    def sort_columns(self) -> "CSCMatrix":
        """Return a copy with row indices sorted within each column.

        The reference achieves this with a double transpose
        (SURVEY.md Appendix A); a direct segmented argsort is cheaper here.
        """
        cols = np.repeat(np.arange(self.n, dtype=_IDX), np.diff(self.indptr))
        order = np.lexsort((self.indices, cols))
        return CSCMatrix(
            self.m, self.n, self.indptr.copy(), self.indices[order],
            None if self.data is None else self.data[order])

    def __repr__(self):
        kind = "pattern" if self.data is None else "numeric"
        return (f"CSCMatrix({self.m}x{self.n}, nnz={self.nnz}, {kind})")


def coo_from_arrays(m, n, row, col, val=None) -> COOMatrix:
    return COOMatrix(m, n, row, col, val)


def csc_from_dense(d: np.ndarray, tol: float = 0.0) -> CSCMatrix:
    d = np.asarray(d, dtype=_VAL)
    r, c = np.nonzero(np.abs(d) > tol)
    return COOMatrix(d.shape[0], d.shape[1], r, c, d[r, c]).tocsc()
