"""Padded device storage formats.

The reference's CSC is a host interchange format; on device everything is
padded and static (SURVEY.md §7.0 "Storage"):

- **ELL**: (m, K) value/column slabs for scalar SpMV — K = max nnz/row,
  rows padded with column 0 / value 0.  Low waste on unstructured demo
  matrices; drives the XLA gather SpMV.
- **Block-ELL (BELL)**: (nbr, K, bm, bk) dense tile slabs + (nbr, K)
  tile-column ids for the MXU SpMV and the tiled factorizations.  Tiles
  aligned to the 8x128 VPU / 128x128 MXU.

Each plan records ``flops``/``bytes_min``/``bytes_padded`` so benchmarks
report padding waste honestly (SURVEY.md §7.4(3)).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import transpose

__all__ = ["EllMatrix", "BellMatrix", "DiaMatrix", "to_ell", "to_bell",
           "to_dia", "dia_offsets"]


@dataclass
class EllMatrix:
    m: int
    n: int
    nnz: int                       # true nonzeros
    vals: np.ndarray               # (m, K) f32
    cols: np.ndarray               # (m, K) i32 (padding points at col 0)
    K: int

    @property
    def bytes_min(self) -> int:    # CSR-equivalent minimum traffic
        return self.nnz * 8 + self.m * 4 + (self.m + self.n) * 4

    @property
    def bytes_padded(self) -> int:
        return self.vals.size * 8 + (self.m + self.n) * 4

    @property
    def flops(self) -> int:
        return 2 * self.nnz


@dataclass
class BellMatrix:
    m: int                         # logical rows
    n: int                         # logical cols
    nnz: int
    vals: np.ndarray               # (nbr, K, bm, bk) f32 dense tiles
    tile_cols: np.ndarray          # (nbr, K) i32 tile-column ids (pad: 0,
    #                                with an all-zero tile)
    K: int
    bm: int
    bk: int

    @property
    def flops_padded(self) -> int:
        return 2 * self.vals.size

    @property
    def flops(self) -> int:
        return 2 * self.nnz

    @property
    def waste_ratio(self) -> float:
        """Fraction of tile slots holding padding zeros."""
        return 1.0 - self.nnz / max(self.vals.size, 1)


@dataclass
class DiaMatrix:
    """Diagonal (DIA) storage: bands[d, i] = A[i, i + offsets[d]].

    The gather-free TPU SpMV format: y = sum_d bands[d] * shift(x, off_d)
    — pure VPU fma over contiguous slices, the STREAM-friendly path for
    stencil/banded matrices (targets the >=80%-of-HBM north star, which
    random-gather formats cannot reach on TPU)."""
    m: int
    n: int
    nnz: int
    offsets: np.ndarray            # (ndiag,) int64, sorted
    bands: np.ndarray              # (ndiag, m) f32

    @property
    def bytes_min(self) -> int:    # CSR-equivalent minimum traffic
        return self.nnz * 8 + self.m * 4 + (self.m + self.n) * 4

    @property
    def bytes_padded(self) -> int:
        return self.bands.size * 4 + (self.m + self.n) * 4

    @property
    def flops(self) -> int:
        return 2 * self.nnz

    @property
    def waste_ratio(self) -> float:
        return 1.0 - self.nnz / max(self.bands.size, 1)


def dia_offsets(A: CSCMatrix) -> np.ndarray:
    """Distinct diagonals (j - i) present in A."""
    cols = np.repeat(np.arange(A.n, dtype=np.int64), np.diff(A.indptr))
    return np.unique(cols - A.indices)


def to_dia(A: CSCMatrix) -> DiaMatrix:
    """CSC -> DIA (host, once per pattern)."""
    if A.data is None:
        raise ValueError("numeric matrix required")
    cols = np.repeat(np.arange(A.n, dtype=np.int64), np.diff(A.indptr))
    offs = cols - A.indices
    uniq = np.unique(offs)
    dmap = {int(o): d for d, o in enumerate(uniq)}
    bands = np.zeros((uniq.size, A.m), dtype=np.float32)
    didx = np.fromiter((dmap[int(o)] for o in offs), dtype=np.int64,
                       count=A.nnz)
    np.add.at(bands, (didx, A.indices), A.data)
    return DiaMatrix(m=A.m, n=A.n, nnz=A.nnz, offsets=uniq, bands=bands)


def to_ell(A: CSCMatrix, k_align: int = 1) -> EllMatrix:
    """CSC -> row-major ELL (host, once per pattern)."""
    if A.data is None:
        raise ValueError("numeric matrix required")
    AT = transpose(A)              # rows of A = columns of AT, sorted
    m, n = A.m, A.n
    rowlen = np.diff(AT.indptr)
    K = max(int(rowlen.max()) if m else 0, 1)
    K = -(-K // k_align) * k_align
    vals = np.zeros((m, K), dtype=np.float32)
    cols = np.zeros((m, K), dtype=np.int32)
    for i in range(m):
        lo, hi = AT.indptr[i], AT.indptr[i + 1]
        c = hi - lo
        vals[i, :c] = AT.data[lo:hi]
        cols[i, :c] = AT.indices[lo:hi]
    return EllMatrix(m=m, n=n, nnz=A.nnz, vals=vals, cols=cols, K=K)


def to_bell(A: CSCMatrix, bm: int = 8, bk: int = 128) -> BellMatrix:
    """CSC -> block-ELL with bm x bk dense tiles (host, once per pattern).

    Tile slot 0 of the x-side is reserved as an always-zero pad target:
    padding slots point at tile-column 0 with zero values, so no masking
    is needed in the kernel.
    """
    if A.data is None:
        raise ValueError("numeric matrix required")
    m, n = A.m, A.n
    nbr = -(-m // bm)
    nbc = -(-n // bk)
    cols_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    ti = A.indices // bm                     # tile row of each entry
    tj = cols_of // bk                       # tile col of each entry
    # unique (tile-row, tile-col) pairs
    key = ti * nbc + tj
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, first = np.unique(key_s, return_index=True)
    utr = (uniq // nbc).astype(np.int64)
    utc = (uniq % nbc).astype(np.int64)
    per_row = np.bincount(utr, minlength=nbr)
    K = max(int(per_row.max()) if per_row.size else 0, 1)
    vals = np.zeros((nbr, K, bm, bk), dtype=np.float32)
    tile_cols = np.zeros((nbr, K), dtype=np.int32)
    slot_of = {}
    fill = np.zeros(nbr, dtype=np.int64)
    for t in range(uniq.size):
        r, c = int(utr[t]), int(utc[t])
        s = int(fill[r])
        fill[r] += 1
        tile_cols[r, s] = c
        slot_of[(r, c)] = s
    # scatter entries into their tiles
    er = A.indices
    for p in range(A.nnz):
        i = int(er[p])
        j = int(cols_of[p])
        r, c = i // bm, j // bk
        s = slot_of[(r, c)]
        vals[r, s, i - r * bm, j - c * bk] += A.data[p]
    return BellMatrix(m=m, n=n, nnz=A.nnz, vals=vals, tile_cols=tile_cols,
                      K=K, bm=bm, bk=bk)
