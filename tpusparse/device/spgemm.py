"""Device SpGEMM: C = A @ B as batched dense-tile matmuls.

The TPU-native redesign of csparse::cs_multiply (SURVEY.md §2.2; north
star: "cs_multiply becomes Pallas SpMV/SpGEMM with segmented reduction").
Host planning enumerates the block-level product pattern — every tile
pair (A[i,k], B[k,j]) and its destination tile C[i,j] — then the device
executes ONE batched MXU matmul over all pairs and a segment-sum over
destination ids (the segmented reduction).  Gustavson's scalar
scatter/gather loop becomes two gathers, one einsum, one segment_sum.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import COOMatrix, CSCMatrix
from .config import HIGHEST

__all__ = ["SpgemmPlan", "spgemm_plan", "spgemm"]

_IDX = np.int64


def _tiles_of(A: CSCMatrix, bm: int, bk: int):
    """Dense tiles of A: returns (tile_array (T,bm,bk), id map {(I,K): t})."""
    cols = np.repeat(np.arange(A.n, dtype=_IDX), np.diff(A.indptr))
    ti = A.indices // bm
    tj = cols // bk
    pairs = sorted(set(zip(ti.tolist(), tj.tolist())))
    idmap = {p: t for t, p in enumerate(pairs)}
    tiles = np.zeros((max(len(pairs), 1), bm, bk), dtype=np.float32)
    tix = np.fromiter((idmap[(int(a), int(b))] for a, b in zip(ti, tj)),
                      dtype=_IDX, count=A.nnz)
    np.add.at(tiles, (tix, A.indices - ti * bm, cols - tj * bk), A.data)
    return tiles, idmap


@dataclass
class SpgemmPlan:
    m: int
    n: int
    flops_padded: int
    _run: object = None
    _bufs: tuple = None
    _out_tiles: list = None     # [(I, J)] per output tile id
    _bm: int = 0
    _bn: int = 0

    def apply_to_csc(self) -> CSCMatrix:
        """Execute and convert the tile result back to host CSC
        (explicit zeros dropped, like cs_multiply output after dupl)."""
        out = np.asarray(self._run(*self._bufs))
        rows, cols, vals = [], [], []
        for t, (I, J) in enumerate(self._out_tiles):
            tile = out[t]
            r, c = np.nonzero(tile)
            keep = (I * self._bm + r < self.m) & (J * self._bn + c < self.n)
            rows.append(I * self._bm + r[keep])
            cols.append(J * self._bn + c[keep])
            vals.append(tile[r[keep], c[keep]])
        if rows:
            rows = np.concatenate(rows)
            cols = np.concatenate(cols)
            vals = np.concatenate(vals).astype(np.float64)
        return COOMatrix(self.m, self.n, rows, cols, vals).tocsc()


def spgemm_plan(A: CSCMatrix, B: CSCMatrix, block: int = 32) -> SpgemmPlan:
    """Plan C = A@B on (block x block) tiles (host, once per pattern)."""
    if A.n != B.m:
        raise ValueError("dimension mismatch")
    if A.data is None or B.data is None:
        raise ValueError("numeric matrices required")
    bm = bk = bn = block
    At, Amap = _tiles_of(A, bm, bk)
    Bt, Bmap = _tiles_of(B, bk, bn)
    # block-row index of B tiles for pairing
    Bby_k: dict = {}
    for (K, J), t in Bmap.items():
        Bby_k.setdefault(K, []).append((J, t))
    srcA, srcB, dstIJ = [], [], []
    for (I, K), ta in Amap.items():
        for J, tb in Bby_k.get(K, []):
            srcA.append(ta)
            srcB.append(tb)
            dstIJ.append((I, J))
    out_pairs = sorted(set(dstIJ))
    outmap = {p: t for t, p in enumerate(out_pairs)}
    dst = np.fromiter((outmap[p] for p in dstIJ), dtype=_IDX,
                      count=len(dstIJ))
    nout = max(len(out_pairs), 1)
    srcA = np.asarray(srcA, dtype=np.int32)
    srcB = np.asarray(srcB, dtype=np.int32)
    dst32 = dst.astype(np.int32)

    @jax.jit
    def run(At, Bt):
        if srcA.size == 0:
            return jnp.zeros((nout, bm, bn), jnp.float32)
        Pa = At[jnp.asarray(srcA)]
        Pb = Bt[jnp.asarray(srcB)]
        prod = jnp.einsum("uik,ukj->uij", Pa, Pb, precision=HIGHEST)
        return jax.ops.segment_sum(prod, jnp.asarray(dst32),
                                   num_segments=nout)

    return SpgemmPlan(m=A.m, n=B.n,
                      flops_padded=2 * len(dstIJ) * bm * bk * bn,
                      _run=run, _bufs=(jnp.asarray(At), jnp.asarray(Bt)),
                      _out_tiles=out_pairs, _bm=bm, _bn=bn)


def spgemm(A: CSCMatrix, B: CSCMatrix, block: int = 32) -> CSCMatrix:
    """One-shot device C = A@B (reference cs_multiply semantics)."""
    return spgemm_plan(A, B, block).apply_to_csc()
