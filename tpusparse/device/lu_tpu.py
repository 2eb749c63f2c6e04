"""Device LU: Dulmage-Mendelsohn block triangular form + blocked dense
LU with partial pivoting per diagonal block.

The TPU-native redesign of csparse::cs_lu (SURVEY.md §3.2, §7.1 stage 4,
BASELINE.json north star: "dmperm + lu with partial pivoting" with
pivoting confined to device-friendly panels):

- host: dmperm(A) -> block upper triangular A(p,q); structural
  singularity (sprank < n) fails exactly like the reference;
- device: each diagonal block <= sparse_min is padded to the tile grid
  and factored by tpusparse.device.dense.blocked_lu (full partial
  pivoting inside the block — legal because BTF confines every pivot to
  its diagonal block); blocks ABOVE sparse_min factor by the sparse
  supernodal static-pivot engine (device.superscan_lu) WITHOUT
  densifying (VERDICT r1 item 3);
- solve: block back-substitution, off-diagonal coupling applied on host
  in f64 (O(nnz) total), wrapped in f64 iterative refinement.

The reference's *unrestricted* row pivoting across the whole matrix is
intentionally replaced by BTF + in-block pivoting (dense blocks) or
static pivoting + refinement (sparse blocks) — the static-shape
data-dependent-pivot problem called out in SURVEY.md §7.4(1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import permute
from ..core.perm import pinv as _pinv
from ..symbolic.dmperm import dmperm
from .dense import blocked_lu, lu_solve

__all__ = ["TpuLU"]


@dataclass
class _Block:
    lo: int                 # start in permuted coordinates
    size: int
    pad: int                # padded size on device
    LU: object = None       # device (pad, pad) factor
    perm: object = None     # device pivot perm
    sparse: object = None   # SuperscanLU for blocks > sparse_min


class TpuLU:
    """BTF + per-block dense LU on device.

    Usage: F = TpuLU(A); ok = F.factor(); x = F.solve(b).
    """

    def __init__(self, A: CSCMatrix, order: int = 2, bs: int = 16,
                 seed: int = 1, sparse_min: int = None,
                 tol: float = 1.0):
        if A.m != A.n:
            raise ValueError("square matrix required")
        import os
        self.tol = float(tol)
        if sparse_min is None:
            sparse_min = int(os.environ.get("TPUSPARSE_LU_SPARSE_MIN",
                                            "2048"))
        self.sparse_min = sparse_min
        self.A = A
        n = A.n
        D = dmperm(A, seed)
        self.sprank = int(D.rr[3])
        self.structurally_singular = self.sprank < n
        self.p, self.q = D.p, D.q
        self.r = D.r
        self.nb = D.nb
        self.bs = bs
        self.C = permute(A, _pinv(self.p), self.q, values=True)
        self.Cd = None          # per-block dense copies (host, f32 source)
        self.blocks: List[_Block] = []
        for b in range(self.nb):
            lo, hi = int(D.r[b]), int(D.r[b + 1])
            size = hi - lo
            if size > 1:
                # quantize pads to powers of two: bounds the number of
                # distinct jit shapes (each compile ~90 s on axon)
                pad = bs
                while pad < size:
                    pad *= 2
            else:
                pad = size
            self.blocks.append(_Block(lo=lo, size=size, pad=pad))
        self.ok = None
        self.growth = None      # reported when a block exceeds the
        #                         pivot-growth limit (superscan_lu)

    def factor(self) -> bool:
        """Factor every diagonal block on device; returns False on
        structural or numerical singularity (reference cs_lu contract)."""
        if self.structurally_singular:
            self.ok = False
            return False
        Cdense_cols = self.C
        ok = True
        for blk in self.blocks:
            lo, size, pad = blk.lo, blk.size, blk.pad
            if size > self.sparse_min:
                # sparse supernodal static-pivot path: O(lnz) memory,
                # no densification (superscan_lu docstring)
                from .superscan_lu import SuperscanLU
                sub = self._extract_block(lo, lo + size)
                F = SuperscanLU(sub, order=1, tol=self.tol)
                if not F.factor():
                    # pivot-growth escape (VERDICT r3 item 4): when the
                    # device detects uncontained element growth, retry
                    # ONCE with the coarser remedy — bottleneck matching
                    # forced on + strict within-panel pivoting — before
                    # declaring failure.  Still O(2 factors), no wasted
                    # refinement.  If that also blows up, the composite
                    # falls back to the host f64 engine (unrestricted
                    # pivoting, exact cs_lu.c semantics).
                    retry = (F.growth_exceeded
                             and (self.tol < 1.0
                                  or F.match_alpha is None))
                    if retry:
                        F2 = SuperscanLU(sub, order=1, tol=1.0,
                                         match=True)
                        if F2.factor():
                            F = F2
                        else:
                            self.growth = max(
                                g for g in (F.growth, F2.growth)
                                if g is not None)
                            ok = False
                    else:
                        if F.growth_exceeded:
                            self.growth = F.growth
                        ok = False
                blk.sparse = F
                continue
            # densify the diagonal block (host gather)
            dense = np.zeros((pad, pad), dtype=np.float32)
            for j in range(lo, lo + size):
                seg = slice(Cdense_cols.indptr[j], Cdense_cols.indptr[j + 1])
                rows = Cdense_cols.indices[seg]
                vals = Cdense_cols.data[seg]
                inblk = (rows >= lo) & (rows < lo + size)
                dense[rows[inblk] - lo, j - lo] = vals[inblk]
            for t in range(size, pad):
                dense[t, t] = 1.0                   # identity padding
            if size == 1:
                piv = dense[0, 0]
                if piv == 0 or not np.isfinite(piv):
                    ok = False
                blk.LU = float(piv)
                continue
            LU, perm = blocked_lu(jnp.asarray(dense), self.bs)
            d = np.abs(np.diag(np.asarray(LU)))
            if not np.all(np.isfinite(np.asarray(LU))) or np.any(d == 0):
                ok = False
            blk.LU = LU
            blk.perm = perm
        self.ok = ok
        return ok

    def _solve_f32(self, b: np.ndarray) -> np.ndarray:
        """One f32 solve pass: permute, block back-substitution with host
        coupling, unpermute."""
        n = self.A.n
        bp = np.asarray(b, np.float64)[self.p]      # rows of A(p,q)
        x = np.zeros(n, dtype=np.float64)
        Cp, Ci, Cx = self.C.indptr, self.C.indices, self.C.data
        for bi in range(self.nb - 1, -1, -1):
            blk = self.blocks[bi]
            lo, size = blk.lo, blk.size
            rhs = bp[lo:lo + size]
            if blk.sparse is not None:
                xb = blk.sparse._solve_f32(rhs)
            elif size == 1:
                xb = rhs / blk.LU
            else:
                rpad = np.zeros(blk.pad, dtype=np.float32)
                rpad[:size] = rhs
                xb = np.asarray(
                    lu_solve(blk.LU, blk.perm, jnp.asarray(rpad)),
                    dtype=np.float64)[:size]
            x[lo:lo + size] = xb
            # subtract coupling: bp[0:lo] -= C[0:lo, lo:lo+size] @ xb
            for jj in range(size):
                col = lo + jj
                seg = slice(Cp[col], Cp[col + 1])
                rows = Ci[seg]
                above = rows < lo
                bp[rows[above]] -= Cx[seg][above] * xb[jj]
        out = np.zeros(n, dtype=np.float64)
        out[self.q] = x                             # undo column perm
        return out

    def _extract_block(self, lo: int, hi: int) -> CSCMatrix:
        """Diagonal block C[lo:hi, lo:hi] as a CSC submatrix
        (vectorized slice, no densification)."""
        Cp, Ci, Cx = self.C.indptr, self.C.indices, self.C.data
        size = hi - lo
        s0, s1 = int(Cp[lo]), int(Cp[hi])
        rows = Ci[s0:s1]
        vals = Cx[s0:s1]
        cols = np.repeat(np.arange(size, dtype=np.int64),
                         np.diff(Cp[lo:hi + 1]))
        keep = (rows >= lo) & (rows < hi)
        indptr = np.zeros(size + 1, dtype=np.int64)
        np.cumsum(np.bincount(cols[keep], minlength=size),
                  out=indptr[1:])
        return CSCMatrix(size, size, indptr, rows[keep] - lo,
                         vals[keep])

    def solve(self, b: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        from .refine import refine
        if self.ok is None:
            self.factor()
        if not self.ok:
            raise ValueError("matrix is singular")
        x = refine(self.A, self._solve_f32, b, iters=refine_iters)
        if any(blk.sparse is not None for blk in self.blocks):
            # static pivoting perturbs tiny pivots instead of failing;
            # a numerically singular block shows up as a residual that
            # refinement cannot heal — surface it as singularity
            from ..core.ops import gaxpy, norm1
            r = np.abs(b - gaxpy(self.A, x, np.zeros_like(x))).max()
            denom = norm1(self.A) * np.abs(x).max() + np.abs(b).max()
            if denom == 0 or not np.isfinite(r) or r / denom > 1e-8:
                raise ValueError("matrix is singular "
                                 "(refinement diverged)")
        return x
