"""Device QR: blocked Householder (compact-WY) on the AMD-permuted,
tile-padded matrix, plus the SPARSE Q-less path for large problems.

The TPU-native redesign of csparse::cs_qr (SURVEY.md §3.3, §7.1 stage 5):

* ``TpuQR`` — dense path for demo-scale problems: panels of reflectors
  accumulated in WY form and applied as MXU GEMMs (padding columns get
  unit diagonals in zero-padded rows, so R stays nonsingular and padded
  solution components are exactly zero).  O(m*n) memory — bounded by
  the sparse-path threshold in device.solvers.qrsol.
* ``SparseQR`` — Q-less supernodal QR for large sparse least squares
  (VERDICT r1 item 4): R is computed as the superscan Cholesky factor
  of A'A — i.e. the supernodal planner runs on the column etree of A'A,
  exactly the reference's sqr analysis (csparse::cs_sqr) — and Q is
  never formed.  Solves use the corrected seminormal equations (CSNE,
  Bjorck 1987; SuiteSparseQR's memory-light Q-less mode): x from
  R'R x = A'b with f64 iterative refinement on the normal equations.
  Condition squaring is the documented tradeoff vs the host sparse
  Householder engine (tpusparse.numeric.qr), which keeps the
  reference's exact semantics.

Least-squares (m >= n) and minimum-norm (m < n, factor A') paths follow
the reference driver (cs_qrsol), wrapped in f64 refinement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import gaxpy, multiply, transpose
from ..symbolic.amd import amd
from .config import round_up
from .dense import (blocked_qr, qr_apply_q, qr_apply_qt, qr_solve_r,
                    qr_solve_rt)

__all__ = ["TpuQR", "SparseQR"]


class SparseQR:
    """Q-less supernodal QR of a tall sparse matrix (m >= n): the
    R factor via superscan Cholesky of A'A; CSNE solves."""

    def __init__(self, A: CSCMatrix, order: int = 3, **superscan_kw):
        if A.m < A.n:
            raise ValueError("m >= n required (caller factors A')")
        from .superscan import SuperscanCholesky
        self.A = A
        self.At = transpose(A, values=True)
        self.AtA = multiply(self.At, A)
        self.F = SuperscanCholesky(self.AtA, order=1, **superscan_kw)
        # rank detection: chol of A'A fails iff A is (numerically)
        # rank-deficient at f32 grade — same flag as TpuQR.rank_ok
        self.rank_ok = self.F.factor()

    @property
    def plan(self):
        return self.F.plan

    def solve_ls(self, b: np.ndarray, refine_iters: int = 4) -> np.ndarray:
        """min ||A x - b||: R'R x = A'b, refined in f64 against the
        normal equations (CSNE)."""
        if not self.rank_ok:
            raise ValueError("rank deficient")
        atb = gaxpy(self.At, np.asarray(b, np.float64),
                    np.zeros(self.A.n))
        return self.F.solve_host(atb, refine_iters=refine_iters)

    def solve_minnorm(self, b: np.ndarray,
                      refine_iters: int = 4) -> np.ndarray:
        """This object factors B = A_orig' (tall, n x m).  The min-norm
        solution of A_orig x = b is x = A_orig' (A_orig A_orig')^-1 b,
        and B'B = A_orig A_orig'."""
        if not self.rank_ok:
            raise ValueError("rank deficient")
        y = self.F.solve_host(np.asarray(b, np.float64),
                              refine_iters=refine_iters)
        return gaxpy(self.A, y, np.zeros(self.A.m))


class TpuQR:
    """QR factorization of a (tall) sparse matrix on device."""

    def __init__(self, A: CSCMatrix, order: int = 3, bs: int = 16):
        if A.m < A.n:
            raise ValueError("m >= n required (caller factors A')")
        m, n = A.m, A.n
        self.A = A
        self.q = amd(order, A)
        npad = max(round_up(n, bs), bs)
        mpad = round_up(max(m + (npad - n), npad), 8)
        self.m, self.n = m, n
        self.mpad, self.npad = mpad, npad
        self.bs = bs
        dense = np.zeros((mpad, npad), dtype=np.float32)
        cols = self.q if self.q is not None else np.arange(n)
        for jj, col in enumerate(cols):
            seg = slice(A.indptr[col], A.indptr[col + 1])
            dense[A.indices[seg], jj] = A.data[seg]
        for t in range(n, npad):                 # unit pad columns in
            dense[m + (t - n), t] = 1.0          # otherwise-zero rows
        self.VR, self.taus = blocked_qr(jnp.asarray(dense), bs)
        Rdiag = np.abs(np.diag(np.asarray(self.VR))[:n])
        self.rank_ok = bool(np.all(Rdiag > 0) and
                            np.all(np.isfinite(np.asarray(self.VR))))

    def qt_apply(self, b: np.ndarray) -> np.ndarray:
        bpad = np.zeros(self.mpad, dtype=np.float32)
        bpad[:len(b)] = b
        return np.asarray(qr_apply_qt(self.VR, self.taus,
                                      jnp.asarray(bpad), self.bs))

    def solve_ls_f32(self, b: np.ndarray) -> np.ndarray:
        """min ||A x - b||: x = R^-1 (Q' b)[:n], column perm undone."""
        qtb = self.qt_apply(b)
        xp = np.asarray(qr_solve_r(self.VR, jnp.asarray(qtb)),
                        dtype=np.float64)[:self.n]
        x = np.zeros(self.n, dtype=np.float64)
        cols = self.q if self.q is not None else np.arange(self.n)
        x[cols] = xp
        return x

    def solve_minnorm_f32(self, b: np.ndarray) -> np.ndarray:
        """min ||x|| s.t. A' x' = ... : this factor is of A' (n' x m');
        solves the underdetermined system of the ORIGINAL A_orig = A'.

        Given this object factors B = A_orig' (tall), the min-norm
        solution of A_orig x = b is x = Q (R'^-1 (b with B's column perm
        applied)).
        """
        m_orig = self.n                      # rows of the original matrix
        cols = self.q if self.q is not None else np.arange(self.n)
        bp = np.asarray(b, np.float64)[cols]
        y = np.zeros(self.npad, dtype=np.float32)
        y[:m_orig] = bp
        z = np.asarray(qr_solve_rt(self.VR, jnp.asarray(y)),
                       dtype=np.float32)
        zfull = np.zeros(self.mpad, dtype=np.float32)
        zfull[:z.shape[0]] = z
        x = np.asarray(qr_apply_q(self.VR, self.taus, jnp.asarray(zfull),
                                  self.bs), dtype=np.float64)
        return x[:self.m]
