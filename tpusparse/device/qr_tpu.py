"""Device QR: blocked Householder (compact-WY) on the AMD-permuted,
tile-padded matrix.

The TPU-native redesign of csparse::cs_qr (SURVEY.md §3.3, §7.1 stage 5):
instead of one sparse reflection at a time, panels of reflectors are
accumulated in WY form and applied as MXU GEMMs.  For the reference's
demo scale the permuted matrix is densified outright (padding columns get
unit diagonals in zero-padded rows, so R stays nonsingular and padded
solution components are exactly zero); the supernodal/multifrontal sparse
QR is the Cholesky-style tiled extension planned for a later round.

Least-squares (m >= n) and minimum-norm (m < n, factor A') paths follow
the reference driver (cs_qrsol), wrapped in f64 refinement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..symbolic.amd import amd
from .config import round_up
from .dense import (blocked_qr, qr_apply_q, qr_apply_qt, qr_solve_r,
                    qr_solve_rt)

__all__ = ["TpuQR"]


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
