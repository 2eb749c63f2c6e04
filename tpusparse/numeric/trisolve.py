"""Dense-RHS sparse triangular solves.

Reference (SURVEY.md §2.2): csparse::cs_lsolve / cs_lsolve.c,
cs_ltsolve.c, cs_usolve.c, cs_utsolve.c.  Contract: L is stored with the
diagonal entry FIRST in each column, U with the diagonal LAST — exactly
what the chol/lu factorizations produce.  Host f64 versions; the
level-scheduled batched DEVICE triangular solves live inside each
engine's solve schedule (device.chol_tpu._solve_fn,
device.superscan._segment_solve, device.superscan_lu._segment_solve_lu,
device.supernodal._solve_fn) — they operate on the packed pools, not on
CSC, so they are engine methods rather than a standalone module.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix

__all__ = ["lsolve", "ltsolve", "usolve", "utsolve", "spsolve"]


def lsolve(L: CSCMatrix, b: np.ndarray) -> np.ndarray:
    """x = L \\ b, L lower triangular (diagonal first per column)."""
    from .. import native
    if native.available():
        return native.lsolve(L.indptr, L.indices, L.data, b)
    x = np.array(b, dtype=np.float64, copy=True)
    Lp, Li, Lx = L.indptr, L.indices, L.data
    for j in range(L.n):
        lo, hi = Lp[j], Lp[j + 1]
        x[j] /= Lx[lo]
        x[Li[lo + 1:hi]] -= Lx[lo + 1:hi] * x[j]
    return x


def ltsolve(L: CSCMatrix, b: np.ndarray) -> np.ndarray:
    """x = L' \\ b."""
    from .. import native
    if native.available():
        return native.ltsolve(L.indptr, L.indices, L.data, b)
    x = np.array(b, dtype=np.float64, copy=True)
    Lp, Li, Lx = L.indptr, L.indices, L.data
    for j in range(L.n - 1, -1, -1):
        lo, hi = Lp[j], Lp[j + 1]
        x[j] -= Lx[lo + 1:hi] @ x[Li[lo + 1:hi]]
        x[j] /= Lx[lo]
    return x


def usolve(U: CSCMatrix, b: np.ndarray):
    """x = U \\ b, U upper triangular (diagonal last per column).

    The RHS may be longer than n (QR's m2-padded workspace); only the
    first n entries participate, matching the reference.

    Returns None on a zero / non-finite / structurally-missing pivot
    (rank-deficient R from QR reaches this path directly — lu() already
    flags singularity itself); callers surface ok=False.
    """
    x = np.array(b, dtype=np.float64, copy=True)
    Up, Ui, Ux = U.indptr, U.indices, U.data
    for j in range(U.n - 1, -1, -1):
        lo, hi = Up[j], Up[j + 1]
        if hi <= lo or Ui[hi - 1] != j:
            return None                        # structurally singular
        piv = Ux[hi - 1]
        if piv == 0.0 or not np.isfinite(piv):
            return None
        x[j] /= piv
        x[Ui[lo:hi - 1]] -= Ux[lo:hi - 1] * x[j]
    return x


def utsolve(U: CSCMatrix, b: np.ndarray):
    """x = U' \\ b.  Returns None on a zero/non-finite pivot (see usolve)."""
    x = np.array(b, dtype=np.float64, copy=True)
    Up, Ui, Ux = U.indptr, U.indices, U.data
    for j in range(U.n):
        lo, hi = Up[j], Up[j + 1]
        if hi <= lo or Ui[hi - 1] != j:
            return None
        piv = Ux[hi - 1]
        if piv == 0.0 or not np.isfinite(piv):
            return None
        x[j] -= Ux[lo:hi - 1] @ x[Ui[lo:hi - 1]]
        x[j] /= piv
    return x


def spsolve(G: CSCMatrix, B: CSCMatrix, k: int, pinv=None, lo: bool = True):
    """Sparse-RHS sparse triangular solve: x = G \\ B(:,k) with the
    nonzero pattern found by reach().

    Reference: csparse::cs_spsolve / cs_spsolve.c.  Returns (xs, x):
    the pattern in topological order and the dense solution workspace
    (only x[xs] is meaningful).  ``pinv`` maps row index -> column of G
    for the partially-pivoted LU case (-1 = not yet pivotal).
    """
    from ..symbolic.reach import reach

    n = G.n
    Gp, Gi, Gx = G.indptr, G.indices, G.data
    Bp, Bi, Bx = B.indptr, B.indices, B.data
    xs = reach(G, B, k, pinv)
    x = np.zeros(n, dtype=np.float64)
    x[Bi[Bp[k]:Bp[k + 1]]] = Bx[Bp[k]:Bp[k + 1]]
    for j in xs:
        J = j if pinv is None else pinv[j]
        if J < 0:
            continue                           # column J of G is empty
        lo_p, hi_p = Gp[J], Gp[J + 1]
        x[j] /= Gx[lo_p if lo else hi_p - 1]   # divide by G(j,j)
        p0 = lo_p + 1 if lo else lo_p
        p1 = hi_p if lo else hi_p - 1
        x[Gi[p0:p1]] -= Gx[p0:p1] * x[j]
    return xs, x
