"""Numerical (bottleneck) transversal: a row permutation that places
LARGE entries on the diagonal before factorization.

This is the TPU-first static-pivoting companion (MC64-style, the
preprocessing SuperLU_DIST pairs with its no-exchange factorization):
the reference's cs_maxtrans finds any structural transversal
(cs_maxtrans.c); here the same augmenting-path machinery runs on the
THRESHOLDED pattern |a_ij| >= alpha * max|A(:,j)| and a bisection over
alpha finds (approximately) the largest threshold that still admits a
perfect matching — a bottleneck assignment.  Rows are then permuted so
every matched (large) entry sits on the diagonal, after which
within-panel pivoting + eps perturbation + f64 refinement handle the
rest (device.superscan_lu).

Pure host planning, O(levels * maxtrans); no scipy dependency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core.matrix import CSCMatrix

__all__ = ["bottleneck_transversal", "diag_dominance"]

_IDX = np.int64


def diag_dominance(A: CSCMatrix) -> float:
    """min over columns of |a_jj| / max|A(:,j)| (0 when a diagonal
    entry is missing or the column is empty) — the cheap 'does this
    need a numerical transversal?' probe."""
    n = min(A.m, A.n)
    if n == 0:
        return 1.0
    Ap, Ai, Ax = A.indptr, A.indices, np.abs(A.data)
    worst = 1.0
    for j in range(n):
        lo, hi = Ap[j], Ap[j + 1]
        if hi == lo:
            return 0.0
        seg = Ax[lo:hi]
        cmax = seg.max()
        hit = np.where(Ai[lo:hi] == j)[0]
        d = float(seg[hit[0]]) if hit.size else 0.0
        worst = min(worst, d / cmax if cmax > 0 else 0.0)
        if worst == 0.0:
            return 0.0
    return worst


def _thresh_pattern(A: CSCMatrix, cols_of: np.ndarray, rel: np.ndarray,
                    alpha: float) -> CSCMatrix:
    keep = rel >= alpha
    cnt = np.bincount(cols_of[keep], minlength=A.n)
    indptr = np.zeros(A.n + 1, _IDX)
    np.cumsum(cnt, out=indptr[1:])
    return CSCMatrix(A.m, A.n, indptr, A.indices[keep], None)


def bottleneck_transversal(A: CSCMatrix, levels: int = 12,
                           seed: int = 0
                           ) -> Optional[Tuple[np.ndarray, float]]:
    """Row permutation p (length m) with A[p, :] having large diagonal
    entries: p[j] = the row matched to column j at the (approximately)
    largest feasible threshold.  Returns (p, alpha) or None when even
    the full pattern has no perfect matching (structurally singular —
    callers fall back to the reference's error contract)."""
    from .dmperm import maxtrans
    if A.m != A.n:
        raise ValueError("square matrix required")
    n = A.n
    if n == 0:
        return np.zeros(0, _IDX), 1.0
    Ax = np.abs(A.data)
    cmax = np.zeros(n)
    dif = np.diff(A.indptr)
    if A.nnz:
        cmax[dif > 0] = np.maximum.reduceat(Ax, A.indptr[:-1][dif > 0])
    cols_of = np.repeat(np.arange(n), dif)
    rel = np.where(cmax[cols_of] > 0, Ax / np.maximum(cmax[cols_of],
                                                      1e-300), 0.0)

    def match(alpha):
        _, im = maxtrans(_thresh_pattern(A, cols_of, rel, alpha),
                         seed=seed)
        return im

    im0 = match(0.0)
    sprank = int((im0 >= 0).sum())
    if sprank < n:
        return None                      # structurally singular
    # target = the matching size achievable using only 'large' entries
    # (rel >= floor): near-singular matrices may force a few tiny
    # entries into every transversal — those columns are completed
    # below rather than dragging the threshold to zero for everyone
    floor = 1e-3
    best = match(floor)
    target = int((best >= 0).sum())
    best_alpha = floor
    # bisect in [floor, 1] for the largest alpha keeping that size
    lo, hi = floor, 1.0
    for _ in range(levels):
        mid = (lo + hi) / 2.0
        im = match(mid)
        if int((im >= 0).sum()) == target:
            best, best_alpha, lo = im, mid, mid
        else:
            hi = mid
    if (best < 0).any():
        # complete the unmatched columns over the FULL pattern, warm-
        # started from the large-entry matching: augmenting paths keep
        # existing (large) pairs and reroute only where necessary
        _, best = maxtrans(A, seed=seed, imatch0=best)
        if (best < 0).any():               # pragma: no cover
            best = im0
    return np.asarray(best, _IDX), best_alpha
