"""Device one-call drivers: cholsol / lusol / qrsol with the same
(ok, x) contract as the host engine (tpusparse.numeric.solvers), so
demo2 and the api layer can swap engines (SURVEY.md §3.5).

Each driver: host symbolic planning -> f32 device factorization ->
device solves -> host f64 iterative refinement to the reference's
residual grade.  Failures are silent-but-flagged, never exceptions.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import transpose
from .chol_tpu import TpuCholesky
from .lu_tpu import TpuLU
from .qr_tpu import TpuQR
from .refine import refine

__all__ = ["cholsol", "lusol", "qrsol"]


def cholsol(order: int, A: CSCMatrix, b: np.ndarray):
    """SPD solve on device (reference: cs_cholsol).

    Default engine is the variable-panel supernodal factorization (the
    fastest on hardware — BASELINE.md round-1 table); set
    TPUSPARSE_CHOL_ENGINE=tiled for the fixed-tile engine.  Planning
    errors fall back to the tiled engine before failing.
    """
    import os
    if A.m != A.n or A.m != len(b):
        return False, None
    engine = os.environ.get("TPUSPARSE_CHOL_ENGINE", "supernodal")
    F = None
    if engine != "tiled":
        try:
            from .supernodal import SupernodalCholesky
            F = SupernodalCholesky(A, order=order if order else 1)
        except Exception:
            F = None
    if F is None:
        try:
            F = TpuCholesky(A, order=order)
        except Exception:
            return False, None
    if not F.factor():
        return False, None
    return True, F.solve(np.asarray(b, np.float64))


def lusol(order: int, A: CSCMatrix, b: np.ndarray, tol: float = 1.0):
    """Square solve on device via BTF + blocked LU (reference: cs_lusol).
    ``tol`` is accepted for signature parity; in-block pivoting is always
    full partial pivoting (stronger than the reference's threshold)."""
    if A.m != A.n or A.m != len(b):
        return False, None
    try:
        F = TpuLU(A, order=order)
    except Exception:
        return False, None
    if not F.factor():
        return False, None
    return True, F.solve(np.asarray(b, np.float64))


def qrsol(order: int, A: CSCMatrix, b: np.ndarray):
    """Least-squares / min-norm solve on device (reference: cs_qrsol)."""
    m, n = A.m, A.n
    b = np.asarray(b, np.float64)
    if len(b) != m:
        return False, None
    try:
        if m >= n:
            F = TpuQR(A, order=order)
            if not F.rank_ok:
                return False, None
            x = refine(A, F.solve_ls_f32, b, iters=2)
            return True, x
        else:
            AT = transpose(A, values=True)
            F = TpuQR(AT, order=order)
            if not F.rank_ok:
                return False, None

            def solve_f32(rhs):
                return F.solve_minnorm_f32(rhs)

            x = refine(A, solve_f32, b, iters=2)
            return True, x
    except Exception:
        return False, None
