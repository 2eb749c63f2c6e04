"""Device one-call drivers: cholsol / lusol / qrsol with the same
(ok, x) contract as the host engine (tpusparse.numeric.solvers), so
demo2 and the api layer can swap engines (SURVEY.md §3.5).

Each driver: host symbolic planning -> f32 device factorization ->
device solves -> host f64 iterative refinement to the reference's
residual grade.  Failures are silent-but-flagged, never exceptions —
but engine *degradation* (a planner crash falling back to a simpler
engine) is always logged so real defects stay observable (ADVICE r1).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import transpose
from .chol_tpu import TpuCholesky
from .lu_tpu import TpuLU
from .qr_tpu import TpuQR
from .refine import refine

__all__ = ["cholsol", "lusol", "qrsol"]

log = logging.getLogger("tpusparse.device")


def _log_fallback(engine: str, exc: Exception, to: str) -> None:
    """An engine crashed during planning/compile.  This is a DEFECT in
    that engine (legitimate numeric failures use the ok=False contract,
    not exceptions), so it is logged loudly before degrading."""
    log.warning("%s engine failed (%s: %s) — falling back to %s",
                engine, type(exc).__name__, exc, to)
    log.debug("engine traceback", exc_info=exc)


def cholsol(order: int, A: CSCMatrix, b: np.ndarray, engine: str = None):
    """SPD solve on device (reference: cs_cholsol).

    Default engine is the variable-panel supernodal factorization (the
    fastest on hardware — BASELINE.md round-1 table); pass
    ``engine="tiled"`` (or set TPUSPARSE_CHOL_ENGINE=tiled) for the
    fixed-tile engine.  A supernodal planner crash logs a warning and
    falls back to the tiled engine before failing.
    """
    if A.m != A.n or A.m != len(b):
        return False, None
    if engine is None:
        engine = os.environ.get("TPUSPARSE_CHOL_ENGINE", "auto")
    if engine == "auto":
        # the level-unrolled supernodal engine compiles one program per
        # level x update-group (fine at demo scale, prohibitive at
        # scale); superscan's program size is segment-bound
        engine = "superscan" if A.n >= 16384 else "supernodal"
    F = None
    if engine == "superscan":
        try:
            from .superscan import SuperscanCholesky
            F = SuperscanCholesky(A, order=order if order else 1)
        except (ValueError, IndexError, KeyError, TypeError,
                MemoryError, RuntimeError) as exc:
            _log_fallback("superscan", exc, "supernodal")
            F = None
    if F is None and engine != "tiled":
        try:
            from .supernodal import SupernodalCholesky
            F = SupernodalCholesky(A, order=order if order else 1)
        except (ValueError, IndexError, KeyError, TypeError,
                MemoryError, RuntimeError) as exc:
            _log_fallback("supernodal", exc, "tiled")
            F = None
    if F is None:
        try:
            F = TpuCholesky(A, order=order)
        except (ValueError, IndexError, KeyError, TypeError,
                MemoryError, RuntimeError) as exc:
            _log_fallback("tiled", exc, "ok=False")
            return False, None
    if not F.factor():
        return False, None
    return True, F.solve(np.asarray(b, np.float64))


def lusol(order: int, A: CSCMatrix, b: np.ndarray, tol: float = 1.0):
    """Square solve on device via BTF + blocked LU (reference: cs_lusol).
    ``tol`` follows the reference's threshold-pivoting semantics on the
    sparse superscan blocks (within-panel, superscan_lu); dense blocks
    always use full in-block partial pivoting (stronger)."""
    if A.m != A.n or A.m != len(b):
        return False, None
    try:
        F = TpuLU(A, order=order, tol=tol)
    except (ValueError, IndexError, KeyError, TypeError,
            MemoryError, RuntimeError) as exc:
        _log_fallback("lu", exc, "ok=False")
        return False, None
    if not F.factor():
        return False, None
    try:
        return True, F.solve(np.asarray(b, np.float64))
    except (ValueError, FloatingPointError):
        # sparse static-pivot path: numerical singularity surfaces as
        # diverged refinement, not a factor failure
        return False, None


def _sparse_qr_solve(order: int, Atall: CSCMatrix, b: np.ndarray,
                     minnorm: bool):
    """Sparse tall-matrix QR solve: multifrontal Householder engine by
    default (true Q semantics, device-resident V/R pools —
    device.mfqr), Q-less CSNE (SparseQR) above TPUSPARSE_QR_MF_MAX
    columns or via TPUSPARSE_QR_ENGINE=csne.  Returns (ok, x)."""
    from .qr_tpu import SparseQR
    engine = os.environ.get("TPUSPARSE_QR_ENGINE", "auto")
    # No column ceiling (VERDICT r4 item 2): the grouped dispatch keeps
    # the compiled-program count flat in n (96 programs at any scale;
    # hardware-validated at m=263,538 x n=131,769: 96 programs,
    # prewarm 60 s, normal-eq resid 6.3e-17, min-norm 6.2e-17 — see
    # artifacts/bench_tpu_mfqr_131769), so the true-Householder-Q
    # engine is the default at every size.  TPUSPARSE_QR_MF_MAX
    # reinstates a ceiling; TPUSPARSE_QR_ENGINE=csne selects the Q-less
    # CSNE variant explicitly.
    mf_max = int(os.environ.get("TPUSPARSE_QR_MF_MAX", "0")) or None
    use_mf = engine == "mfqr" or (
        engine == "auto" and (mf_max is None or Atall.n <= mf_max))
    if use_mf:
        try:
            from .mfqr import MultifrontalQR
            F = MultifrontalQR(Atall, order=order)
            if not F.factor():
                return False, None
            x = F.solve_minnorm(b) if minnorm else F.solve_ls(b)
            return True, x
        except (ValueError, IndexError, KeyError, TypeError,
                MemoryError, RuntimeError) as exc:
            if isinstance(exc, ValueError) and "rank deficient" in str(exc):
                return False, None
            _log_fallback("mfqr", exc, "csne")
    F = SparseQR(Atall, order=order)
    if not F.rank_ok:
        return False, None
    cond_max = float(os.environ.get("TPUSPARSE_QR_COND_MAX", "1e6"))
    if F.cond_estimate() > cond_max:
        # Q-less CSNE at f32 is unsafe at this conditioning (augmented
        # refinement stalls beyond ~1/eps_f32): the caller routes
        # ok=None to the host sparse Householder engine (exact cs_qr
        # semantics, numeric.solvers.qrsol)
        log.warning("SparseQR cond estimate > %g — using the host "
                    "Householder engine", cond_max)
        return None, None                          # caller routes to host
    return True, (F.solve_minnorm(b) if minnorm else F.solve_ls(b))


def qrsol(order: int, A: CSCMatrix, b: np.ndarray):
    """Least-squares / min-norm solve on device (reference: cs_qrsol).

    Problems whose padded dense size exceeds TPUSPARSE_QR_DENSE_MAX
    elements (default 2^22) use the sparse path: the multifrontal
    Householder engine (device.mfqr — exact Q, VERDICT r2 item 5a) by
    default, the Q-less CSNE engine beyond TPUSPARSE_QR_MF_MAX columns
    (cond-gated, host-fallback).  No m x n densification at scale."""
    m, n = A.m, A.n
    b = np.asarray(b, np.float64)
    if len(b) != m:
        return False, None
    dense_max = int(os.environ.get("TPUSPARSE_QR_DENSE_MAX",
                                   str(1 << 22)))
    sparse = m * n > dense_max
    try:
        if m >= n:
            if sparse:
                ok, x = _sparse_qr_solve(order, A, b, minnorm=False)
                if ok is None:
                    from ..numeric.solvers import qrsol as host_qrsol
                    return host_qrsol(order, A, b.copy())
                return ok, x
            F = TpuQR(A, order=order)
            if not F.rank_ok:
                return False, None
            x = refine(A, F.solve_ls_f32, b, iters=2)
            return True, x
        else:
            AT = transpose(A, values=True)
            if sparse:
                ok, x = _sparse_qr_solve(order, AT, b, minnorm=True)
                if ok is None:
                    from ..numeric.solvers import qrsol as host_qrsol
                    return host_qrsol(order, A, b.copy())
                return ok, x
            F = TpuQR(AT, order=order)
            if not F.rank_ok:
                return False, None

            def solve_f32(rhs):
                return F.solve_minnorm_f32(rhs)

            x = refine(A, solve_f32, b, iters=2)
            return True, x
    except (ValueError, IndexError, KeyError, TypeError,
            MemoryError, RuntimeError) as exc:
        _log_fallback("qr", exc, "ok=False")
        return False, None
