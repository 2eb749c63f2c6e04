"""Demo/regression harness helpers.

Reference (SURVEY.md §2.3): the cs_demo.py helpers of the reference —
get_problem (load -> compress -> dropzeros -> symmetrize), rhs
(b[i] = 1 + i/m), print_resid (THE acceptance metric), print_order,
tic/toc — plus the demo2/demo3 flows driven by demo/cs_demo2.py and
demo/cs_demo3.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .core import CSCMatrix, add, dropzeros, droptol, fkeep, gaxpy, load, norm1, transpose
from .core import csc_from_dense
from .numeric import chol, cholsol, updown
from .symbolic import dmperm, schol

__all__ = ["Problem", "get_problem", "rhs", "print_resid", "print_order",
           "tic", "toc", "demo2", "demo3", "is_sym", "make_sym"]


@dataclass
class Problem:
    A: CSCMatrix
    C: CSCMatrix            # symmetrized (A + A') if A is stored triangular
    sym: int                # -1 lower stored, 1 upper stored, 0 unsymmetric
    b: np.ndarray = None


def is_sym(A: CSCMatrix) -> int:
    """-1 if only the lower triangle is stored, 1 if only upper, else 0
    (reference: static is_sym in cs_demo)."""
    if A.m != A.n:
        return 0
    cols = np.repeat(np.arange(A.n), np.diff(A.indptr))
    if np.all(A.indices >= cols):
        return -1
    if np.all(A.indices <= cols):
        return 1
    return 0


def make_sym(A: CSCMatrix) -> CSCMatrix:
    """C = A + A' with the diagonal not doubled (reference: make_sym)."""
    AT = transpose(A)
    AT_nodiag = fkeep(AT, lambda i, j, x: i != j)
    return add(A, AT_nodiag, 1.0, 1.0)


def get_problem(fh, tol: float = 0.0) -> Problem:
    """Load a triplet file -> CSC (duplicates summed) -> droptol ->
    symmetrize if stored-triangular (reference: cs_demo::get_problem)."""
    T = load(fh)
    A = T.tocsc()
    A = droptol(A, tol) if tol > 0 else dropzeros(A)
    sym = is_sym(A)
    C = make_sym(A) if sym else A
    return Problem(A=A, C=C, sym=sym)


def rhs(m: int) -> np.ndarray:
    """Synthetic right-hand side b[i] = 1 + i/m (reference: cs_demo::rhs)."""
    return 1.0 + np.arange(m, dtype=np.float64) / m


def resid_metric(A: CSCMatrix, x: np.ndarray, b: np.ndarray) -> float:
    """||Ax-b||_inf / (||A||_1 * ||x||_inf + ||b||_inf) — the reference's
    acceptance metric (reference: cs_demo::print_resid; SURVEY.md §4)."""
    r = gaxpy(A, x[:A.n], -b[:A.m])
    denom = norm1(A) * np.abs(x[:A.n]).max() + np.abs(b[:A.m]).max()
    return float(np.abs(r).max() / denom) if denom else float(np.abs(r).max())


def print_resid(ok: bool, A: CSCMatrix, x, b, prefix="") -> Optional[float]:
    if not ok:
        print(f"{prefix}    (failed)")
        return None
    r = resid_metric(A, x, b)
    print(f"{prefix}resid: {r:8.2e}")
    return r


def _demo3_tpu(prob: Problem) -> list:
    """demo3 on the device engine."""
    import numpy as _np

    from .device.chol_tpu import TpuCholesky

    C = prob.C
    n = C.n
    results = []
    b = rhs(n)
    F = TpuCholesky(C, order=1)
    assert F.factor(), "matrix not positive definite"
    x = F.solve(b)
    r0 = resid_metric(C, x, b)
    print(f"original (tpu):           resid: {r0:8.2e}")
    results.append(r0)
    rng = _np.random.default_rng(1)
    L, _ = F._extract_L()
    k = n // 2
    seg = L.indices[L.indptr[k]:L.indptr[k + 1]]
    wperm = _np.zeros(n)
    wperm[seg] = rng.random(seg.size)
    w = _np.zeros(n)
    if F.plan.perm is not None:
        w[F.plan.perm] = wperm
    else:
        w = wperm
    d0 = C
    tic()
    assert F.updown(+1, w)
    t1 = toc()
    x = F.solve(b)
    r1 = resid_metric(F.A, x, b)
    print(f"update (tpu):   time: {t1:8.2f} resid: {r1:8.2e}")
    results.append(r1)
    tic()
    F2 = TpuCholesky(F.A, order=1)
    ok = F2.factor()
    t2 = toc()
    x2 = F2.solve(b)
    r2 = resid_metric(F.A, x2, b)
    print(f"rechol (tpu):   time: {t2:8.2f} resid: {r2:8.2e}")
    results.append(r2)
    tic()
    assert F.updown(-1, w)
    t3 = toc()
    x = F.solve(b)
    r3 = resid_metric(C, x, b)
    print(f"downdate (tpu): time: {t3:8.2f} resid: {r3:8.2e}")
    results.append(r3)
    return results


_TIC = [0.0]


def tic() -> None:
    _TIC[0] = time.perf_counter()


def toc() -> float:
    return time.perf_counter() - _TIC[0]


def print_order(order: int) -> str:
    names = {0: "natural    ", 1: "amd(A+A')  ", 2: "amd(S'*S)  ",
             3: "amd(A'*A)  "}
    return names.get(order, "?")


def demo2(prob: Problem, engine=None) -> bool:
    """The reference's demo2 regression flow (SURVEY.md §2.3/§3.5):
    dmperm stats, QR solves (orders 0,3), LU solves (orders 0..3) if
    square with full sprank, Cholesky (orders 0,1) if symmetric.

    ``engine`` selects the solver implementations: None = host f64;
    pass tpusparse.device.solvers for the TPU engine.
    """
    if engine is None:
        from .numeric import solvers as engine_mod
    else:
        engine_mod = engine
    A, C, sym = prob.A, prob.C, prob.sym
    m, n = A.m, A.n
    results = []
    D = dmperm(C, seed=1)
    nb, r, s, rr = D.nb, D.r, D.s, D.rr
    sprank = int(rr[3])
    nblocks_gt1 = int(np.sum((np.diff(r) > 1) & (np.diff(s) > 1)))
    print(f"blocks: {nb} singletons: {nb - nblocks_gt1} "
          f"structural rank: {sprank}")
    for order in (0, 3):                         # QR solves
        if order == 0 and m > 1000:
            continue
        b = rhs(m)
        tic()
        ok, x = engine_mod.qrsol(order, C, b)
        t = toc()
        print(f"QR   order {order} {print_order(order)} "
              f"time: {t:8.2f} ", end="")
        rres = print_resid(ok, C, x if ok else None, rhs(m))
        results.append(("qr", order, ok, rres))
    if m != n or sprank < n:
        return results
    for order in range(4):                       # LU solves
        if order == 0 and m > 1000:
            continue
        b = rhs(m)
        tol = 0.001 if sym else 1.0
        tic()
        ok, x = engine_mod.lusol(order, C, b, tol)
        t = toc()
        print(f"LU   order {order} {print_order(order)} "
              f"time: {t:8.2f} ", end="")
        rres = print_resid(ok, C, x if ok else None, rhs(m))
        results.append(("lu", order, ok, rres))
    if sym:
        for order in (0, 1):                     # Cholesky solves
            if order == 0 and m > 1000:
                continue
            b = rhs(m)
            tic()
            ok, x = engine_mod.cholsol(order, C, b)
            t = toc()
            print(f"Chol order {order} {print_order(order)} "
                  f"time: {t:8.2f} ", end="")
            rres = print_resid(ok, C, x if ok else None, rhs(m))
            results.append(("chol", order, ok, rres))
    return results


def demo3(prob: Problem, engine: str = "host") -> list:
    """The reference's demo3: Cholesky factor update/downdate
    (SURVEY.md §2.3).  Solve, rank-1 update with a w drawn from an
    existing column pattern of L, re-solve, compare against a fresh
    factorization of A + w*w', then downdate back.

    engine='tpu' runs the same flow on the device factor
    (TpuCholesky.factor/solve/updown)."""
    A, C, sym = prob.A, prob.C, prob.sym
    n = A.n
    if A.m != n or not sym:
        print("demo3 requires a symmetric problem")
        return []
    if engine == "tpu":
        return _demo3_tpu(prob)
    results = []
    b = rhs(n)
    S = schol(1, C)
    N = chol(C, S)
    assert N is not None, "matrix not positive definite"
    from .numeric import lsolve, ltsolve
    from .core import ipvec, pvec
    x = ipvec(S.pinv, b)
    x = lsolve(N.L, x)
    x = ltsolve(N.L, x)
    x = pvec(S.pinv, x)
    r0 = resid_metric(C, x, b)
    print(f"original:                 resid: {r0:8.2e}")
    results.append(r0)
    # build w with the pattern of a column of L (guarantees no new fill)
    rng = np.random.default_rng(1)
    k = n // 2
    Lp, Li = N.L.indptr, N.L.indices
    widx = Li[Lp[k]:Lp[k + 1]]
    wperm = np.zeros(n)
    wperm[widx] = rng.random(widx.size)
    W = csc_from_dense(wperm.reshape(-1, 1))
    tic()
    ok_up = updown(N.L, +1, W, S.parent)
    t1 = toc()
    assert ok_up
    # w in ORIGINAL ordering: wperm is in permuted coordinates, so
    # w_orig[i] = wperm[pinv[i]]
    worig = np.zeros(n)
    worig[np.argsort(S.pinv)] = wperm            # w = P' wperm
    Cup = add(C, csc_from_dense(np.outer(worig, worig)), 1.0, 1.0)
    x = ipvec(S.pinv, b)
    x = lsolve(N.L, x)
    x = ltsolve(N.L, x)
    x = pvec(S.pinv, x)
    r1 = resid_metric(Cup, x, b)
    print(f"update:   time: {t1:8.2f} resid: {r1:8.2e}")
    results.append(r1)
    # compare with a fresh factorization of the updated matrix
    tic()
    ok, x2 = cholsol(1, Cup, b)
    t2 = toc()
    r2 = resid_metric(Cup, x2, b)
    print(f"rechol:   time: {t2:8.2f} resid: {r2:8.2e}")
    results.append(r2)
    # downdate back to the original matrix
    tic()
    ok_down = updown(N.L, -1, W, S.parent)
    t3 = toc()
    assert ok_down
    x = ipvec(S.pinv, b)
    x = lsolve(N.L, x)
    x = ltsolve(N.L, x)
    x = pvec(S.pinv, x)
    r3 = resid_metric(C, x, b)
    print(f"downdate: time: {t3:8.2f} resid: {r3:8.2e}")
    results.append(r3)
    return results
