"""Property tests for the host f64 numeric engine (L3/L4) vs scipy/numpy
oracles (SURVEY.md §4: L*L'~PAP', P*L*U~A*Q, ||QR-AQ||, LU vs scipy.splu)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpusparse.core import CSCMatrix, csc_from_dense, permute, pinv, transpose
from tpusparse.numeric import (chol, cholsol, happly, house, lsolve, ltsolve,
                               lu, lusol, qr, qrsol, spsolve, updown, usolve,
                               utsolve)
from tpusparse.symbolic import schol, sqr, etree
from helpers import random_csc, random_spd, resid


# ------------------------------------------------------------- trisolve
def make_lower(rng, n, density=0.4):
    d = np.tril(rng.normal(size=(n, n)), -1) * (rng.random((n, n)) < density)
    np.fill_diagonal(d, rng.normal(size=n) + 4.0)
    # diagonal-first column storage
    A = csc_from_dense(d)
    return A, d


def test_lsolve_ltsolve(rng):
    L, d = make_lower(rng, 12)
    b = rng.normal(size=12)
    assert np.allclose(lsolve(L, b), np.linalg.solve(d, b))
    assert np.allclose(ltsolve(L, b), np.linalg.solve(d.T, b))


def test_usolve_utsolve(rng):
    n = 12
    d = np.triu(rng.normal(size=(n, n)), 1) * (rng.random((n, n)) < 0.4)
    np.fill_diagonal(d, rng.normal(size=n) + 4.0)
    U = csc_from_dense(d)
    b = rng.normal(size=n)
    assert np.allclose(usolve(U, b), np.linalg.solve(d, b))
    assert np.allclose(utsolve(U, b), np.linalg.solve(d.T, b))


def test_spsolve_sparse_rhs(rng):
    L, d = make_lower(rng, 14)
    bcol = np.zeros(14)
    bcol[[2, 7]] = rng.normal(size=2)
    B = csc_from_dense(bcol.reshape(-1, 1))
    xs, x = spsolve(L, B, 0, lo=True)
    oracle = np.linalg.solve(d, bcol)
    assert np.allclose(x[sorted(xs)], oracle[sorted(xs)])
    assert np.allclose(x, oracle)


# -------------------------------------------------------------- cholesky
@pytest.mark.parametrize("order", [0, 1])
def test_chol_llt_equals_papt(rng, order):
    for _ in range(3):
        A, S = random_spd(rng, 16, density=0.2)
        Sy = schol(order, A)
        N = chol(A, Sy)
        assert N is not None
        Ld = N.L.todense()
        d = S.toarray()
        if Sy.pinv is not None:
            p = pinv(Sy.pinv)          # pinv is the inverse permutation
            d = d[p][:, p]
        assert np.allclose(Ld @ Ld.T, d, atol=1e-10)
        # predicted nnz exact
        assert N.L.nnz == Sy.lnz


def test_chol_not_spd_returns_none(rng):
    d = np.eye(5)
    d[3, 3] = -2.0
    A = csc_from_dense(d)
    assert chol(A, schol(0, A)) is None


@pytest.mark.parametrize("order", [0, 1])
def test_cholsol(rng, order):
    A, S = random_spd(rng, 20, density=0.2)
    b = 1.0 + np.arange(20) / 20.0
    ok, x = cholsol(order, A, b)
    assert ok
    assert resid(S.toarray(), x, b) < 1e-13


def test_updown(rng):
    A, S = random_spd(rng, 12, density=0.3)
    Sy = schol(1, A)
    N = chol(A, Sy)
    # w built from an existing column pattern of L (demo3 recipe)
    Lc = N.L
    k = 5
    widx = Lc.indices[Lc.indptr[k]:Lc.indptr[k + 1]]
    wval = rng.normal(size=widx.size)
    wcol = np.zeros(12)
    wcol[widx] = wval
    W = csc_from_dense(wcol.reshape(-1, 1))
    d = S.toarray()
    p = pinv(Sy.pinv)
    dp = d[p][:, p]
    # update
    assert updown(N.L, +1, W, Sy.parent)
    Ld = N.L.todense()
    assert np.allclose(Ld @ Ld.T, dp + np.outer(wcol, wcol), atol=1e-10)
    # downdate back
    assert updown(N.L, -1, W, Sy.parent)
    Ld = N.L.todense()
    assert np.allclose(Ld @ Ld.T, dp, atol=1e-9)


def test_updown_failure():
    # downdating with a vector too large must fail, not crash
    d = np.eye(3)
    A = csc_from_dense(d)
    Sy = schol(0, A)
    N = chol(A, Sy)
    w = np.array([2.0, 0, 0])
    W = csc_from_dense(w.reshape(-1, 1))
    assert not updown(N.L, -1, W, Sy.parent)


# -------------------------------------------------------------------- lu
@pytest.mark.parametrize("order", [0, 2, 3])
def test_lu_plu_equals_aq(rng, order):
    for _ in range(3):
        n = 15
        A, S = random_csc(rng, n, n, density=0.3)
        S2 = (S + 3 * sp.eye(n)).tocsc()
        A2 = CSCMatrix.fromscipy(S2)
        Sy = sqr(order, A2, qr=False)
        N = lu(A2, Sy, tol=1.0)
        assert N is not None
        Ld, Ud = N.L.todense(), N.U.todense()
        d = S2.toarray()
        q = Sy.q if Sy.q is not None else np.arange(n)
        # P A Q = L U  with row perm pinv (row i -> pinv[i])
        PA = d[np.argsort(N.pinv)][:, q]        # rows in pivotal order
        assert np.allclose(Ld @ Ud, PA, atol=1e-10)


def test_lu_vs_scipy_solution(rng):
    n = 25
    A, S = random_csc(rng, n, n, density=0.25)
    S2 = (S + 4 * sp.eye(n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    b = 1.0 + np.arange(n) / n
    ok, x = lusol(2, A2, b)
    assert ok
    oracle = spla.splu(S2.tocsc()).solve(b)
    assert np.allclose(x, oracle, atol=1e-9)
    assert resid(S2.toarray(), x, b) < 1e-13


def test_lu_singular_returns_none(rng):
    d = rng.normal(size=(6, 6))
    d[:, 2] = 0.0
    A = csc_from_dense(d)
    Sy = sqr(0, A, qr=False)
    assert lu(A, Sy, 1.0) is None


def test_lu_pivoting_ill_conditioned(rng):
    # tiny diagonal forces off-diagonal pivoting (west0479-class behavior)
    n = 10
    d = rng.normal(size=(n, n))
    d[0, 0] = 1e-14
    A = csc_from_dense(d)
    b = rng.normal(size=n)
    ok, x = lusol(0, A, b, tol=1.0)
    assert ok
    assert resid(d, x, b) < 1e-12


# -------------------------------------------------------------------- qr
def test_house():
    for x in ([3.0, 4.0], [-3.0, 4.0], [2.0, 0.0], [-2.0, 0.0], [0.0, 0.0]):
        x = np.array(x)
        v, beta, s = house(x)
        H = np.eye(2) - beta * np.outer(v, v)
        hx = H @ x
        assert np.isclose(abs(hx[0]), np.linalg.norm(x))
        assert np.isclose(hx[1], 0.0, atol=1e-12)
        assert np.isclose(abs(s), np.linalg.norm(x))


@pytest.mark.parametrize("order", [0, 3])
def test_qr_reconstructs_aq(rng, order):
    m, n = 18, 11
    A, S = random_csc(rng, m, n, density=0.3)
    # ensure structural full rank by adding a diagonal
    S2 = (S + sp.eye(m, n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    Sy = sqr(order, A2, qr=True)
    N = qr(A2, Sy)
    m2 = Sy.m2
    V, R = N.L.todense(), N.U.todense()
    # rebuild Q from the Householder vectors and check QR = PAQ
    Q = np.eye(m2)
    for k in range(n):
        v = V[:, k]
        Q = Q @ (np.eye(m2) - N.B[k] * np.outer(v, v))
    d = np.zeros((m2, n))
    q = Sy.q if Sy.q is not None else np.arange(n)
    dA = S2.toarray()[:, q]
    d[Sy.pinv[:m], :] = dA                       # rows permuted into V order
    assert np.allclose(Q @ R, d, atol=1e-10)


def test_qrsol_least_squares(rng):
    m, n = 20, 12
    A, S = random_csc(rng, m, n, density=0.35)
    S2 = (S + sp.eye(m, n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    b = rng.normal(size=m)
    ok, x = qrsol(3, A2, b)
    assert ok
    oracle, *_ = np.linalg.lstsq(S2.toarray(), b, rcond=None)
    assert np.allclose(x, oracle, atol=1e-8)


def test_qrsol_min_norm(rng):
    m, n = 9, 16
    A, S = random_csc(rng, m, n, density=0.4)
    S2 = (S + sp.eye(m, n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    b = rng.normal(size=m)
    ok, x = qrsol(3, A2, b)
    assert ok
    # must satisfy A x = b and be the minimum-norm solution
    assert np.allclose(S2.toarray() @ x, b, atol=1e-8)
    oracle = np.linalg.pinv(S2.toarray()) @ b
    assert np.allclose(x, oracle, atol=1e-8)


def test_qrsol_square(rng):
    n = 14
    A, S = random_csc(rng, n, n, density=0.3)
    S2 = (S + 3 * sp.eye(n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    b = rng.normal(size=n)
    ok, x = qrsol(0, A2, b)
    assert ok
    assert resid(S2.toarray(), x, b) < 1e-12
