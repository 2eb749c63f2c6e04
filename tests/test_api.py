"""Exercise EVERY cs_* parity symbol through tpusparse.api — the surface
a reference user actually touches.  (A module/function shadowing bug
that only this layer could catch motivated this file.)"""

import io

import numpy as np
import pytest
import scipy.sparse as sp

import tpusparse.api as api
from tpusparse.core import CSCMatrix, csc_from_dense
from helpers import random_csc, random_spd, resid


@pytest.fixture
def spd(rng):
    A, S = random_spd(rng, 16, density=0.3)
    return A, S


def test_every_symbol_exists():
    for name in api.__all__:
        assert callable(getattr(api, name)), name


def test_l0_l1_flow(rng):
    T = api.cs_spalloc(0, 0, triplet=True)
    api.cs_entry(T, 0, 0, 2.0)
    api.cs_entry(T, 1, 1, 3.0)
    api.cs_entry(T, 1, 0, 1.0)
    A = api.cs_compress(T)
    A = api.cs_dupl(A)
    A = api.cs_dropzeros(A)
    AT = api.cs_transpose(A)
    C = api.cs_multiply(A, AT)
    D = api.cs_add(C, C, 1.0, 1.0)
    assert np.allclose(D.todense(), 2 * (A.todense() @ A.todense().T))
    assert api.cs_norm(A) == 3.0
    y = np.zeros(2)
    api.cs_gaxpy(A, np.ones(2), y)
    assert np.allclose(y, A.todense() @ np.ones(2))
    p, total = api.cs_cumsum(np.array([1, 2, 3]))
    assert total == 6
    A2 = api.cs_droptol(A, 1.5)
    assert A2.nnz == 2
    A3 = api.cs_fkeep(A, lambda i, j, x, other: i == j)
    assert A3.nnz == 2
    w = np.zeros(2, dtype=np.int64) - 1
    x = np.zeros(2)
    nz = api.cs_scatter(A, 0, 2.0, w, x, 0)
    assert nz == 2 and x[1] == 2.0


def test_l1_perms(rng):
    A, S = random_csc(rng, 6, 6, density=0.5)
    p = np.array([2, 0, 1, 5, 4, 3])
    pinv = api.cs_pinv(p)
    C = api.cs_permute(A, pinv, p)
    assert np.allclose(C.todense(), S.toarray()[p][:, p])
    b = rng.normal(size=6)
    assert np.allclose(api.cs_pvec(p, b), b[p])
    assert np.allclose(api.cs_ipvec(p, api.cs_pvec(p, b)), b)
    d = rng.normal(size=(5, 5))
    U = csc_from_dense(np.triu(d + d.T))
    Cs = api.cs_symperm(U, api.cs_pinv(np.array([1, 0, 3, 2, 4])))
    assert Cs.n == 5
    assert api.cs_randperm(4, 0) is None
    assert len(api.cs_randperm(4, 7)) == 4


def test_io(capsys, rng):
    T = api.cs_load("0 0 1.5\n1 1 2.5\n")
    assert T.tocsc().todense()[1, 1] == 2.5
    api.cs_print(T.tocsc())
    assert "2-by-2" in capsys.readouterr().out


def test_l2_symbols(spd, rng):
    A, S = spd
    parent = api.cs_etree(A)
    porder = api.cs_post(parent)
    c = api.cs_counts(A, parent, porder)
    assert c.sum() >= A.n
    from tpusparse.core import fkeep
    U = fkeep(A, lambda i, j, x: i <= j)
    pat = api.cs_ereach(U, A.n - 1, parent)
    assert len(pat) >= 0
    assert api.cs_amd(1, A) is not None
    jm, im = api.cs_maxtrans(A)
    assert np.count_nonzero(jm >= 0) == A.n
    D = api.cs_scc(A)
    assert D.nb >= 1
    D2 = api.cs_dmperm(A, 1)
    assert int(D2.rr[3]) == A.n
    G = fkeep(A, lambda i, j, x: i >= j)
    B = csc_from_dense(np.eye(A.n)[:, :1])
    xs = api.cs_reach(G, B, 0)
    assert 0 in xs.tolist()
    marked = np.zeros(A.n, dtype=bool)
    out = api.cs_dfs(0, G, marked, [])
    assert 0 in out


def test_l3_l4_chol(spd):
    A, S = spd
    Sy = api.cs_schol(1, A)
    N = api.cs_chol(A, Sy)
    assert N is not None
    b = np.ones(A.n)
    x = api.cs_ipvec(Sy.pinv, b)
    api.cs_lsolve(N.L, x)
    api.cs_ltsolve(N.L, x)
    x = api.cs_pvec(Sy.pinv, x)
    assert resid(S.toarray(), x, b) < 1e-13
    # driver overwrites b
    b2 = np.ones(A.n)
    assert api.cs_cholsol(1, A, b2)
    assert np.allclose(b2, x, atol=1e-12)
    # updown on a column pattern of L
    k = A.n // 2
    widx = N.L.indices[N.L.indptr[k]:N.L.indptr[k + 1]]
    w = np.zeros(A.n)
    w[widx] = 0.5
    W = csc_from_dense(w.reshape(-1, 1))
    assert api.cs_updown(N.L, +1, W, Sy.parent)
    assert api.cs_updown(N.L, -1, W, Sy.parent)


def test_l3_l4_lu_qr(rng):
    n = 14
    A, S = random_csc(rng, n, n, density=0.3)
    S2 = (S + 3 * sp.eye(n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    Sy = api.cs_sqr(2, A2, qr=False)
    N = api.cs_lu(A2, Sy, 1.0)
    assert N is not None
    b = np.ones(n)
    x = api.cs_ipvec(N.pinv, b)
    api.cs_lsolve(N.L, x)
    api.cs_usolve(N.U, x)
    x = api.cs_ipvec(Sy.q, x)
    assert resid(S2.toarray(), x, b) < 1e-12
    b2 = np.ones(n)
    assert api.cs_lusol(2, A2, b2)
    assert np.allclose(b2, x, atol=1e-10)
    # QR pieces
    Syq = api.cs_sqr(3, A2, qr=True)
    Nq = api.cs_qr(A2, Syq)
    v, beta, s = api.cs_house(np.array([3.0, 4.0]))
    assert np.isclose(abs(s), 5.0)
    xx = np.ones(Nq.L.m)
    api.cs_happly(Nq.L, 0, Nq.B[0], xx)
    b3 = np.ones(n)
    assert api.cs_qrsol(3, A2, b3)
    assert resid(S2.toarray(), b3, np.ones(n)) < 1e-10
    # sparse triangular solve
    xs, xdense = api.cs_spsolve(N.L, A2, 0, pinv=None, lo=True)
    assert len(xs) > 0
    # utsolve smoke
    y = np.ones(n)
    api.cs_utsolve(N.U, y)
    assert np.all(np.isfinite(y))


def test_failures_are_flagged_not_raised():
    d = np.eye(4)
    d[2, 2] = -1.0
    A = csc_from_dense(d)
    b = np.ones(4)
    assert api.cs_cholsol(0, A, b) is False
    dz = np.eye(4)
    dz[1, 1] = 0.0
    Az = csc_from_dense(dz)
    Az = api.cs_dropzeros(Az)
    assert api.cs_lusol(0, Az, np.ones(4)) is False
