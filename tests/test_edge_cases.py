"""Edge cases: tiny/empty matrices, unsorted input, pattern-only flows."""

import numpy as np
import pytest

import tpusparse.api as api
from tpusparse.core import COOMatrix, CSCMatrix, csc_from_dense
from tpusparse.numeric import cholsol, lusol, qrsol
from tpusparse.symbolic import amd, dmperm, etree, schol, sqr
from helpers import resid


def test_n1_everything():
    A = csc_from_dense(np.array([[4.0]]))
    ok, x = cholsol(1, A, np.array([8.0]))
    assert ok and np.isclose(x[0], 2.0)
    ok, x = lusol(2, A, np.array([8.0]))
    assert ok and np.isclose(x[0], 2.0)
    ok, x = qrsol(3, A, np.array([8.0]))
    assert ok and np.isclose(x[0], 2.0)
    assert amd(1, A) is not None
    D = dmperm(A)
    assert D.nb == 1 and int(D.rr[3]) == 1


def test_empty_matrix():
    A = CSCMatrix(0, 0, np.zeros(1, np.int64), np.zeros(0, np.int64),
                  np.zeros(0))
    assert etree(A).size == 0
    p = amd(1, A)
    assert p is None or p.size == 0
    ok, x = cholsol(1, A, np.zeros(0))
    assert ok


def test_unsorted_input_columns(rng):
    # routines must tolerate unsorted columns like the reference
    d = rng.normal(size=(6, 6))
    d = d @ d.T + 6 * np.eye(6)
    A = csc_from_dense(d)
    # scramble each column's entry order
    idx = []
    for j in range(6):
        seg = np.arange(A.indptr[j], A.indptr[j + 1])
        idx.extend(seg[::-1])
    B = CSCMatrix(6, 6, A.indptr, A.indices[idx], A.data[idx])
    b = rng.normal(size=6)
    ok, x = cholsol(1, B, b.copy())
    assert ok and resid(d, x, b) < 1e-12
    ok, x = lusol(2, B, b.copy())
    assert ok and resid(d, x, b) < 1e-12


def test_duplicate_triplet_entries(rng):
    T = COOMatrix(3, 3,
                  [0, 0, 1, 2, 1], [0, 0, 1, 2, 1],
                  [1.0, 3.0, 2.0, 5.0, 2.0])
    A = T.tocsc()
    assert A.nnz == 3
    assert A.todense()[0, 0] == 4.0 and A.todense()[1, 1] == 4.0


def test_pattern_only_symbolic(rng):
    d = (rng.random((8, 8)) < 0.4)
    d = d | d.T | np.eye(8, dtype=bool)
    A = csc_from_dense(d.astype(float)).pattern()
    parent = etree(A)
    assert parent.size == 8
    assert amd(1, A) is not None
    D = dmperm(A)
    assert int(D.rr[3]) == 8


def test_dense_matrix_through_sparse_paths(rng):
    d = rng.normal(size=(10, 10))
    d = d @ d.T + 10 * np.eye(10)
    A = csc_from_dense(d)
    assert A.nnz == 100
    b = rng.normal(size=10)
    ok, x = cholsol(1, A, b)
    assert ok and resid(d, x, b) < 1e-12
    S = schol(1, A)
    assert S.lnz == 55           # fully dense L


def test_device_tiny(rng):
    from tpusparse.device import TpuCholesky
    d = np.array([[4.0, 1.0], [1.0, 3.0]])
    A = csc_from_dense(d)
    F = TpuCholesky(A, order=0, block=8)
    assert F.factor()
    x = F.solve(np.array([1.0, 2.0]))
    assert resid(d, x, np.array([1.0, 2.0])) < 1e-14


def test_singular_u_clean_failure(rng):
    """A rank-deficient matrix reaching usolve/utsolve must return a
    clean ok=False — no RuntimeWarning, no NaN (ADVICE r1 #4)."""
    import warnings
    from tpusparse.numeric import usolve, utsolve
    # rank-1 square matrix: QR's R has a zero diagonal entry
    d = np.outer([1.0, 2.0, 3.0], [1.0, 1.0, 1.0])
    A = csc_from_dense(d)
    b = rng.normal(size=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # any warning -> test failure
        ok, x = qrsol(0, A, b.copy())
    assert not ok and x is None
    # direct usolve/utsolve on a singular U: flagged None, api False
    U = csc_from_dense(np.array([[1.0, 2.0], [0.0, 0.0]]))
    assert usolve(U, np.ones(2)) is None
    assert utsolve(U, np.ones(2)) is None
    buf = np.ones(2)
    assert api.cs_usolve(U, buf) is False
    assert np.all(buf == 1.0)                   # b untouched on failure


def test_qrsol_wide_flat(rng):
    # 1 x n and m x 1 extremes
    A = csc_from_dense(np.array([[1.0, 2.0, 2.0]]))
    ok, x = qrsol(0, A, np.array([9.0]))
    assert ok and np.isclose(A.todense() @ x, 9.0)
    A2 = csc_from_dense(np.array([[1.0], [2.0], [2.0]]))
    b = np.array([1.0, 2.0, 2.0])
    ok, x = qrsol(0, A2, b)
    assert ok and np.isclose(x[0], 1.0)
