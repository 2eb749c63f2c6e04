"""Property tests for the host core (L0/L1) vs scipy/numpy oracles.

Test strategy per SURVEY.md §4: the reference has no unit tests (demo
suite only); we ADD property tests with scipy as ground truth.
"""

import io

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.core import (COOMatrix, CSCMatrix, add, csc_from_dense,
                            droptol, dropzeros, dupl, fkeep, gaxpy, ipvec,
                            load, multiply, norm1, permute, pinv, pvec,
                            randperm, save, sprint, symperm, transpose)
from helpers import random_csc


def test_coo_roundtrip(rng):
    A, S = random_csc(rng, 13, 7)
    assert np.allclose(A.todense(), S.toarray())
    assert np.allclose(A.tocoo().tocsc().todense(), S.toarray())


def test_entry_compress_vs_dense(rng):
    T = COOMatrix(0, 0)
    d = {}
    for _ in range(50):
        i, j, x = int(rng.integers(6)), int(rng.integers(6)), rng.normal()
        T.entry(i, j, x)
        d[(i, j)] = d.get((i, j), 0.0) + x
    A = T.tocsc()
    dense = np.zeros((T.m, T.n))
    for (i, j), x in d.items():
        dense[i, j] = x
    assert np.allclose(A.todense(), dense)


def test_dupl_sums_duplicates():
    T = COOMatrix(3, 3, [0, 0, 1], [0, 0, 2], [1.0, 2.0, 5.0])
    A = T.tocsc(sum_duplicates=False) if hasattr(T, "x") else T.tocsc()
    assert A.todense()[0, 0] == 3.0
    # dupl on an externally assembled matrix
    B = CSCMatrix(2, 1, [0, 2], [0, 0], [1.0, 4.0])
    assert dupl(B).todense()[0, 0] == 5.0


def test_transpose(rng):
    A, S = random_csc(rng, 11, 17)
    assert np.allclose(transpose(A).todense(), S.toarray().T)
    # double transpose = identity (A'' = A)
    assert np.allclose(transpose(transpose(A)).todense(), S.toarray())
    # pattern-only
    P = A.pattern()
    assert transpose(P, values=False).data is None


def test_add(rng):
    A, SA = random_csc(rng, 9, 12)
    B, SB = random_csc(rng, 9, 12)
    C = add(A, B, 2.0, -3.0)
    assert np.allclose(C.todense(), 2 * SA.toarray() - 3 * SB.toarray())


def test_multiply(rng):
    A, SA = random_csc(rng, 8, 10)
    B, SB = random_csc(rng, 10, 6)
    C = multiply(A, B)
    assert np.allclose(C.todense(), SA.toarray() @ SB.toarray())


def test_multiply_pattern(rng):
    A, SA = random_csc(rng, 8, 10)
    B, SB = random_csc(rng, 10, 6)
    C = multiply(A.pattern(), B.pattern())
    oracle = (SA.toarray() != 0).astype(float) @ (SB.toarray() != 0)
    assert np.array_equal(C.todense() != 0, oracle != 0)


def test_gaxpy(rng):
    A, S = random_csc(rng, 10, 14)
    x = rng.normal(size=14)
    y = rng.normal(size=10)
    assert np.allclose(gaxpy(A, x, y), y + S.toarray() @ x)


def test_norm1(rng):
    A, S = random_csc(rng, 10, 14)
    assert np.isclose(norm1(A), np.abs(S.toarray()).sum(axis=0).max())


def test_permute(rng):
    A, S = random_csc(rng, 9, 9)
    p = rng.permutation(9)
    q = rng.permutation(9)
    C = permute(A, pinv(p), q)
    assert np.allclose(C.todense(), S.toarray()[p][:, q])


def test_symperm(rng):
    d = rng.normal(size=(8, 8))
    d = d + d.T
    U = csc_from_dense(np.triu(d))
    p = rng.permutation(8)
    C = symperm(U, pinv(p))
    full = C.todense()
    full = full + np.triu(full, 1).T
    assert np.allclose(full, d[p][:, p])


def test_pvec_ipvec_roundtrip(rng):
    b = rng.normal(size=10)
    p = rng.permutation(10)
    assert np.allclose(ipvec(p, pvec(p, b)), b)
    assert np.allclose(pvec(p, b), b[p])
    x = ipvec(p, b)
    assert np.allclose(x[p], b)
    assert np.allclose(pvec(None, b), b)


def test_randperm():
    assert randperm(5, 0) is None
    assert np.array_equal(randperm(5, -1), [4, 3, 2, 1, 0])
    r = randperm(20, 7)
    assert np.array_equal(np.sort(r), np.arange(20))


def test_fkeep_droptol(rng):
    A, S = random_csc(rng, 10, 10, density=0.4)
    U = fkeep(A, lambda i, j, x: i <= j)
    assert np.allclose(U.todense(), np.triu(S.toarray()))
    D = droptol(A, 0.5)
    oracle = S.toarray() * (np.abs(S.toarray()) > 0.5)
    assert np.allclose(D.todense(), oracle)
    B = CSCMatrix(2, 2, [0, 1, 2], [0, 1], [0.0, 3.0])
    assert dropzeros(B).nnz == 1


def test_load_save_roundtrip(rng):
    A, S = random_csc(rng, 6, 5)
    buf = io.StringIO()
    save(A, buf)
    T = load(buf.getvalue())
    assert np.allclose(T.tocsc().todense(), S.toarray())


def test_load_matrixmarket():
    mm = """%%MatrixMarket matrix coordinate real general
3 4 2
1 1 2.5
3 4 -1.0
"""
    T = load(mm)
    assert (T.m, T.n) == (3, 4)
    d = T.todense()
    assert d[0, 0] == 2.5 and d[2, 3] == -1.0


def test_sprint_smoke(rng):
    A, _ = random_csc(rng, 5, 5)
    s = sprint(A)
    assert "5-by-5" in s
    assert "triplet" in sprint(A.tocoo())


def test_sort_columns(rng):
    A, S = random_csc(rng, 12, 8)
    # scramble within columns
    B = CSCMatrix(A.m, A.n, A.indptr,
                  np.concatenate([A.indices[A.indptr[j]:A.indptr[j + 1]][::-1]
                                  for j in range(A.n)]),
                  np.concatenate([A.data[A.indptr[j]:A.indptr[j + 1]][::-1]
                                  for j in range(A.n)]))
    C = B.sort_columns()
    assert np.allclose(C.todense(), S.toarray())
    for j in range(C.n):
        seg = C.indices[C.indptr[j]:C.indptr[j + 1]]
        assert np.all(np.diff(seg) > 0)
