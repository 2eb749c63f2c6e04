"""Device LU (BTF + blocked dense) and QR (blocked WY) vs oracles."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.device import TpuLU, TpuQR
from tpusparse.device import solvers as dev_solvers
from helpers import random_csc, random_spd, resid


def test_tpu_lu_solve(rng):
    n = 40
    A, S = random_csc(rng, n, n, density=0.15)
    S2 = (S + 3 * sp.eye(n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    F = TpuLU(A2)
    assert F.factor()
    b = 1.0 + np.arange(n) / n
    x = F.solve(b)
    assert resid(S2.toarray(), x, b) < 1e-13


def test_tpu_lu_btf_many_blocks(rng):
    # block upper triangular with several blocks exercises the BTF path
    n = 30
    d = np.triu(rng.normal(size=(n, n))) * (rng.random((n, n)) < 0.3)
    np.fill_diagonal(d, rng.normal(size=n) + 3)
    # add a few sub-diagonal couplings inside 3 diagonal blocks
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        for _ in range(8):
            i = rng.integers(lo + 1, hi)
            j = rng.integers(lo, i)
            d[i, j] = rng.normal()
    A = csc_from_dense(d)
    F = TpuLU(A)
    assert F.nb >= 3
    assert F.factor()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-13


def test_tpu_lu_singular(rng):
    d = rng.normal(size=(8, 8))
    d[:, 3] = 0.0
    A = csc_from_dense(d)
    F = TpuLU(A)
    assert not F.factor()
    ok, x = dev_solvers.lusol(2, A, np.ones(8))
    assert not ok


def test_tpu_lu_needs_pivoting(rng):
    n = 12
    d = rng.normal(size=(n, n))
    d[0, 0] = 0.0                     # zero pivot without pivoting
    A = csc_from_dense(d)
    F = TpuLU(A)
    assert F.factor()
    b = rng.normal(size=n)
    assert resid(d, F.solve(b), b) < 1e-12


def test_tpu_qr_least_squares(rng):
    m, n = 40, 17
    A, S = random_csc(rng, m, n, density=0.3)
    S2 = (S + sp.eye(m, n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    ok, x = dev_solvers.qrsol(3, A2, rng.normal(size=m))
    assert ok
    b = rng.normal(size=m)
    ok, x = dev_solvers.qrsol(3, A2, b)
    oracle, *_ = np.linalg.lstsq(S2.toarray(), b, rcond=None)
    assert np.allclose(x, oracle, atol=1e-6)


def test_tpu_qr_min_norm(rng):
    m, n = 11, 23
    A, S = random_csc(rng, m, n, density=0.4)
    S2 = (S + sp.eye(m, n)).tocsc()
    A2 = CSCMatrix.fromscipy(S2)
    b = rng.normal(size=m)
    ok, x = dev_solvers.qrsol(3, A2, b)
    assert ok
    assert np.allclose(S2.toarray() @ x, b, atol=1e-8)
    oracle = np.linalg.pinv(S2.toarray()) @ b
    assert np.allclose(x, oracle, atol=1e-6)


def test_device_cholsol_driver(rng):
    n = 30
    A, S = random_spd(rng, n, density=0.2)
    b = 1.0 + np.arange(n) / n
    ok, x = dev_solvers.cholsol(1, A, b)
    assert ok
    assert resid(S.toarray(), x, b) < 1e-13
    # non-SPD fails silently
    d = np.eye(4); d[2, 2] = -1
    ok, _ = dev_solvers.cholsol(0, csc_from_dense(d), np.ones(4))
    assert not ok
