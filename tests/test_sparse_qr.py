"""Q-less supernodal sparse QR (tpusparse.device.qr_tpu.SparseQR) and
its qrsol routing.  Reference: csparse::cs_qr / cs_qrsol (SURVEY.md
§3.3); R equals the Householder R of the reference up to signs."""

import os

import numpy as np
import pytest

from tpusparse.core import csc_from_dense
from tpusparse.device.qr_tpu import SparseQR


def _tall(rng, m, n, dens=0.1):
    d = rng.normal(size=(m, n)) * (rng.random((m, n)) < dens)
    d[np.arange(n), np.arange(n)] += 3.0
    return d, csc_from_dense(d)


def test_ls_matches_lstsq(rng):
    d, A = _tall(rng, 200, 80)
    F = SparseQR(A, wmax=16, tau=0.9, small_w=4)
    assert F.rank_ok
    b = rng.normal(size=200)
    x = F.solve_ls(b)
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() < 1e-9


def test_r_matches_householder_r(rng):
    # R from chol(A'A) equals the reference QR's R up to row signs
    from tpusparse.numeric.qr import qr
    from tpusparse.symbolic.plan import sqr
    d, A = _tall(rng, 60, 25, 0.3)
    F = SparseQR(A, order=0, wmax=8, tau=0.9, small_w=4)
    assert F.rank_ok
    L = F.F.extract_L()           # chol factor of (permuted) A'A
    AtA = (d.T @ d)
    perm = F.F.plan.perm
    Ld = np.zeros((25, 25))
    for j in range(25):
        seg = slice(L.indptr[j], L.indptr[j + 1])
        Ld[L.indices[seg], j] = L.data[seg]
    rec = Ld @ Ld.T
    assert np.allclose(rec, AtA[np.ix_(perm, perm)], atol=1e-3)


def test_minnorm(rng):
    d, A = _tall(rng, 150, 60, 0.15)
    from tpusparse.core.ops import transpose
    dw = d.T                       # wide 60 x 150
    F = SparseQR(A, wmax=16)       # factors (A_wide)' = A
    assert F.rank_ok
    b = rng.normal(size=60)
    x = F.solve_minnorm(b)
    assert np.abs(dw @ x - b).max() < 1e-9
    xr = np.linalg.pinv(dw) @ b
    assert np.abs(x - xr).max() < 1e-8


def test_qrsol_routing_sparse(rng):
    from tpusparse.device.solvers import qrsol
    d, A = _tall(rng, 120, 50)
    b = rng.normal(size=120)
    os.environ["TPUSPARSE_QR_DENSE_MAX"] = "100"
    try:
        ok, x = qrsol(3, A, b)
    finally:
        del os.environ["TPUSPARSE_QR_DENSE_MAX"]
    assert ok
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() < 1e-9


def test_rank_deficient_flagged(rng):
    d = np.zeros((40, 10))
    d[:, :9] = rng.normal(size=(40, 9))
    d[:, 9] = d[:, 0] + d[:, 1]          # exactly dependent
    A = csc_from_dense(d)
    F = SparseQR(A, wmax=8)
    assert not F.rank_ok
    with pytest.raises(ValueError):
        F.solve_ls(np.ones(40))
