"""Q-less supernodal sparse QR (tpusparse.device.qr_tpu.SparseQR) and
its qrsol routing.  Reference: csparse::cs_qr / cs_qrsol (SURVEY.md
§3.3); R equals the Householder R of the reference up to signs."""

import os

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
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


# ---------------------------------------------------------------- round 3
def _ill_conditioned_ls(m, n, cond, seed=1):
    """Tall sparse LS with controlled kappa(A) ~ cond via geometric
    column scaling (VERDICT r2 item 5's test shape)."""
    import scipy.sparse as sp
    S = sp.random(m, n, density=0.02,
                  random_state=np.random.RandomState(seed), format="csc")
    S = S + sp.vstack([sp.eye(n), sp.csr_matrix((m - n, n))]).tocsc()
    S = (S @ sp.diags(np.logspace(0, -np.log10(cond), n))).tocsc()
    S.sort_indices()
    return CSCMatrix(m, n, S.indptr, S.indices, S.data), S


def test_augmented_refinement_cond_1e4(rng):
    """cond(A) ~ 1e4: naive CSNE at f32 squares to 1e8 (~1/eps_f32,
    unsafe); augmented-system refinement reaches reference grade."""
    A, S = _ill_conditioned_ls(600, 240, 1e4)
    x_true = rng.normal(size=240)
    b = S @ x_true + 1e-3 * rng.normal(size=600)
    F = SparseQR(A, wmax=16)
    assert F.rank_ok
    x = F.solve_ls(b)
    assert F.last_info["ne_resid"] < 1e-13       # normal-eq residual
    assert F.last_info["aug_resid"] < 1e-13      # augmented residual
    xd = np.linalg.lstsq(S.toarray(), b, rcond=None)[0]
    assert np.linalg.norm(x - xd) / np.linalg.norm(xd) < 1e-7


def test_device_resident_qr_solves(rng):
    A, S = _ill_conditioned_ls(300, 120, 10)
    b = rng.normal(size=300)
    F = SparseQR(A, wmax=16)
    F.solve_ls(b)
    # the underlying chol engine never extracted its factor to host
    assert getattr(F.F, "_Lhost", None) is None


def test_cond_estimate_order_of_magnitude(rng):
    for cond in (1e2, 1e5):
        A, S = _ill_conditioned_ls(400, 150, cond, seed=2)
        F = SparseQR(A, wmax=16)
        est = F.cond_estimate()
        true = np.linalg.cond(S.toarray())
        assert true / 30 < est < true * 30


def test_qrsol_cond_gate_falls_back_to_host(rng, monkeypatch):
    """Conditioning beyond the gate routes to the host Householder
    engine and still solves correctly."""
    import os
    from tpusparse.device.solvers import qrsol
    A, S = _ill_conditioned_ls(260, 100, 1e4, seed=3)
    b = rng.normal(size=260)
    monkeypatch.setenv("TPUSPARSE_QR_DENSE_MAX", "100")   # force sparse
    monkeypatch.setenv("TPUSPARSE_QR_COND_MAX", "100")    # force gate
    ok, x = qrsol(3, A, b)
    assert ok
    xd = np.linalg.lstsq(S.toarray(), b, rcond=None)[0]
    assert np.linalg.norm(x - xd) / np.linalg.norm(xd) < 1e-7


def test_minnorm_augmented(rng):
    import scipy.sparse as sp
    m, n = 80, 200
    S = sp.random(m, n, density=0.06,
                  random_state=np.random.RandomState(4), format="csc")
    S = S + sp.hstack([sp.eye(m), sp.csr_matrix((m, n - m))]).tocsc()
    S = S.tocsc(); S.sort_indices()
    St = S.T.tocsc()
    At = CSCMatrix(n, m, St.indptr, St.indices, St.data)
    F = SparseQR(At, wmax=16)
    b = rng.normal(size=m)
    x = F.solve_minnorm(b)
    assert np.abs(S @ x - b).max() < 1e-10
    xd = np.linalg.lstsq(S.toarray(), b, rcond=None)[0]
    assert np.linalg.norm(x) < np.linalg.norm(xd) * (1 + 1e-8)
