"""Multifrontal sparse Householder QR (tpusparse.device.mfqr).

Reference semantics: csparse::cs_qr / cs_house / cs_happly / cs_qrsol
(SURVEY.md §3.3).  Unlike the Q-less SparseQR engine, MultifrontalQR
keeps the TRUE orthogonal factor device-resident, so these tests check
the full contract: Q orthogonality, Q'A = [R; 0], reference-grade LS /
min-norm solves via augmented refinement, and cs_qr's fictitious-row
structural-rank behavior.
"""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.device.mfqr import MultifrontalQR, plan_mfqr


def _tall(rng, m, n, dens=0.1, scale=None):
    d = rng.normal(size=(m, n)) * (rng.random((m, n)) < dens)
    d[np.arange(n), np.arange(n)] += 3.0
    if scale is not None:
        d = d * scale[None, :]
    return d, csc_from_dense(d)


def test_q_roundtrip_and_orthogonality(rng):
    d, A = _tall(rng, 120, 70)
    F = MultifrontalQR(A)
    assert F.factor()
    b = rng.normal(size=120)
    y = F.apply_qt(b)
    assert abs(np.linalg.norm(y) / np.linalg.norm(b) - 1.0) < 1e-5
    b2 = F.apply_q(y)
    assert np.abs(b - b2).max() < 1e-5


def test_qta_is_triangular(rng):
    """Q'(A e_j) must be upper triangular in the R-row coordinates and
    carry no energy in the complement — the cs_qr factorization
    identity A(:,q) = Q [R; 0]."""
    from tpusparse.core.ops import permute
    d, A = _tall(rng, 80, 40, 0.15)
    F = MultifrontalQR(A)
    assert F.factor()
    q = F.plan.q
    Aq = d[:, q]
    for j in [0, 13, 39]:
        y = F.apply_qt(Aq[:, j])
        assert np.linalg.norm(y[j + 1:]) < 1e-4 * max(
            np.linalg.norm(y), 1.0)


def test_rtr_equals_ata(rng):
    """R'R = (AQ)'(AQ) at f32 grade, with R read back from the front
    pools (the factor-once contract: R rows live at front rows 0..w)."""
    d, A = _tall(rng, 90, 50, 0.12)
    F = MultifrontalQR(A)
    assert F.factor()
    n = A.n
    R = np.zeros((n, n))
    for f in F.plan.fronts:
        P = np.asarray(F.pools[f.bucket][f.slot], np.float64)
        gcols = np.concatenate(
            [np.arange(f.c0, f.c0 + f.w), f.od]).astype(int)
        for j in range(f.w):
            row = f.c0 + j
            keep = gcols >= row
            R[row, gcols[keep]] = P[j, np.flatnonzero(keep)]
    Aq = d[:, F.plan.q]
    assert np.abs(R.T @ R - Aq.T @ Aq).max() < 1e-4


def test_ls_matches_lstsq(rng):
    d, A = _tall(rng, 250, 100)
    F = MultifrontalQR(A)
    assert F.factor()
    b = rng.normal(size=250)
    x = F.solve_ls(b)
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() < 1e-12
    assert F.last_info["ne_resid"] < 1e-14


def test_minnorm_matches_pinv(rng):
    d, A = _tall(rng, 150, 60, 0.15)
    dw = d.T                          # wide 60 x 150 original
    F = MultifrontalQR(A)             # factors (A_wide)' = A
    assert F.factor()
    b = rng.normal(size=60)
    x = F.solve_minnorm(b)
    assert np.abs(dw @ x - b).max() < 1e-12
    # true min-norm: no nullspace component (augmented KKT refinement)
    xr = np.linalg.pinv(dw) @ b
    assert np.abs(x - xr).max() < 1e-10


def test_ill_conditioned_ls(rng):
    """cond(A) ~ 1e4: the Q-less CSNE engine squares this to 1e8 (f32
    marginal); the true-Q augmented refinement converges to reference
    grade — VERDICT r2 item 5's acceptance case."""
    scale = np.logspace(0, -4, 60)
    d, A = _tall(rng, 300, 60, 0.2, scale=scale)
    assert np.linalg.cond(d) > 1e4
    F = MultifrontalQR(A)
    assert F.factor()
    b = rng.normal(size=300)
    x = F.solve_ls(b, refine_iters=10)
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-10
    assert F.last_info["ne_resid"] < 1e-13


def test_structural_rank_deficiency(rng):
    """Empty column: cs_qr's fictitious rows give a zero R diagonal —
    rank_ok False, solves refuse."""
    d, _ = _tall(rng, 40, 15, 0.3)
    d[:, 7] = 0.0
    F = MultifrontalQR(csc_from_dense(d))
    assert not F.factor()
    with pytest.raises(ValueError):
        F.solve_ls(np.ones(40))


def test_numerical_rank_deficiency(rng):
    d, _ = _tall(rng, 50, 20, 0.4)
    d[:, 11] = d[:, 4]                # duplicate column
    F = MultifrontalQR(csc_from_dense(d))
    ok = F.factor()
    if ok:                            # f32 roundoff may leave tiny diag
        R = []
        for f in F.plan.fronts:
            P = np.asarray(F.pools[f.bucket][f.slot])
            R.extend(np.abs(np.diag(P[:f.w, :f.w])))
        assert min(R) < 1e-3


def test_empty_rows_passthrough(rng):
    d, _ = _tall(rng, 60, 25, 0.2)
    d[13, :] = 0.0
    d[44, :] = 0.0
    A = csc_from_dense(d)
    F = MultifrontalQR(A)
    assert F.factor()
    b = rng.normal(size=60)
    y = F.apply_qt(b)
    assert np.abs(F.apply_q(y) - b).max() < 1e-5
    x = F.solve_ls(b)
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() < 1e-12


def test_square_consistent(rng):
    d, A = _tall(rng, 64, 64, 0.1)
    F = MultifrontalQR(A)
    assert F.factor()
    xstar = rng.normal(size=64)
    b = d @ xstar
    x = F.solve_ls(b)
    assert np.abs(x - xstar).max() < 1e-11


def test_plan_accounting(rng):
    d, A = _tall(rng, 200, 90, 0.08)
    plan = plan_mfqr(A)
    assert plan.flops_true > 0
    assert plan.flops_padded >= plan.flops_true
    assert 0.0 <= plan.waste_ratio < 1.0
    # every column owned by exactly one front
    cols = sorted(c for f in plan.fronts
                  for c in range(f.c0, f.c0 + f.w))
    assert cols == list(range(90))
    # every nonzero-row assigned to exactly one front + passthroughs
    rows = sorted([r for f in plan.fronts for r in f.rows_a]
                  + list(plan.pass_rows))
    assert rows == list(range(200))


def test_fuzz_many_shapes(rng):
    for seed, (m, n, dens) in enumerate(
            [(30, 12, 0.2), (55, 55, 0.1), (90, 30, 0.07),
             (41, 40, 0.15), (17, 9, 0.4)]):
        r = np.random.default_rng(seed + 100)
        d, A = _tall(r, m, n, dens)
        F = MultifrontalQR(A)
        assert F.factor(), (m, n)
        b = r.normal(size=m)
        x = F.solve_ls(b, refine_iters=6)
        xref, *_ = np.linalg.lstsq(d, b, rcond=None)
        assert np.abs(x - xref).max() < 1e-10, (m, n)


def test_qrsol_routes_to_mfqr(rng, monkeypatch):
    """device.solvers.qrsol prefers the multifrontal Householder engine
    on the sparse path (TPUSPARSE_QR_DENSE_MAX forced low)."""
    from tpusparse.device import solvers
    monkeypatch.setenv("TPUSPARSE_QR_DENSE_MAX", "100")
    monkeypatch.setenv("TPUSPARSE_QR_ENGINE", "mfqr")
    d, A = _tall(rng, 90, 40, 0.12)
    b = rng.normal(size=90)
    ok, x = solvers.qrsol(3, A, b)
    assert ok
    xref, *_ = np.linalg.lstsq(d, b, rcond=None)
    assert np.abs(x - xref).max() < 1e-10
    # min-norm (wide) routing
    from tpusparse.core.ops import transpose
    Aw = transpose(A, values=True)
    bw = rng.normal(size=40)
    ok, xw = solvers.qrsol(3, Aw, bw)
    assert ok
    assert np.abs(d.T @ xw - bw).max() < 1e-10
    # structural deficiency surfaces as ok=False
    d2 = d.copy()
    d2[:, 5] = 0.0
    ok, _ = solvers.qrsol(3, csc_from_dense(d2), b)
    assert not ok


def test_checkpoint_roundtrip(rng, tmp_path):
    from tpusparse.utils.checkpoint import (load_mfqr_factor,
                                            save_mfqr_factor)
    d, A = _tall(rng, 100, 45, 0.12)
    F = MultifrontalQR(A)
    assert F.factor()
    b = rng.normal(size=100)
    x0 = F.solve_ls(b)
    p = str(tmp_path / "mfqr.npz")
    save_mfqr_factor(p, F)
    G = load_mfqr_factor(p, A)
    x1 = G.solve_ls(b)
    assert np.abs(x0 - x1).max() < 1e-12
    # mismatched matrix is rejected
    d2, A2 = _tall(rng, 100, 45, 0.2)
    with pytest.raises(ValueError):
        load_mfqr_factor(p, A2)


def test_metrics(rng):
    _, A = _tall(rng, 80, 40)
    F = MultifrontalQR(A)
    F.factor()
    m = F.metrics().as_dict() if hasattr(F.metrics(), "as_dict") else None
    # at minimum the call must not crash and expose the waste ratio
    assert F.plan.waste_ratio >= 0.0


def test_group_vs_bucket_dispatch_parity(rng):
    """The grouped runtime-schedule dispatch (default, mfqr_group) and
    the legacy bucket-keyed dispatch must produce BIT-IDENTICAL factors
    and solves — same kernels, same slot order, different program
    granularity (VERDICT r4 weak #7)."""
    d, A = _tall(rng, 220, 90, 0.12)
    b = rng.normal(size=220)
    Fg = MultifrontalQR(A, dispatch="group")
    Fb = MultifrontalQR(A, dispatch="bucket")
    assert Fg.factor() and Fb.factor()
    for bk in Fg.plan.buckets:
        assert np.array_equal(np.asarray(Fg.pools[bk]),
                              np.asarray(Fb.pools[bk])), bk
        assert np.array_equal(np.asarray(Fg.taus[bk]),
                              np.asarray(Fb.taus[bk])), bk
    xg, xb = Fg.solve_ls(b), Fb.solve_ls(b)
    assert np.array_equal(xg, xb)
    yg, yb = Fg.apply_qt(b), Fb.apply_qt(b)
    assert np.array_equal(yg, yb)
    assert np.array_equal(Fg.apply_q(yg), Fb.apply_q(yb))


def test_group_dispatch_program_count(rng):
    """Program-count regression (VERDICT r4 item 2): grouped dispatch
    compiles ONE program per (kernel family, bucket shape) — at most
    6 families x the TPUSPARSE_QR_SHAPES budget (default 16) = 96,
    under the 100-program bar at ANY problem size; the legacy bucket
    dispatch scales with (level, batch) pairs instead."""
    d, A = _tall(rng, 400, 160, 0.08)
    F = MultifrontalQR(A, dispatch="group")
    n_shapes = len(F.plan.buckets)
    assert n_shapes <= 16
    assert F.n_programs <= 6 * n_shapes <= 96
    # the count is exact: 6 families per shape
    import collections
    fams = collections.Counter(
        sig[0] for sig in {s for s, _f, _a in F._kernel_jobs()})
    assert set(fams) == {"gfct", "gqt", "gq", "grs", "grts", "rdiag"}
