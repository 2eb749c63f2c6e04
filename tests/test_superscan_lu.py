"""Sparse supernodal static-pivot LU (tpusparse.device.superscan_lu)
and its BTF-driver routing (device.lu_tpu sparse_min).  Reference:
csparse::cs_lu / cs_lusol (SURVEY.md §3.2)."""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.device.superscan_lu import SuperscanLU
from tpusparse.device.lu_tpu import TpuLU
from helpers import resid


def _unsym(rng, n, dens=0.2, dom=1.0):
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < dens)
    d += np.diag(np.abs(d).sum(1) + dom)
    return d, csc_from_dense(d)


@pytest.mark.parametrize("n,dens", [(15, 0.5), (60, 0.2), (150, 0.07)])
def test_fuzz_unsymmetric(rng, n, dens):
    d, A = _unsym(rng, n, dens)
    F = SuperscanLU(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_banded_unsymmetric(rng):
    # the VERDICT r1 item-3 shape at test scale: unsymmetric banded
    n = 600
    d = np.zeros((n, n))
    for off, scale in [(0, 4.0), (1, -1.0), (-1, -2.0),
                       (12, -0.7), (-12, -0.4)]:
        m = n - abs(off)
        v = scale * (1.0 + 0.3 * rng.random(m))
        d[np.arange(m) + max(0, -off), np.arange(m) + max(0, off)] = v
    A = csc_from_dense(d)
    F = SuperscanLU(A, order=1, max_segments=8)
    assert F.factor()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_matches_host_lu(rng):
    from tpusparse.numeric import lusol
    d, A = _unsym(rng, 80, 0.15)
    b = rng.normal(size=80)
    ok, xh = lusol(1, A, b.copy())
    assert ok
    F = SuperscanLU(A, order=1, wmax=16)
    assert F.factor()
    xd = F.solve(b)
    assert np.allclose(xh, xd, atol=1e-9)


def test_tiny_pivot_perturbation_healed_by_refinement(rng):
    # one tiny (but nonzero) pivot: static pivoting perturbs, the f64
    # refinement recovers full accuracy
    d, A = _unsym(rng, 40, 0.3)
    d[7, 7] = 1e-13
    A = csc_from_dense(d)
    F = SuperscanLU(A, order=0, wmax=16)
    assert F.factor()
    b = rng.normal(size=40)
    x = F.solve(b, refine_iters=8)
    assert resid(d, x, b) < 1e-10


def test_btf_routing_sparse_blocks(rng):
    d, A = _unsym(rng, 250, 0.1)
    F = TpuLU(A, order=2, sparse_min=64)
    assert F.factor()
    assert any(blk.sparse is not None for blk in F.blocks)
    assert all(blk.LU is None for blk in F.blocks
               if blk.sparse is not None)          # never densified
    b = rng.normal(size=250)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_btf_mixed_blocks(rng):
    # block-triangular matrix: small blocks stay dense, big one sparse
    n1, n2 = 20, 200
    d1, _ = _unsym(rng, n1, 0.4)
    d2, _ = _unsym(rng, n2, 0.1)
    d = np.zeros((n1 + n2, n1 + n2))
    d[:n1, :n1] = d1
    d[n1:, n1:] = d2
    d[:n1, n1:] = 0.1 * (rng.random((n1, n2)) < 0.05) * rng.normal(
        size=(n1, n2))
    A = csc_from_dense(d)
    F = TpuLU(A, order=2, sparse_min=64)
    assert F.factor()
    kinds = {("sparse" if b_.sparse is not None else "dense")
             for b_ in F.blocks if b_.size > 1}
    b = rng.normal(size=n1 + n2)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_singular_flagged_clean(rng):
    from tpusparse.device.solvers import lusol as dev_lusol
    d = np.outer(np.arange(1.0, 7.0), np.ones(6)) + np.eye(6) * 0.0
    A = csc_from_dense(d)              # rank 1: structurally full, singular
    ok, x = dev_lusol(1, A, np.ones(6))
    assert not ok and x is None


def test_metrics(rng):
    d, A = _unsym(rng, 50, 0.3)
    F = SuperscanLU(A, order=1, wmax=16)
    m = F.metrics().values
    assert m["lu_engine"] == "superscan_lu"
    assert m["lu_flops_true"] > 0 and m["lu_segments"] >= 1


# ---------------------------------------------------------------- round 3
def _convdiff(g, weak_cols=()):
    """Unsymmetric 2D convection-diffusion; ``weak_cols`` get a ~zero
    diagonal (the west0479-class shape that kills static pivoting)."""
    import scipy.sparse as sp
    n = g * g
    main = 4.0 * np.ones(n)
    ex_lo = np.full(n - 1, -1.6)
    ex_lo[np.arange(1, n) % g == 0] = 0
    ex_hi = np.full(n - 1, -0.4)
    ex_hi[np.arange(1, n) % g == 0] = 0
    ey = -np.ones(n - g)
    A = sp.diags([main, ex_hi, ex_lo, ey, ey], [0, 1, -1, g, -g],
                 format="csc").tolil()
    for i in weak_cols:
        A[i, i] = 1e-12
    A = A.tocsc()
    A.sort_indices()
    return CSCMatrix(n, n, A.indptr, A.indices, A.data), A


def test_device_resident_solve_never_downloads(rng):
    """VERDICT r2 item 1: solves run against the device pools; the
    host-extract cache must stay cold."""
    M, S = _convdiff(16)
    n = M.n
    F = SuperscanLU(M, order=1, wmax=32)
    assert F.factor()
    b = 1.0 + np.arange(n) / n
    x = F.solve(b)
    assert F._LU_host is None              # factor never extracted
    assert resid(S.toarray(), x, b) < 1e-13


def test_device_solve_matches_host_extract(rng):
    M, S = _convdiff(12)
    n = M.n
    F = SuperscanLU(M, order=1, wmax=16)
    assert F.factor()
    b = rng.normal(size=n)
    x_dev = F._solve_f32(b)
    x_host = F._solve_f32_host(b)
    assert np.allclose(x_dev, x_host, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("weak", [[100], [100, 101], [50, 200, 350]])
def test_within_panel_pivoting_rescues_weak_diagonal(weak):
    """VERDICT r2 item 2: static pivoting (tol=0) diverges on weak
    diagonals; within-panel threshold pivoting (tol=1) solves to
    reference grade.  Matching disabled to isolate the pivoting."""
    M, S = _convdiff(24, weak)
    n = M.n
    b = 1.0 + np.arange(n) / n
    d = S.toarray()
    F0 = SuperscanLU(M, order=1, wmax=32, tol=0.0, match=False)
    if F0.factor():
        try:
            r0 = resid(d, F0.solve(b), b)
        except ValueError:                 # flagged as numerically
            r0 = np.inf                    # singular — also a failure
    else:
        # device growth detection fired in O(factor) time (VERDICT r3
        # item 4) — the stronger form of the same static-pivot failure
        assert F0.growth_exceeded
        r0 = np.inf
    F1 = SuperscanLU(M, order=1, wmax=32, tol=1.0, match=False)
    assert F1.factor()
    r1 = resid(d, F1.solve(b), b)
    assert r1 < 1e-12
    assert r0 > 1e3 * r1                   # static pivot genuinely fails


def test_pivoted_factorization_product(rng):
    """P_panel * C = L U on the extracted factor (pivoted coords)."""
    from tpusparse.core.ops import permute
    from tpusparse.core.perm import pinv as _pinv
    # natural order + weak leading columns: eliminated first with no
    # prior updates, so pivoting provably engages
    M, S = _convdiff(8, [0, 1])
    n = M.n
    F = SuperscanLU(M, order=0, wmax=8, tol=1.0, match=False)
    assert F.factor()
    L, U, pglob = F.extract_LU()
    C = permute(F._B, _pinv(F.plan.perm), F.plan.perm, values=True)
    Cd = np.zeros((n, n))
    for j in range(n):
        Cd[C.indices[C.indptr[j]:C.indptr[j + 1]], j] = \
            C.data[C.indptr[j]:C.indptr[j + 1]]
    Ld = np.zeros((n, n))
    Ud = np.zeros((n, n))
    for j in range(n):
        Ld[L.indices[L.indptr[j]:L.indptr[j + 1]], j] = \
            L.data[L.indptr[j]:L.indptr[j + 1]]
        Ud[U.indices[U.indptr[j]:U.indptr[j + 1]], j] = \
            U.data[U.indptr[j]:U.indptr[j + 1]]
    assert np.abs(np.triu(Ld, 1)).max() == 0     # truly triangular
    assert np.abs(np.tril(Ud, -1)).max() == 0
    assert (pglob != np.arange(n)).sum() > 0     # pivoting happened
    assert np.abs(Cd[pglob] - Ld @ Ud).max() < 1e-4


def test_lu_panel_kernel_vs_dense():
    import jax.numpy as jnp
    from tpusparse.device.superscan_lu import _lu_panel
    rng2 = np.random.default_rng(3)
    D = rng2.normal(size=(4, 16, 16)).astype(np.float32)
    D[:, 0, 0] = 1e-9
    F, P = _lu_panel(jnp.asarray(D), jnp.float32(1e-20), 1.0)
    F, P = np.asarray(F), np.asarray(P)
    for u in range(4):
        L = np.tril(F[u], -1) + np.eye(16)
        U = np.triu(F[u])
        assert np.abs(P[u] @ D[u] - L @ U).max() < 1e-4
        assert (P[u].sum(0) == 1).all() and (P[u].sum(1) == 1).all()


def test_solve_many_consistent(rng):
    # two sequential solves on one factor (factor-once/solve-many)
    M, S = _convdiff(10)
    n = M.n
    F = SuperscanLU(M, order=1, wmax=16)
    assert F.factor()
    for seed in (0, 1):
        b = np.random.default_rng(seed).normal(size=n)
        assert resid(S.toarray(), F.solve(b), b) < 1e-13


def test_solve_many_device_resident(rng):
    """(n, k) multi-RHS through the vmapped device solve — the
    factor-once/solve-many csn contract, device-resident."""
    M, S = _convdiff(10)
    n = M.n
    F = SuperscanLU(M, order=1, wmax=16)
    assert F.factor()
    B = rng.normal(size=(n, 3))
    X = F.solve_many(B)
    assert F._LU_host is None
    for j in range(3):
        assert resid(S.toarray(), X[:, j], B[:, j]) < 1e-13


def _growth_bomb(n=96, K=40, tiny=1e-9):
    """Within-panel-pivoting killer: tiny diagonal, unit entries K rows
    below it — the large candidates are od rows (never pivot-eligible),
    so uncontained growth ~1/tiny is guaranteed without matching."""
    d = np.eye(n) * tiny
    for i in range(n - K):
        d[i + K, i] = 1.0
    d[0, n - 1] = 0.5            # keep it irreducible-ish
    return d, csc_from_dense(d)


def test_growth_detection_fails_fast():
    """VERDICT r3 item 4: uncontained element growth is detected ON
    DEVICE in O(factor) time (reported metric), not discovered by a
    diverged refinement.  Reference: cs_lu.c growth containment."""
    d, A = _growth_bomb()
    F = SuperscanLU(A, order=1, tol=1.0, match=False)
    assert not F.factor()
    assert F.growth_exceeded
    assert F.growth > 1e6
    assert F.pools is None            # fail fast: no factor kept
    m = F.metrics().values
    assert m["lu_growth"] == F.growth


def test_growth_escape_via_matching():
    """The TpuLU composite retries a growth-bombed block once with
    bottleneck matching + strict panel pivoting; the matched matrix
    pivots the unit entries onto the diagonal and solves on device."""
    d, A = _growth_bomb()
    F = TpuLU(A, order=0, sparse_min=8)
    if F.factor():
        b = np.linspace(1.0, 2.0, A.n)
        x = F.solve(b)
        assert resid(d, x, b) < 1e-8
    else:
        # escalation also blew up: the contract is a REPORTED growth
        # metric in O(2 factors) — the composite then falls to host
        assert F.growth is not None and F.growth > 1e6


def test_moderate_growth_not_flagged(rng):
    """Benign problems stay below the growth limit — detection must
    not false-positive on ordinary conditioning."""
    d, A = _unsym(rng, 120, 0.1)
    F = SuperscanLU(A, order=1)
    assert F.factor()
    assert not F.growth_exceeded
    assert F.growth is not None and F.growth < 1e3
