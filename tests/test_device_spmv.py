"""Device SpMV (ELL/XLA and BELL/Pallas-interpret) vs the host gaxpy."""

import numpy as np
import pytest

from tpusparse.core import gaxpy
from tpusparse.device import spmv_plan, gaxpy_device
from helpers import random_csc, random_spd


def test_ell_spmv_matches_host(rng):
    A, S = random_csc(rng, 50, 37, density=0.15)
    x = rng.normal(size=37)
    plan = spmv_plan(A, mode="ell")
    y = np.asarray(plan.apply(x))
    assert np.allclose(y, S.toarray() @ x, atol=1e-5)
    assert plan.waste_ratio < 0.95


def test_bell_spmv_matches_host(rng):
    A, S = random_spd(rng, 40, density=0.4)
    x = rng.normal(size=40)
    plan = spmv_plan(A, mode="bell")
    y = np.asarray(plan.apply(x))
    assert np.allclose(y, S.toarray() @ x, atol=1e-4)


def test_gaxpy_device(rng):
    A, S = random_csc(rng, 30, 30, density=0.2)
    x = rng.normal(size=30)
    y = rng.normal(size=30)
    got = gaxpy_device(A, x, y)
    want = gaxpy(A, x, y)
    assert np.allclose(got, want, atol=1e-5)


def test_plan_metrics(rng):
    A, S = random_csc(rng, 64, 64, density=0.1)
    plan = spmv_plan(A, mode="ell")
    assert plan.flops == 2 * A.nnz
    assert plan.bytes_min <= plan.bytes_padded


def test_auto_mode_picks_something(rng):
    A, S = random_csc(rng, 64, 64, density=0.1)
    plan = spmv_plan(A, mode="auto")
    assert plan.mode in ("ell", "bell", "sell")
    x = rng.normal(size=64)
    assert np.allclose(np.asarray(plan.apply(x)), S.toarray() @ x, atol=1e-4)


def test_dia_spmv_matches_host(rng):
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    n = 100
    S = sp.diags([np.full(n, 4.0), -np.ones(n - 1), -np.ones(n - 1),
                  -np.ones(n - 7)], [0, 1, -1, 7], format="csc")
    S.sort_indices()
    A = CSCMatrix(n, n, S.indptr, S.indices, S.data)
    plan = spmv_plan(A, mode="dia")
    assert plan.mode == "dia"
    x = rng.normal(size=n)
    assert np.allclose(np.asarray(plan.apply(x)), S.toarray() @ x,
                       atol=1e-5)


def test_dia_rectangular(rng):
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    S = sp.diags([np.ones(8), 2 * np.ones(8)], [0, 3],
                 shape=(8, 11), format="csc")
    S.sort_indices()
    A = CSCMatrix(8, 11, S.indptr, S.indices, S.data)
    plan = spmv_plan(A, mode="dia")
    x = rng.normal(size=11)
    assert np.allclose(np.asarray(plan.apply(x)), S.toarray() @ x,
                       atol=1e-5)


def test_auto_picks_dia_for_stencil(rng):
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    n = 64
    S = sp.diags([np.full(n, 5.0), -np.ones(n - 1), -np.ones(n - 1),
                  -np.ones(n - 8), -np.ones(n - 8)], [0, 1, -1, 8, -8],
                 format="csc")
    S.sort_indices()
    A = CSCMatrix(n, n, S.indptr, S.indices, S.data)
    plan = spmv_plan(A, mode="auto")
    assert plan.mode == "dia"


def test_spmm_apply_many(rng):
    A, S = random_csc(rng, 40, 33, density=0.2)
    X = rng.normal(size=(33, 6))
    for mode in ("ell", "dia" if False else "ell"):
        pass
    plan = spmv_plan(A, mode="ell")
    Y = np.asarray(plan.apply_many(X))
    assert np.allclose(Y, S.toarray() @ X, atol=1e-4)
    # DIA path too
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    n = 32
    S2 = sp.diags([np.full(n, 4.0), -np.ones(n - 1)], [0, 1], format="csc")
    S2.sort_indices()
    A2 = CSCMatrix(n, n, S2.indptr, S2.indices, S2.data)
    plan2 = spmv_plan(A2, mode="dia")
    X2 = rng.normal(size=(n, 3))
    Y2 = np.asarray(plan2.apply_many(X2))
    assert np.allclose(Y2, S2.toarray() @ X2, atol=1e-5)


def test_dia_pallas_kernel(rng, monkeypatch):
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    monkeypatch.setenv("TPUSPARSE_PALLAS_DIA", "1")
    n = 700
    S = sp.diags([np.full(n, 6.0), -np.ones(n - 1), -np.ones(n - 1),
                  -np.ones(n - 25), -np.ones(n - 25)], [0, 1, -1, 25, -25],
                 format="csc")
    S.sort_indices()
    A = CSCMatrix(n, n, S.indptr, S.indices, S.data)
    plan = spmv_plan(A, mode="dia")
    x = rng.normal(size=n)
    y = np.asarray(plan.apply(x))
    assert np.allclose(y, S.toarray() @ x, atol=1e-4)


def test_sell_windowed_gather(rng):
    """General-pattern SELL kernel (kernels.sell_spmv): RCM + windowed
    lane gathers + COO spill must reproduce the host gaxpy exactly
    (VERDICT r1 item 6)."""
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    from tpusparse.core.ops import gaxpy
    n = 900
    # irregular: random local graph + a few long-range edges (spill path)
    rows, cols = [], []
    for i in range(n):
        for d in rng.integers(1, 40, size=4):
            rows.append(i)
            cols.append((i + int(d)) % n)
    rows += [0, 1, 2]
    cols += [n - 1, n // 2, n - 3]
    v = rng.normal(size=len(rows))
    M = sp.coo_matrix((v, (rows, cols)), shape=(n, n)).tocsc()
    M = (M + M.T + sp.eye(n) * 8).tocsc()
    M.sort_indices()
    A = CSCMatrix(n, n, M.indptr, M.indices, M.data)
    plan = spmv_plan(A, mode="sell")
    assert plan.mode == "sell"
    x = rng.normal(size=n)
    y = np.asarray(plan.apply(x))
    yref = gaxpy(A, x, np.zeros(n))
    assert np.abs(y - yref).max() / np.abs(yref).max() < 1e-5
    # gaxpy contract and auto selection
    y2 = np.asarray(plan.gaxpy(x, np.ones(n)))
    assert np.allclose(y2, yref + 1.0, atol=1e-4)


def test_sell_kernel_versions_match(rng, monkeypatch):
    """Both SELL kernels (v1 broadcast-row, v2 sublane-aligned) compute
    the same product; v2 is the default (one gather per window tile per
    sub-step instead of eight)."""
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    from tpusparse.device.spmv import spmv_plan
    n = 3000
    M = sp.random(n, n, density=0.002, random_state=7, format="csc")
    M = (M + M.T + sp.eye(n) * 5).tocsc()
    M.sort_indices()
    A = CSCMatrix(n, n, M.indptr, M.indices, M.data)
    x = rng.normal(size=n).astype(np.float32)
    yref = M @ x
    ys = {}
    for ver in ("1", "2"):
        monkeypatch.setenv("TPUSPARSE_SELL_KERNEL", ver)
        plan = spmv_plan(A, mode="sell")
        assert plan.mode == "sell"
        ys[ver] = np.asarray(plan.apply(x))
        err = np.abs(ys[ver] - yref).max() / np.abs(yref).max()
        assert err < 1e-5
    assert np.allclose(ys["1"], ys["2"], rtol=1e-5, atol=1e-6)


def test_sell_apply_permuted(rng):
    """apply_permuted computes P A P' @ xp — the steady-state iterative
    op; consistency: apply(x) == ipermute(apply_permuted(permute(x)))."""
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    from tpusparse.device.spmv import spmv_plan
    n = 2000
    M = sp.random(n, n, density=0.003, random_state=3, format="csc")
    M = (M + M.T + sp.eye(n) * 5).tocsc()
    M.sort_indices()
    A = CSCMatrix(n, n, M.indptr, M.indices, M.data)
    plan = spmv_plan(A, mode="sell")
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(plan.apply(x))
    p = plan.perm
    yp = np.asarray(plan.apply_permuted(x[p]))
    y2 = np.empty(n, np.float32)
    y2[p] = yp          # scatter back: y[p[i]] = yp[i]
    assert np.allclose(y, y2, rtol=1e-5, atol=1e-6)


def test_sell_identity_first_ordering(rng):
    """Identity-first SELL ordering (VERDICT r4 item 7): an input that
    is ALREADY low-bandwidth keeps the identity permutation (one-shot
    apply then runs with ZERO n-sized permutation transports), while a
    shuffled copy of the same matrix engages RCM — and both reproduce
    the host gaxpy."""
    import scipy.sparse as sp
    from tpusparse.core import CSCMatrix
    from tpusparse.core.ops import gaxpy
    from tpusparse.device.spmv import spmv_plan
    n = 16384
    # 16 column tiles: small n is trivially identity-coverable (any
    # <=4096-column matrix fits max_tw window slots outright), so the
    # shuffle case needs enough tiles that coverage can actually fail.
    # banded: bandwidth 12 — every 128-row block's columns live in at
    # most two 1024-tiles, so identity coverage holds
    diags = [rng.normal(size=n - abs(k)) for k in range(-12, 13)]
    M = sp.diags(diags, list(range(-12, 13)), format="csc")
    M = (M + M.T + sp.eye(n) * 30).tocsc()
    M.sort_indices()
    A = CSCMatrix(n, n, M.indptr, M.indices, M.data)
    plan = spmv_plan(A, mode="sell")
    assert plan.mode == "sell"
    assert np.array_equal(plan.perm, np.arange(n))
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(plan.apply(x))
    yref = gaxpy(A, x, np.zeros(n))
    assert np.abs(y - yref).max() / np.abs(yref).max() < 1e-5

    # the same matrix under a random symmetric shuffle: identity
    # windows can't cover, RCM must engage (and recover the band)
    q = rng.permutation(n)
    Ms = M[q][:, q].tocsc()
    Ms.sort_indices()
    As = CSCMatrix(n, n, Ms.indptr, Ms.indices, Ms.data)
    plan_s = spmv_plan(As, mode="sell")
    assert plan_s.mode == "sell"
    assert not np.array_equal(plan_s.perm, np.arange(n))
    ys = np.asarray(plan_s.apply(x))
    ysref = gaxpy(As, x, np.zeros(n))
    assert np.abs(ys - ysref).max() / np.abs(ysref).max() < 1e-5


# ------------------------------------------------------- seg (power-law)
def _ba_graph(n, m0=4, seed=0):
    """Barabasi-Albert preferential attachment (power-law degrees)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    repeated = list(range(m0))
    rows, cols = [], []
    for v in range(m0, n):
        tg = (list(range(m0)) if v == m0
              else rng.choice(repeated, size=m0))
        for t in tg:
            rows.append(v)
            cols.append(int(t))
            repeated.append(int(t))
            repeated.append(v)
    S = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    S = (S + S.T + sp.eye(n)).tocsc()
    S.sort_indices()
    from tpusparse.core import CSCMatrix
    return CSCMatrix(n, n, S.indptr, S.indices, S.data), S


def test_seg_spmv_power_law(rng):
    """VERDICT r2 item 6: power-law rows auto-select the segmented-sum
    path — zero spill, bounded padding, correct product."""
    A, S = _ba_graph(3000)
    deg = np.bincount(A.indices, minlength=A.m)
    assert deg.max() >= 8 * np.median(deg[deg > 0])  # genuinely heavy
    plan = spmv_plan(A, mode="auto")
    assert plan.mode == "seg"
    assert plan.spill == 0
    assert plan.waste_ratio < 0.5
    x = rng.normal(size=A.n)
    y = np.asarray(plan.apply(x))
    assert np.allclose(y, S @ x, atol=1e-4, rtol=1e-4)


def test_seg_vs_sell_on_heavy_tail(rng):
    """The SELL packing spills heavily on the same matrix — the stats
    probe must route heavy tails away from it."""
    A, S = _ba_graph(3000)
    seg = spmv_plan(A, mode="seg")
    sell = spmv_plan(A, mode="sell")
    if sell.mode == "sell":                  # pallas stack available
        assert sell.spill / A.nnz > 0.05
    assert seg.spill == 0
    assert seg.bytes_padded <= 2 * (A.nnz * 8 + (A.m + A.n) * 4)


def test_seg_mode_not_selected_for_uniform(rng):
    A, S = random_spd(rng, 200, density=0.05)
    plan = spmv_plan(A, mode="auto")
    assert plan.mode != "seg"


def test_seg_gaxpy_and_many(rng):
    A, S = _ba_graph(1000, seed=2)
    plan = spmv_plan(A, mode="seg")
    X = rng.normal(size=(A.n, 3))
    Y = np.asarray(plan.apply_many(X))
    assert np.allclose(Y, S @ X, atol=1e-4, rtol=1e-4)


def test_sell_sort_permute_matches_gather(rng, monkeypatch):
    """The sort-based permutation transport (VERDICT r3 item 6:
    lax.sort_key_val with the inverse perm as keys, 2.3x the relay's
    serialized gather rate) is exactly the gather path's result."""
    from tpusparse.core import csc_from_dense
    from tpusparse.device.spmv import spmv_plan
    n = 256
    d = (rng.random((n, n)) < 0.03) * rng.normal(size=(n, n))
    d = d + d.T + np.eye(n) * 10
    A = csc_from_dense(d)
    x = rng.normal(size=n)
    monkeypatch.setenv("TPUSPARSE_SELL_PERMUTE", "gather")
    pg = spmv_plan(A, mode="sell")
    yg = np.asarray(pg.apply(x))
    monkeypatch.setenv("TPUSPARSE_SELL_PERMUTE", "sort")
    ps = spmv_plan(A, mode="sell")
    ys = np.asarray(ps.apply(x))
    assert np.array_equal(yg, ys)
    assert np.allclose(ys, d @ x, atol=1e-3)
