"""Scan-ified supernodal engine (tpusparse.device.superscan): correctness
vs the dense oracle and the host f64 engine, schedule invariants, and
failure contracts.  Reference semantics: csparse::cs_chol / cs_cholsol
(SURVEY.md §2.2)."""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.device.superscan import SuperscanCholesky, plan_superscan
from helpers import resid


def _spd(rng, n, dens=0.25):
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < dens)
    d = d @ d.T + n * np.eye(n)
    return d, csc_from_dense(d)


def test_small_spd_solve(rng):
    d, A = _spd(rng, 40)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    b = rng.normal(size=40)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n,dens", [(25, 0.5), (90, 0.15), (180, 0.05)])
def test_fuzz_sizes_orders(rng, order, n, dens):
    d, A = _spd(rng, n, dens)
    F = SuperscanCholesky(A, order=order, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_band_matrix(rng):
    # banded SPD: long thin elimination tree — the chain regime the
    # scan engine exists for (levels >> segments)
    n = 400
    d = np.zeros((n, n))
    for k in range(4):
        v = rng.normal(size=n - k)
        d[np.arange(n - k), np.arange(k, n)] += v
        d[np.arange(k, n), np.arange(n - k)] += v
    d = d @ d.T + 10 * n * np.eye(n)
    A = csc_from_dense(d)
    F = SuperscanCholesky(A, order=0, wmax=16, tau=0.9, small_w=4,
                          max_segments=6)
    p = F.plan
    # compiled-program count << tree depth (cluster mode: segments are
    # chunks, but their shape signatures cluster to <= max_segments)
    assert p.nlevels > 3 * p.n_program_sigs
    assert F.factor()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_matches_host_engine(rng):
    from tpusparse.numeric import cholsol
    d, A = _spd(rng, 60, 0.2)
    b = rng.normal(size=60)
    ok, xh = cholsol(1, A, b.copy())
    assert ok
    F = SuperscanCholesky(A, order=1, wmax=16)
    assert F.factor()
    xd = F.solve(b)
    assert np.allclose(xh, xd, atol=1e-9)


def test_not_positive_definite(rng):
    d = np.eye(8)
    d[4, 4] = -1.0
    A = csc_from_dense(d + 0.01 * np.ones((8, 8)))
    F = SuperscanCholesky(A, order=0, wmax=8)
    assert F.factor() is False
    with pytest.raises(ValueError):
        F.solve(np.ones(8))


def test_plan_invariants(rng):
    d, A = _spd(rng, 120, 0.1)
    p = plan_superscan(A, order=1, wmax=16, tau=0.9, small_w=4)
    # segments partition the step axis (levels exploded by load)
    assert p.segments[0].lo == 0
    assert p.segments[-1].hi == p.nsteps >= p.nlevels
    for a, b2 in zip(p.segments, p.segments[1:]):
        assert a.hi == b2.lo
    # flop accounting: issued >= true, waste in [0, 1)
    assert p.flops_padded >= p.flops_true > 0
    assert 0.0 <= p.waste_ratio < 1.0
    # every panel's columns are covered exactly once
    cov = np.zeros(120, dtype=int)
    for pl in p.panels:
        cov[pl.c0:pl.c0 + pl.w] += 1
    assert np.all(cov == 1)


def test_waste_beats_level_engine_default(rng):
    """The redesign's reason to exist: on a 3D-grid-like problem the
    scan engine's issued-flop waste must beat the r1 level engine's
    0.93 by a wide margin (VERDICT r1 item 2 says <= 0.5; small test
    problems are noisier than the bench, so assert 0.75 here)."""
    import scipy.sparse as sp
    g = 12
    n = g ** 3
    ex = -np.ones(n - 1); ex[np.arange(1, n) % g == 0] = 0
    ey = -np.ones(n - g); ey[((np.arange(g, n) // g) % g) == 0] = 0
    ez = -np.ones(n - g * g)
    S = sp.diags([7.0 * np.ones(n), ex, ex, ey, ey, ez, ez],
                 [0, 1, -1, g, -g, g * g, -g * g], format="csc")
    S.sort_indices()
    A = CSCMatrix(n, n, S.indptr, S.indices, S.data)
    p = plan_superscan(A, order=1, max_segments=24)
    assert p.waste_ratio < 0.75
    F = SuperscanCholesky(A, order=1, max_segments=24)
    assert F.factor()
    b = np.ones(n)
    x = F.solve(b)
    assert resid(S.toarray(), x, b) < 1e-12


def test_metrics(rng):
    d, A = _spd(rng, 50, 0.3)
    F = SuperscanCholesky(A, order=1, wmax=16)
    m = F.metrics().values
    assert m["chol_engine"] == "superscan"
    assert m["chol_panels"] > 0 and m["chol_segments"] >= 1


def test_solve_many(rng):
    d, A = _spd(rng, 50, 0.25)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    B = rng.normal(size=(50, 3))
    X = F.solve_many(B)
    for j in range(3):
        assert resid(d, X[:, j], B[:, j]) < 1e-12


def test_updown_device_resident(rng):
    """Superscan rank-1 update/downdate: runs on the flat pools without
    downloading the factor; round-trips vs fresh factorizations."""
    import jax
    d, A = _spd(rng, 36, 0.35)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    # w with the pattern of a column of L (extracted once, host side)
    L = F.extract_L()
    k = 18
    perm = F.plan.perm
    kp = int(np.flatnonzero(perm == k)[0])
    widx = perm[L.indices[L.indptr[kp]:L.indptr[kp + 1]]]
    w = np.zeros(36)
    w[widx] = rng.random(widx.size)
    assert F.updown(+1, w)
    assert all(isinstance(v, jax.Array) for v in F.pools.values())
    dn = d + np.outer(w, w)
    b = rng.normal(size=36)
    x = F.solve_host(b)
    assert resid(dn, x, b) < 1e-12
    # downdate back
    assert F.updown(-1, w)
    x = F.solve_host(b)
    assert resid(d, x, b) < 1e-12
    # failed downdate keeps the old pools and returns False
    w2 = np.zeros(36)
    w2[widx] = 40.0 * np.abs(d).max()
    old = F.pools
    assert F.updown(-1, w2) is False
    assert F.pools is old


def test_aggregated_update_path(rng, monkeypatch):
    """TPUSPARSE_AGG=1 routes updates through the multifrontal-style
    updg (Delta GEMM into scratch) + upda (2-D gather/scatter apply)
    phases; results must match the default per-pair pipeline and the
    dense oracle.  The path is off by default (measured tie — see the
    planner comment / BASELINE.md aggregation experiment)."""
    monkeypatch.setenv("TPUSPARSE_AGG", "1")
    for n, dens in ((40, 0.3), (90, 0.12)):
        d, A = _spd(rng, n, dens)
        F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
        plan = F.plan
        kinds = {k[0] for s in plan.segments for k in s.xs}
        assert "updg" in kinds and "upda" in kinds
        assert any(s.scratch_rows > 0 for s in plan.segments)
        assert F.factor()
        b = rng.normal(size=n)
        x = F.solve(b)
        assert resid(d, x, b) < 1e-12
        # device solve path too (scan solve shares the factor pools)
        x2 = F.solve_host(b)
        assert resid(d, x2, b) < 1e-12


def test_pallas_chol_tiles_in_superscan(rng, monkeypatch):
    """TPUSPARSE_PALLAS_CHOL=1 routes the batched diagonal-block
    factorizations through the Pallas tile kernel (interpret mode off
    TPU) — results match the XLA path."""
    monkeypatch.setenv("TPUSPARSE_PALLAS_CHOL", "1")
    d, A = _spd(rng, 64, 0.2)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    b = rng.normal(size=64)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_pallas_batched_trsm_in_superscan(rng, monkeypatch):
    """TPUSPARSE_PALLAS_TRSM=1 routes the per-panel trsm phases through
    the batched-Lkk Pallas kernel (VERDICT r2 item 8; interpret mode
    off TPU) — results match the XLA triangular_solve path."""
    monkeypatch.setenv("TPUSPARSE_PALLAS_TRSM", "1")
    d, A = _spd(rng, 96, 0.15)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    b = rng.normal(size=96)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_trsm_tiles_batched_kernel(rng):
    import jax
    import jax.numpy as jnp
    from tpusparse.device.kernels.trsm_tile import trsm_tiles_batched
    nt, R, W = 4, 16, 32
    L = (np.tril(rng.normal(size=(nt, W, W)))
         + 3 * np.eye(W)).astype(np.float32)
    X = rng.normal(size=(nt, R, W)).astype(np.float32)
    Y = np.asarray(trsm_tiles_batched(jnp.asarray(L), jnp.asarray(X)))
    Yref = np.asarray(jax.lax.linalg.triangular_solve(
        jnp.asarray(L), jnp.asarray(X), left_side=False, lower=True,
        transpose_a=True))
    assert np.abs(Y - Yref).max() / np.abs(Yref).max() < 1e-5


def test_solve_schedule_byte_splitting(rng, monkeypatch):
    """TPUSPARSE_SOLVE_XS_MAX_BYTES splits solve scan programs along
    the step axis (device-fault guard for coarse factor segmentations)
    without changing results."""
    d, A = _spd(rng, 128, 0.1)
    b = rng.normal(size=128)
    F = SuperscanCholesky(A, order=1, wmax=16, max_segments=4)
    assert F.factor()
    x_ref = F.solve(b)
    monkeypatch.setenv("TPUSPARSE_SOLVE_XS_MAX_BYTES", "2048")
    F2 = SuperscanCholesky(A, order=1, wmax=16, max_segments=4)
    assert F2.factor()
    from tpusparse.device.superscan import _solve_xs
    assert len(_solve_xs(F2.plan)) > len(F2.plan.segments)
    x_split = F2.solve(b)
    assert resid(d, x_split, b) < 1e-12
    assert np.allclose(x_ref, x_split, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("mode", ["cluster", "dp"])
def test_segmentation_modes_agree(rng, mode, monkeypatch):
    """Both segmentation modes (VERDICT r3 item 2: cluster = fixed-S
    chunks clustered to <= TPUSPARSE_SEG_PROGRAMS shape signatures; dp
    = one program per DP segment) factor and solve to reference
    grade, and the cluster mode respects its program budget."""
    monkeypatch.setenv("TPUSPARSE_SEG_MODE", mode)
    d, A = _spd(rng, 220, 0.05)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4,
                          max_segments=12)
    p = F.plan
    if mode == "cluster":
        assert p.n_program_sigs <= 8          # TPUSPARSE_SEG_PROGRAMS
    assert F.factor()
    b = rng.normal(size=A.n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_switch_ladders_match_mask_mode(rng, monkeypatch):
    """The runtime-sized switch ladders (lax.switch over batch slices)
    must be numerically IDENTICAL to full-capacity mask mode — idle
    slots contribute exact zeros either way."""
    d, A = _spd(rng, 150, 0.08)
    b = rng.normal(size=A.n)
    monkeypatch.setenv("TPUSPARSE_SWITCH", "0")
    F0 = SuperscanCholesky(A, order=1, wmax=16, small_w=4)
    assert F0.factor()
    x0 = np.asarray(F0._solve_f32(b))
    monkeypatch.setenv("TPUSPARSE_SWITCH", "1")
    monkeypatch.setenv("TPUSPARSE_SWITCH_MIN_FLOPS", "0")  # force on
    F1 = SuperscanCholesky(A, order=1, wmax=16, small_w=4)
    assert any(s.ladders for s in F1.plan.segments)
    assert F1.factor()
    x1 = np.asarray(F1._solve_f32(b))
    assert np.array_equal(x0, x1)              # bit-identical f32


def test_solve_slot_cap_splits_steps(rng, monkeypatch):
    """TPUSPARSE_SOLVE_SLOT_CAP splits high-capacity solve steps along
    the slot axis (VERDICT r3 item 3: the axon worker faults on
    oversized per-step extents at coarse segmentation).  The capped
    schedule must produce the bit-identical f32 solve."""
    from tpusparse.device.superscan import _solve_xs
    d, A = _spd(rng, 200, 0.1)
    b = rng.normal(size=A.n)
    F = SuperscanCholesky(A, order=1, wmax=16, small_w=4)
    assert F.factor()
    x0 = np.asarray(F._solve_f32(b))
    u0 = max(next(iter(dd.values())).shape[1]
             for s in _solve_xs(F.plan) for dd in s.values())
    assert u0 > 1                      # something to cap
    monkeypatch.setenv("TPUSPARSE_SOLVE_SLOT_CAP", "1")
    sched = _solve_xs(F.plan)
    assert all(next(iter(dd.values())).shape[1] <= 1
               for s in sched for dd in s.values())
    F._solve_sched = None              # rebuild with the cap
    F._sched_dev_cache = None if hasattr(F, "_sched_dev_cache") else None
    x1 = np.asarray(F._solve_f32(b))
    # not bit-identical (the od scatter-adds re-associate across the
    # sub-steps) but f32-close, and the refined solve is reference-grade
    assert np.allclose(x0, x1, rtol=3e-4, atol=1e-6)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12
