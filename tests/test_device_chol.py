"""Device block-tiled Cholesky vs host oracle and the reference residual
contract."""

import numpy as np
import pytest

from tpusparse.core import csc_from_dense
from tpusparse.device.chol_tpu import TpuCholesky, plan_cholesky
from helpers import random_spd, resid


@pytest.mark.parametrize("n,block", [(20, 8), (48, 16), (100, 32)])
def test_tpu_cholesky_solve(rng, n, block):
    A, S = random_spd(rng, n, density=0.15)
    F = TpuCholesky(A, order=1, block=block)
    assert F.factor()
    b = 1.0 + np.arange(n) / n
    x = F.solve(b)
    assert resid(S.toarray(), x, b) < 1e-13


def test_tpu_cholesky_factor_matches_host(rng):
    n = 24
    A, S = random_spd(rng, n, density=0.25)
    F = TpuCholesky(A, order=0, block=8)
    assert F.factor()
    # reconstruct L from the pool and check L L' = A (order 0: no perm)
    plan = F.plan
    nbB = plan.nb * plan.B
    L = np.zeros((nbB, nbB))
    for k in range(plan.nb):
        blk = np.asarray(F.pool[plan.diag_id[k]])
        L[k * plan.B:(k + 1) * plan.B, k * plan.B:(k + 1) * plan.B] = \
            np.tril(blk)
        for r, sid in zip(plan.off_rows[k], plan.off_ids[k]):
            L[r * plan.B:(r + 1) * plan.B,
              k * plan.B:(k + 1) * plan.B] = np.asarray(F.pool[sid])
    rec = (L @ L.T)[:n, :n]
    assert np.allclose(rec, S.toarray(), atol=1e-3)


def test_tpu_cholesky_not_spd(rng):
    d = np.eye(6)
    d[4, 4] = -1.0
    A = csc_from_dense(d)
    F = TpuCholesky(A, order=0, block=8)
    assert not F.factor()


def test_plan_stats(rng):
    A, S = random_spd(rng, 64, density=0.1)
    plan = plan_cholesky(A, order=1, block=16)
    assert plan.lnz > 0
    assert plan.flops_padded >= plan.flops_true
    assert 0.0 <= plan.waste_ratio < 1.0


def test_refinement_reaches_reference_grade(rng):
    # moderately conditioned matrix: raw f32 is ~1e-6; refinement must
    # reach the reference's ~1e-14 contract
    n = 60
    A, S = random_spd(rng, n, density=0.2)
    F = TpuCholesky(A, order=1)
    F.factor()
    b = rng.normal(size=n)
    x_raw = F._solve_f32(b)
    x_ref = F.solve(b)
    assert resid(S.toarray(), x_ref, b) < 1e-14
    assert resid(S.toarray(), x_ref, b) <= resid(S.toarray(), x_raw, b)


def test_pallas_tile_cholesky_kernel(rng):
    import jax.numpy as jnp
    from tpusparse.device.kernels import chol_tiles
    for B in (8, 32):
        X = rng.normal(size=(4, B, B)).astype(np.float32)
        spd = np.einsum("tij,tkj->tik", X, X) + B * np.eye(
            B, dtype=np.float32)
        L = np.asarray(chol_tiles(jnp.asarray(spd)))
        oracle = np.linalg.cholesky(spd.astype(np.float64))
        assert np.abs(L - oracle).max() / np.abs(oracle).max() < 1e-5


def test_pallas_chol_path_in_scan(rng, monkeypatch):
    monkeypatch.setenv("TPUSPARSE_PALLAS_CHOL", "1")
    from tpusparse.device import chol_tpu
    chol_tpu._SCAN_CACHE.clear()
    A, S = random_spd(rng, 80, density=0.1)
    F = chol_tpu.TpuCholesky(A, order=1, block=8, use_scan=True)
    assert F.factor()
    b = rng.normal(size=80)
    x = F.solve(b)
    assert resid(S.toarray(), x, b) < 1e-13
    chol_tpu._SCAN_CACHE.clear()


def test_solve_many_batched(rng):
    n = 60
    A, S = random_spd(rng, n, density=0.15)
    F = TpuCholesky(A, order=1, block=8, use_scan=True)
    assert F.factor()
    B = rng.normal(size=(n, 5))
    X = F.solve_many(B)
    for j in range(5):
        assert resid(S.toarray(), X[:, j], B[:, j]) < 1e-13
    # unrolled path too
    F2 = TpuCholesky(A, order=0, block=16, use_scan=False)
    assert F2.factor()
    X2 = F2.solve_many(B)
    for j in range(5):
        assert resid(S.toarray(), X2[:, j], B[:, j]) < 1e-13


def test_cholsol_supernodal_engine(rng, monkeypatch):
    from tpusparse.device import solvers as dev_solvers
    monkeypatch.setenv("TPUSPARSE_CHOL_ENGINE", "supernodal")
    n = 40
    A, S = random_spd(rng, n, density=0.2)
    b = rng.normal(size=n)
    ok, x = dev_solvers.cholsol(1, A, b)
    assert ok
    assert resid(S.toarray(), x, b) < 1e-13


def test_pallas_trsm_kernel(rng):
    import jax.numpy as jnp
    from tpusparse.device.kernels import trsm_tiles
    W, R, nt = 16, 32, 3
    L = np.tril(rng.normal(size=(W, W))).astype(np.float32)
    np.fill_diagonal(L, rng.normal(size=W) + 4)
    X = rng.normal(size=(nt, R, W)).astype(np.float32)
    Y = np.asarray(trsm_tiles(jnp.asarray(L), jnp.asarray(X)))
    oracle = X.astype(np.float64) @ np.linalg.inv(L.astype(np.float64)).T
    assert np.abs(Y - oracle).max() / np.abs(oracle).max() < 1e-5


def test_pallas_trsm_path_in_scan(rng, monkeypatch):
    monkeypatch.setenv("TPUSPARSE_PALLAS_TRSM", "1")
    monkeypatch.setenv("TPUSPARSE_PALLAS_CHOL", "1")
    from tpusparse.device import chol_tpu
    chol_tpu._SCAN_CACHE.clear()
    A, S = random_spd(rng, 80, density=0.1)
    F = chol_tpu.TpuCholesky(A, order=1, block=8, use_scan=True)
    assert F.factor()
    b = rng.normal(size=80)
    assert resid(S.toarray(), F.solve(b), b) < 1e-13
    chol_tpu._SCAN_CACHE.clear()
