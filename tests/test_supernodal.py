"""Variable-width supernodal Cholesky engine (device/supernodal.py)."""

import numpy as np
import pytest

from tpusparse.core import csc_from_dense
from tpusparse.device.supernodal import SupernodalCholesky, plan_supernodal
from helpers import random_spd, resid


@pytest.mark.parametrize("n,dens", [(30, 0.3), (120, 0.1), (250, 0.05)])
def test_supernodal_solve(rng, n, dens):
    A, S = random_spd(rng, n, density=dens)
    F = SupernodalCholesky(A, order=1)
    assert F.factor()
    b = 1.0 + np.arange(n) / n
    x = F.solve(b)
    assert resid(S.toarray(), x, b) < 1e-13


def test_supernodal_beats_fixed_tiles_on_amd(rng):
    from tpusparse.device.chol_tpu import plan_cholesky
    A, S = random_spd(rng, 200, density=0.05)
    ps = plan_supernodal(A, order=1)
    pt = plan_cholesky(A, order=1, block=32)
    assert ps.flops_true == pt.flops_true            # same ordering class
    assert ps.flops_padded < pt.flops_padded         # fewer issued flops
    assert ps.waste_ratio <= pt.waste_ratio + 1e-9


def test_supernodal_not_spd(rng):
    d = np.eye(10)
    d[6, 6] = -3.0
    A = csc_from_dense(d)
    F = SupernodalCholesky(A, order=0)
    assert not F.factor()


def test_supernodal_natural_order(rng):
    A, S = random_spd(rng, 60, density=0.15)
    F = SupernodalCholesky(A, order=0)
    assert F.factor()
    b = rng.normal(size=60)
    assert resid(S.toarray(), F.solve(b), b) < 1e-13


def test_supernodal_plan_stats(rng):
    A, S = random_spd(rng, 100, density=0.1)
    p = plan_supernodal(A, order=1)
    assert p.lnz > 0
    assert 0 <= p.waste_ratio < 1
    assert sum(s.w for s in p.snodes) == 100
    # column coverage is a partition
    assert np.array_equal(np.sort(np.unique(p.col2sn)),
                          np.arange(len(p.snodes)))


def test_supernodal_3d_grid_vs_tiled(rng):
    # the bench configuration in miniature: both engines must agree
    import importlib.util, os as _os
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    A, S = bench.grid_spd_3d(8)            # n=512
    b = 1.0 + np.arange(A.n) / A.n
    from tpusparse.device.chol_tpu import TpuCholesky
    Fs = SupernodalCholesky(A, order=1)
    assert Fs.factor()
    xs = Fs.solve(b)
    Ft = TpuCholesky(A, order=0, block=64)
    assert Ft.factor()
    xt = Ft.solve(b)
    assert resid(S.toarray(), xs, b) < 1e-13
    assert resid(S.toarray(), xt, b) < 1e-13
    assert np.allclose(xs, xt, atol=1e-10)


def test_supernodal_solve_many(rng):
    n = 80
    A, S = random_spd(rng, n, density=0.1)
    F = SupernodalCholesky(A, order=1)
    assert F.factor()
    B = rng.normal(size=(n, 4))
    X = F.solve_many(B)
    for j in range(4):
        assert resid(S.toarray(), X[:, j], B[:, j]) < 1e-13


def test_supernodal_fuzz_compact(rng):
    # durable slice of the deep fuzz: random sizes/densities/orders
    for t in range(6):
        n = int(rng.integers(5, 120))
        dens = float(rng.uniform(0.05, 0.5))
        A, S = random_spd(rng, n, density=dens)
        F = SupernodalCholesky(A, order=int(rng.integers(0, 2)))
        assert F.factor(), (t, n, dens)
        b = rng.normal(size=n)
        assert resid(S.toarray(), F.solve(b), b) < 1e-13
