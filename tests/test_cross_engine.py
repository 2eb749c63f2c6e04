"""Cross-engine consistency fuzz: every device engine must agree with
the host f64 engine (the reference-equivalent) on the same problems —
random dense-ish, banded, and grid families (SURVEY.md §4 strategy)."""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from helpers import resid


def _families(rng):
    out = []
    # random sparse SPD
    d = rng.normal(size=(70, 70)) * (rng.random((70, 70)) < 0.15)
    d = d @ d.T + 70 * np.eye(70)
    out.append(("random", d, csc_from_dense(d)))
    # banded SPD
    n = 120
    b = np.zeros((n, n))
    for k in range(3):
        v = rng.normal(size=n - k)
        b[np.arange(n - k), np.arange(k, n)] += v
        b[np.arange(k, n), np.arange(n - k)] += v
    b = b @ b.T + 30 * n * np.eye(n)
    out.append(("banded", b, csc_from_dense(b)))
    # small 2D grid
    import scipy.sparse as sp
    g = 9
    n = g * g
    ex = -np.ones(n - 1)
    ex[np.arange(1, n) % g == 0] = 0
    S = sp.diags([4.0 * np.ones(n), ex, ex, -np.ones(n - g),
                  -np.ones(n - g)], [0, 1, -1, g, -g], format="csc")
    S.sort_indices()
    out.append(("grid2d", S.toarray(),
                CSCMatrix(n, n, S.indptr, S.indices, S.data)))
    return out


def test_chol_engines_agree(rng):
    from tpusparse.numeric import cholsol as host_cholsol
    from tpusparse.device.chol_tpu import TpuCholesky
    from tpusparse.device.supernodal import SupernodalCholesky
    from tpusparse.device.superscan import SuperscanCholesky
    for name, d, A in _families(rng):
        n = A.n
        bvec = rng.normal(size=n)
        ok, xh = host_cholsol(1, A, bvec.copy())
        assert ok, name
        for mk in (lambda: TpuCholesky(A, order=1, block=8),
                   lambda: SupernodalCholesky(A, order=1, wmax=16,
                                              tau=0.9, small_w=4),
                   lambda: SuperscanCholesky(A, order=1, wmax=16,
                                             tau=0.9, small_w=4)):
            F = mk()
            assert F.factor(), name
            xd = F.solve(bvec)
            assert np.allclose(xh, xd, atol=1e-8), \
                (name, type(F).__name__)


def test_lu_engines_agree(rng):
    from tpusparse.numeric import lusol as host_lusol
    from tpusparse.device.lu_tpu import TpuLU
    for name, d, A in _families(rng):
        # make it unsymmetric but solvable
        du = d.copy()
        du[0, -1] += 0.5 * np.abs(d).max()
        Au = csc_from_dense(du)
        n = Au.n
        bvec = rng.normal(size=n)
        ok, xh = host_lusol(1, Au, bvec.copy())
        assert ok, name
        for sparse_min in (10**9, 32):      # dense path, then sparse path
            F = TpuLU(Au, order=2, sparse_min=sparse_min)
            assert F.factor(), (name, sparse_min)
            xd = F.solve(bvec)
            assert np.allclose(xh, xd, atol=1e-7), (name, sparse_min)


def test_spmv_modes_agree(rng):
    from tpusparse.core.ops import gaxpy
    from tpusparse.device.spmv import spmv_plan
    for name, d, A in _families(rng):
        x = rng.normal(size=A.n)
        yref = gaxpy(A, x, np.zeros(A.m))
        for mode in ("ell", "dia", "sell"):
            try:
                plan = spmv_plan(A, mode=mode)
            except Exception:
                continue                      # mode not applicable
            y = np.asarray(plan.apply(x))
            assert np.abs(y - yref).max() / max(np.abs(yref).max(),
                                                1e-30) < 1e-4, \
                (name, mode)


def test_superscan_variants_agree(rng, monkeypatch):
    """All superscan scheduling variants (pair pipeline, aggregated
    updg/upda, Pallas diag-block kernel) produce the same solutions as
    the host engine across the fuzz families."""
    from tpusparse.numeric import cholsol as host_cholsol
    from tpusparse.device.superscan import SuperscanCholesky
    for name, d, A in _families(rng):
        n = A.n
        bvec = rng.normal(size=n)
        ok, xh = host_cholsol(1, A, bvec.copy())
        assert ok, name
        for env in ({}, {"TPUSPARSE_AGG": "1"},
                    {"TPUSPARSE_PALLAS_CHOL": "1"},
                    {"TPUSPARSE_AGG": "1",
                     "TPUSPARSE_PALLAS_CHOL": "1"}):
            for k in ("TPUSPARSE_AGG", "TPUSPARSE_PALLAS_CHOL"):
                monkeypatch.delenv(k, raising=False)
            for k, v in env.items():
                monkeypatch.setenv(k, v)
            F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9,
                                  small_w=4)
            assert F.factor(), (name, env)
            xd = F.solve(bvec)
            assert np.allclose(xh, xd, atol=1e-8), (name, env)
