"""Device SpGEMM and rank-1 update/downdate on the device factor."""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.device.chol_tpu import TpuCholesky
from tpusparse.device.spgemm import spgemm, spgemm_plan
from helpers import random_csc, random_spd, resid


def test_spgemm_matches_host(rng):
    A, SA = random_csc(rng, 37, 22, density=0.15)
    B, SB = random_csc(rng, 22, 41, density=0.15)
    C = spgemm(A, B, block=16)
    assert np.allclose(C.todense(), SA.toarray() @ SB.toarray(), atol=1e-4)


def test_spgemm_plan_reuse(rng):
    A, SA = random_csc(rng, 20, 20, density=0.2)
    B, SB = random_csc(rng, 20, 20, density=0.2)
    plan = spgemm_plan(A, B, block=8)
    C1 = plan.apply_to_csc()
    C2 = plan.apply_to_csc()
    assert np.allclose(C1.todense(), C2.todense())
    assert plan.flops_padded > 0


def test_spgemm_empty(rng):
    A = CSCMatrix(5, 4, np.zeros(5, np.int64), np.zeros(0, np.int64),
                  np.zeros(0))
    B, _ = random_csc(rng, 4, 3, density=0.3)
    C = spgemm(A, B, block=8)
    assert C.nnz == 0


def test_device_updown_roundtrip(rng):
    n = 24
    A, S = random_spd(rng, n, density=0.3)
    F = TpuCholesky(A, order=1, block=8)
    assert F.factor()
    b = rng.normal(size=n)
    # w with the pattern of an existing column of L, mapped back to
    # original coordinates (demo3 recipe)
    L, _ = F._extract_L()
    k = n // 2
    seg = L.indices[L.indptr[k]:L.indptr[k + 1]]
    wperm = np.zeros(n)
    wperm[seg] = rng.random(seg.size)
    w = np.zeros(n)
    if F.plan.perm is not None:
        w[F.plan.perm] = wperm
    else:
        w = wperm
    d0 = S.toarray()
    assert F.updown(+1, w)
    x = F.solve(b)
    assert resid(d0 + np.outer(w, w), x, b) < 1e-13
    assert F.updown(-1, w)
    x = F.solve(b)
    assert resid(d0, x, b) < 1e-13


def test_device_updown_stays_on_device(rng, monkeypatch):
    """VERDICT r1 item 5: updown must not download/re-upload the factor
    — _extract_L (the old host round-trip) must never run, and the pool
    must remain a device array."""
    import jax
    from tpusparse.device import TpuCholesky
    d = rng.normal(size=(24, 24)) * (rng.random((24, 24)) < 0.4)
    d = d @ d.T + 24 * np.eye(24)
    A = csc_from_dense(d)
    F = TpuCholesky(A, order=1, block=8)
    assert F.factor()

    def boom(self):
        raise AssertionError("factor left the device")

    monkeypatch.setattr(TpuCholesky, "_extract_L", boom)
    w = np.zeros(24)
    k = 12
    widx = [i for i in range(24) if d[i, k] != 0 and i >= k]
    w[widx] = rng.random(len(widx))
    assert F.updown(+1, w)
    assert isinstance(F.pool, jax.Array)
    dn = d + np.outer(w, w)
    b = rng.normal(size=24)
    x = F.solve(b)
    assert resid(dn, x, b) < 1e-12


def test_device_updown_failure(rng):
    d = np.eye(4)
    A = csc_from_dense(d)
    F = TpuCholesky(A, order=0, block=8)
    assert F.factor()
    w = np.array([2.0, 0.0, 0.0, 0.0])
    assert not F.updown(-1, w)
