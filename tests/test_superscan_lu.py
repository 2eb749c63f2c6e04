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
