"""Bottleneck numerical transversal (tpusparse.symbolic.transversal) —
the MC64-style static-pivot preprocessing built on csparse::cs_maxtrans
(cs_maxtrans.c)."""

import numpy as np
import pytest

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.symbolic.transversal import (bottleneck_transversal,
                                            diag_dominance)


def test_diag_dominance_probe():
    d = np.array([[4.0, -1.0], [-1.0, 4.0]])
    assert diag_dominance(csc_from_dense(d)) == 1.0
    d2 = np.array([[1e-8, -1.0], [-1.0, 4.0]])
    assert diag_dominance(csc_from_dense(d2)) < 1e-7


def test_weak_diagonal_matched_to_large(rng):
    # anti-diagonal-dominant: every large entry is off-diagonal
    n = 30
    d = np.eye(n) * 1e-9
    p_true = np.random.default_rng(0).permutation(n)
    d[p_true, np.arange(n)] = 2.0 + np.arange(n) * 0.01
    A = csc_from_dense(d)
    p, alpha = bottleneck_transversal(A)
    assert alpha > 0.5
    B = d[p]                              # rows permuted
    assert diag_dominance(csc_from_dense(B)) > 0.5


def test_structurally_singular_returns_none():
    d = np.zeros((4, 4))
    d[:, 0] = 1.0
    d[0, :] = 1.0                          # rank-deficient pattern
    assert bottleneck_transversal(csc_from_dense(d)) is None


def test_completion_keeps_large_matches(rng):
    # one column has ONLY a tiny entry: completion must use it without
    # degrading the other columns' large matches
    n = 12
    d = np.zeros((n, n))
    d[np.arange(n), np.arange(n)] = 3.0
    d[5, 5] = 0.0
    d[5, 7] = 4.0                          # row 5 also large in col 7
    d[5, 5] = 1e-10                        # tiny diagonal only
    A = csc_from_dense(d)
    out = bottleneck_transversal(A)
    assert out is not None
    p, alpha = out
    B = d[p]
    assert (np.abs(np.diag(B)) > 0).all()  # perfect transversal


def test_identity_when_diag_dominant(rng):
    d = np.diag(5.0 + np.arange(6.0))
    d[0, 1] = 1.0
    p, alpha = bottleneck_transversal(csc_from_dense(d))
    assert np.array_equal(p, np.arange(6))


def test_maxtrans_warm_start_parity(rng):
    import scipy.sparse as sp
    from tpusparse.symbolic.dmperm import maxtrans
    S = sp.random(40, 40, density=0.12,
                  random_state=np.random.RandomState(5), format="csc")
    A = CSCMatrix(40, 40, S.indptr, S.indices, None)
    jm, im = maxtrans(A)
    # warm start from an empty matching must reach the same cardinality
    jm2, im2 = maxtrans(A, imatch0=np.full(40, -1, np.int64))
    assert (im >= 0).sum() == (im2 >= 0).sum()
