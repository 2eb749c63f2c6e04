"""Structured-graph stress tests for the symbolic layer: pathological
shapes (paths, stars, cliques, grids, bipartite-heavy) where quotient
graph/matching bugs like to hide."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from tpusparse.core import CSCMatrix, csc_from_dense
from tpusparse.symbolic import amd, dmperm, etree, maxtrans, post, counts, scc, sprank
from tpusparse.numeric import cholsol
from helpers import resid


def _spdify(pattern):
    d = pattern.astype(float)
    d = d + d.T
    np.fill_diagonal(d, np.abs(d).sum(axis=1) + 1.0)
    return d


def graph_cases():
    n = 24
    path = np.zeros((n, n), bool)
    for i in range(n - 1):
        path[i, i + 1] = True
    star = np.zeros((n, n), bool)
    star[0, 1:] = True
    clique = np.ones((n, n), bool)
    grid = np.zeros((n, n), bool)
    g = 4
    for i in range(n):
        if (i + 1) % g:
            grid[i, i + 1] = True
        if i + g < n:
            grid[i, i + g] = True
    two_cliques = np.zeros((n, n), bool)
    two_cliques[:12, :12] = True
    two_cliques[12:, 12:] = True
    return {"path": path, "star": star, "clique": clique, "grid": grid,
            "two_cliques": two_cliques}


@pytest.mark.parametrize("name", list(graph_cases()))
def test_amd_and_cholsol_on_structured_graphs(name):
    d = _spdify(graph_cases()[name])
    A = csc_from_dense(d)
    n = A.n
    for order in (0, 1):
        p = amd(order, A)
        if order:
            assert np.array_equal(np.sort(p), np.arange(n)), name
        b = 1.0 + np.arange(n) / n
        ok, x = cholsol(order, A, b)
        assert ok, (name, order)
        assert resid(d, x, b) < 1e-12, (name, order)


@pytest.mark.parametrize("name", list(graph_cases()))
def test_etree_counts_consistency(name):
    d = _spdify(graph_cases()[name])
    A = csc_from_dense(np.triu(d))
    parent = etree(A)
    c = counts(A, parent, post(parent))
    # counts must sum to nnz(L) of an actual factorization
    from tpusparse.symbolic import schol
    from tpusparse.numeric import chol
    Afull = csc_from_dense(d)
    S = schol(0, Afull)
    N = chol(Afull, S)
    assert int(c.sum()) == N.L.nnz == S.lnz


def test_maxtrans_bipartite_pathologies(rng):
    # block of all-zeros columns; duplicated columns; single nonzero row
    d = np.zeros((10, 10))
    d[:, :5] = rng.random((10, 5))
    A = csc_from_dense(d)
    assert sprank(A) == 5
    d2 = np.zeros((8, 8))
    d2[3, :] = 1.0
    A2 = csc_from_dense(d2)
    assert sprank(A2) == 1
    # permutation matrix: perfect matching
    P = np.eye(12)[rng.permutation(12)]
    A3 = csc_from_dense(P)
    jm, im = maxtrans(A3)
    assert np.all(jm >= 0) and np.all(im >= 0)
    D = dmperm(A3)
    assert D.nb == 12                      # all singleton blocks


def test_scc_cycle_and_dag(rng):
    n = 9
    # one big cycle: single SCC
    d = np.zeros((n, n))
    for i in range(n):
        d[(i + 1) % n, i] = 1.0
    res = scc(csc_from_dense(d))
    assert res.nb == 1
    # strict DAG: n SCCs in topological (block upper) order
    d2 = np.triu(rng.random((n, n)), 1)
    res2 = scc(csc_from_dense(d2))
    assert res2.nb == n
