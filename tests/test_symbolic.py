"""Property tests for the symbolic layer (L2) vs brute force and scipy
oracles (SURVEY.md §4: etree/counts vs brute force, dmperm vs
scipy.sparse.csgraph)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from tpusparse.core import CSCMatrix, csc_from_dense, transpose
from tpusparse.symbolic import (amd, counts, dmperm, ereach, etree, maxtrans,
                                post, reach, scc, schol, sprank, sqr)
from helpers import random_csc, random_spd


# ---------------------------------------------------------------- oracles
def etree_brute(Adense):
    """Brute-force etree: parent[j] = min{i > j : L[i,j] != 0} via dense
    Cholesky pattern of A + |A|'|A| regularized."""
    n = Adense.shape[0]
    # full symbolic Cholesky by elimination on the boolean pattern
    pat = (Adense != 0) | np.eye(n, dtype=bool)
    pat = pat | pat.T
    L = np.zeros((n, n), dtype=bool)
    for k in range(n):
        L[k:, k] = pat[k:, k]
        for i in range(k + 1, n):
            if L[i, k]:
                pat[i:, i] |= L[i:, k]
    parent = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        below = np.flatnonzero(L[j + 1:, j])
        if below.size:
            parent[j] = j + 1 + below[0]
    return parent, L


def chol_pattern_counts(Adense):
    _, L = etree_brute(Adense)
    return L.sum(axis=0)


# ----------------------------------------------------------------- tests
def test_etree_vs_brute(rng):
    for _ in range(5):
        A, S = random_spd(rng, 12, density=0.25)
        parent, _ = etree_brute(S.toarray())
        got = etree(A)
        assert np.array_equal(got, parent)


def test_etree_ata_equals_etree_of_ata(rng):
    A, S = random_csc(rng, 15, 9)
    AtA = csc_from_dense((S.T @ S).toarray())
    assert np.array_equal(etree(A, ata=True), etree(AtA))


def test_post_is_valid_postorder(rng):
    A, S = random_spd(rng, 20, density=0.15)
    parent = etree(A)
    p = post(parent)
    assert np.array_equal(np.sort(p), np.arange(20))
    # children appear before parents
    pos = np.empty(20, dtype=int)
    pos[p] = np.arange(20)
    for j in range(20):
        if parent[j] != -1:
            assert pos[j] < pos[parent[j]]


def test_counts_vs_brute(rng):
    for _ in range(5):
        A, S = random_spd(rng, 14, density=0.25)
        parent = etree(A)
        c = counts(A, parent, post(parent))
        assert np.array_equal(c, chol_pattern_counts(S.toarray()))


def test_counts_ata_vs_brute(rng):
    A, S = random_csc(rng, 16, 10, density=0.3)
    parent = etree(A, ata=True)
    c = counts(A, parent, post(parent), ata=True)
    AtA = (S.T @ S).toarray()
    # R of QR(A) has the pattern of chol(A'A)
    assert np.array_equal(c, chol_pattern_counts(AtA))


def test_ereach_matches_L_pattern(rng):
    A, S = random_spd(rng, 14, density=0.25)
    parent, L = etree_brute(S.toarray())
    # ereach wants the upper triangle of A
    from tpusparse.core import fkeep
    U = fkeep(A, lambda i, j, x: i <= j)
    for k in range(14):
        pat = set(ereach(U, k, parent).tolist())
        oracle = set(np.flatnonzero(L[k, :k]).tolist())
        assert pat == oracle


def test_reach_matches_dense_solve_pattern(rng):
    # lower-triangular G: reach of b's pattern = nonzeros of x in Gx=b
    n = 14
    d = np.tril(rng.normal(size=(n, n))) * (rng.random((n, n)) < 0.4)
    np.fill_diagonal(d, rng.normal(size=n) + 3)
    G = csc_from_dense(d)
    b = np.zeros(n)
    b[rng.choice(n, 3, replace=False)] = 1.0
    B = csc_from_dense(b.reshape(-1, 1))
    xs = reach(G, B, 0)
    x = np.linalg.solve(d, b)
    # no-cancellation oracle: x nonzero exactly on the reach set
    assert set(xs.tolist()) == set(np.flatnonzero(x != 0).tolist())
    # topological order: each node appears before nodes that depend on it
    pos = {int(j): i for i, j in enumerate(xs)}
    for j in xs:
        for i in np.flatnonzero(d[:, j] != 0):
            if i != j and int(i) in pos:
                assert pos[int(j)] < pos[int(i)]


def test_maxtrans_vs_scipy(rng):
    for trial in range(8):
        m, n = int(rng.integers(5, 20)), int(rng.integers(5, 20))
        A, S = random_csc(rng, m, n, density=0.15)
        jmatch, imatch = maxtrans(A)
        size = int(np.count_nonzero(jmatch >= 0))
        oracle = csgraph.maximum_bipartite_matching(S.tocsr(), "column")
        assert size == int(np.count_nonzero(oracle >= 0))
        # consistency: matched pairs correspond to actual entries
        d = S.toarray()
        for i in range(m):
            if jmatch[i] >= 0:
                assert d[i, jmatch[i]] != 0
                assert imatch[jmatch[i]] == i


def test_scc_vs_scipy(rng):
    for _ in range(5):
        n = 15
        A, S = random_csc(rng, n, n, density=0.12)
        res = scc(A)
        ncomp, labels = csgraph.connected_components(S, directed=True,
                                                     connection="strong")
        assert res.nb == ncomp
        # blocks = exactly the scipy components
        got = [frozenset(res.p[res.r[b]:res.r[b + 1]].tolist())
               for b in range(res.nb)]
        want = [frozenset(np.flatnonzero(labels == c).tolist())
                for c in range(ncomp)]
        assert sorted(got, key=min) == sorted(want, key=min)
        # p is a permutation
        assert np.array_equal(np.sort(res.p), np.arange(n))


def test_scc_block_triangular(rng):
    # after permutation, the matrix must be block lower triangular
    n = 12
    A, S = random_csc(rng, n, n, density=0.15)
    res = scc(A)
    d = S.toarray()[res.p][:, res.p]
    blk = np.zeros(n, dtype=int)
    for b in range(res.nb):
        blk[res.r[b]:res.r[b + 1]] = b
    i, j = np.nonzero(d)
    # reference SCC ordering: all entries in upper block triangle or diag
    assert np.all(blk[i] <= blk[j])


def test_dmperm_square_nonsingular(rng):
    A, S = random_spd(rng, 10, density=0.3)
    D = dmperm(A, seed=0)
    assert D.rr[3] == 10 and D.cc[3] == 10     # sprank = n
    assert np.array_equal(np.sort(D.p), np.arange(10))
    assert np.array_equal(np.sort(D.q), np.arange(10))


def test_dmperm_btf_structure(rng):
    for seed in (0, 1):
        n = 14
        A, S = random_csc(rng, n, n, density=0.2)
        # make structurally nonsingular by adding the diagonal
        S2 = (S + sp.eye(n)).tocsc()
        A2 = CSCMatrix.fromscipy(S2)
        D = dmperm(A2, seed=seed)
        assert D.rr[3] == n
        d = (S2.toarray() != 0)[D.p][:, D.q]
        blk = np.zeros(n, dtype=int)
        for b in range(D.nb):
            assert D.r[b + 1] - D.r[b] == D.s[b + 1] - D.s[b]
            blk[D.r[b]:D.r[b + 1]] = b
        i, j = np.nonzero(d)
        assert np.all(blk[i] <= blk[j])        # block upper triangular
        # each diagonal block is structurally nonsingular
        for b in range(D.nb):
            sub = d[D.r[b]:D.r[b + 1], D.s[b]:D.s[b + 1]]
            sub_rank = csgraph.maximum_bipartite_matching(
                sp.csr_matrix(sub.astype(float)), "column")
            assert int((sub_rank >= 0).sum()) == sub.shape[0]


def test_dmperm_rectangular_and_singular(rng):
    # rectangular
    A, S = random_csc(rng, 8, 12, density=0.3)
    D = dmperm(A)
    r = sprank(A)
    oracle = csgraph.maximum_bipartite_matching(S.tocsr(), "column")
    assert r == int((oracle >= 0).sum())
    assert D.rr[3] == r and D.cc[3] - (D.cc[1] - D.cc[0]) <= r + D.cc[1]
    # structurally singular square matrix (a zero row)
    d = rng.normal(size=(6, 6)) * (rng.random((6, 6)) < 0.5)
    d[3, :] = 0
    A2 = csc_from_dense(d)
    assert sprank(A2) < 6


def test_amd_valid_and_reduces_fill(rng):
    worse = 0
    for trial in range(10):
        n = 30
        A, S = random_spd(rng, n, density=0.1)
        p = amd(1, A)
        assert p is not None
        assert np.array_equal(np.sort(p), np.arange(n))
        # fill with AMD should beat or match natural order (usually)
        def fill(dense):
            _, L = etree_brute(dense)
            return L.sum()
        d = S.toarray()
        if fill(d[p][:, p]) > fill(d):
            worse += 1
    assert worse <= 2          # AMD may occasionally lose, not usually


def test_amd_orders_2_3(rng):
    A, S = random_csc(rng, 20, 16, density=0.2)
    for order in (2, 3):
        p = amd(order, A)
        assert np.array_equal(np.sort(p), np.arange(16))
    assert amd(0, A) is None


def test_amd_arrowhead():
    # arrowhead matrix: natural order causes full fill; AMD must move the
    # hub (node 0) last
    n = 20
    d = np.eye(n)
    d[0, :] = 1
    d[:, 0] = 1
    A = csc_from_dense(d)
    p = amd(1, A)
    assert p[-1] == 0


def test_schol_lnz_matches_actual(rng):
    A, S = random_spd(rng, 18, density=0.2)
    Sy = schol(0, A)
    _, L = etree_brute(S.toarray())
    assert Sy.lnz == L.sum()
    assert np.array_equal(np.diff(Sy.cp), chol_pattern_counts(S.toarray()))


def test_sqr_qr_vcount(rng):
    A, S = random_csc(rng, 16, 10, density=0.3)
    Sy = sqr(0, A, qr=True)
    assert Sy.m2 >= 16
    assert Sy.unz == chol_pattern_counts((S.T @ S).toarray()).sum()
    # pinv must be a valid permutation of m2 rows
    assert np.array_equal(np.sort(Sy.pinv), np.arange(Sy.pinv.size))
    # lnz (nnz of V) at least n (one per Householder diag)
    assert Sy.lnz >= 10
