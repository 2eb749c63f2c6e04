"""Native planner (C++/ctypes) parity vs the pure-Python implementations."""

import os

import numpy as np
import pytest

from tpusparse import native
from tpusparse.core import fkeep
from tpusparse.symbolic.etree import ereach
from helpers import random_csc, random_spd

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native planner not built")


def _python_impls():
    """Re-import the Python fallbacks with native disabled."""
    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    try:
        import importlib

        import tpusparse.native as nat
        nat._lib = None
        import importlib; et = importlib.import_module("tpusparse.symbolic.etree")
        yield et
    finally:
        del os.environ["TPUSPARSE_NO_NATIVE"]
        import tpusparse.native as nat
        nat._lib = None


def test_native_etree_post_counts_parity(rng):
    import importlib; et = importlib.import_module("tpusparse.symbolic.etree")
    for trial in range(5):
        A, S = random_spd(rng, 25, density=0.2)
        parent_n = native.etree(A.m, A.n, A.indptr, A.indices, False)
        os.environ["TPUSPARSE_NO_NATIVE"] = "1"
        native._lib = None
        try:
            parent_p = et.etree(A)
            post_p = et.post(parent_p)
            counts_p = et.counts(A, parent_p, post_p)
        finally:
            del os.environ["TPUSPARSE_NO_NATIVE"]
            native._lib = None
        assert np.array_equal(parent_n, parent_p)
        assert np.array_equal(native.post(parent_n), post_p)
        assert np.array_equal(
            native.counts(A.m, A.n, A.indptr, A.indices, parent_n, post_p,
                          False), counts_p)


def test_native_counts_ata_parity(rng):
    import importlib; et = importlib.import_module("tpusparse.symbolic.etree")
    A, S = random_csc(rng, 20, 12, density=0.3)
    parent = native.etree(A.m, A.n, A.indptr, A.indices, True)
    porder = native.post(parent)
    got = native.counts(A.m, A.n, A.indptr, A.indices, parent, porder, True)
    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    native._lib = None
    try:
        want = et.counts(A, et.etree(A, ata=True),
                         et.post(parent), ata=True)
    finally:
        del os.environ["TPUSPARSE_NO_NATIVE"]
        native._lib = None
    assert np.array_equal(got, want)


def test_native_amd_parity(rng):
    from tpusparse.symbolic.amd import _build_quotient_input, amd
    worse = 0
    for trial in range(6):
        n = 30
        A, S = random_spd(rng, n, density=0.15)
        p_native = amd(1, A)            # native path (available)
        os.environ["TPUSPARSE_NO_NATIVE"] = "1"
        native._lib = None
        try:
            p_python = amd(1, A)
        finally:
            del os.environ["TPUSPARSE_NO_NATIVE"]
            native._lib = None
        # both must be valid permutations; the native core mirrors the
        # Python one exactly, so they must agree
        assert np.array_equal(np.sort(p_native), np.arange(n))
        assert np.array_equal(p_native, p_python)


def test_native_rowpatterns(rng):
    from tpusparse.symbolic.etree import counts, etree, post
    A, S = random_spd(rng, 20, density=0.25)
    U = fkeep(A, lambda i, j, x: i <= j)
    parent = etree(U)
    cnt = counts(U, parent, post(parent))
    total = int(cnt.sum()) - A.n            # strictly-lower pattern size
    rowptr, entries = native.rowpatterns(A.n, U.indptr, U.indices, parent,
                                         total)
    for k in range(A.n):
        got = entries[rowptr[k]:rowptr[k + 1]].tolist()
        want = ereach(U, k, parent).tolist()
        assert got == want


def test_native_chol_numeric_parity(rng):
    from tpusparse.numeric.chol import chol
    from tpusparse.symbolic import schol
    for trial in range(4):
        A, S = random_spd(rng, 30, density=0.2)
        Sy = schol(1, A)
        N_native = chol(A, Sy)                 # native path (available)
        os.environ["TPUSPARSE_NO_NATIVE"] = "1"
        native._lib = None
        try:
            N_python = chol(A, Sy)
        finally:
            del os.environ["TPUSPARSE_NO_NATIVE"]
            native._lib = None
        assert np.allclose(N_native.L.todense(), N_python.L.todense(),
                           atol=1e-12)
    # not-SPD must return None through the native path too
    d = np.eye(5); d[2, 2] = -1.0
    from tpusparse.core import csc_from_dense
    A2 = csc_from_dense(d)
    assert chol(A2, schol(0, A2)) is None


def test_native_trisolve_parity(rng):
    from tpusparse.numeric import chol as _c, lsolve, ltsolve
    from tpusparse.symbolic import schol
    A, S = random_spd(rng, 25, density=0.25)
    Sy = schol(1, A)
    N = _c(A, Sy)
    b = rng.normal(size=25)
    x1 = lsolve(N.L, b)
    y1 = ltsolve(N.L, b)
    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    native._lib = None
    try:
        x2 = lsolve(N.L, b)
        y2 = ltsolve(N.L, b)
    finally:
        del os.environ["TPUSPARSE_NO_NATIVE"]
        native._lib = None
    assert np.allclose(x1, x2) and np.allclose(y1, y2)


def test_ss_pairs_matches_python(rng):
    """Native superscan pair builder vs the pure-Python loop: identical
    plans (schedules compared array-for-array)."""
    import os
    import tpusparse.native as native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    from tpusparse.core import csc_from_dense
    from tpusparse.device.superscan import plan_superscan
    for n, dens in ((40, 0.4), (150, 0.08)):
        d = rng.normal(size=(n, n)) * (rng.random((n, n)) < dens)
        d = d @ d.T + n * np.eye(n)
        A = csc_from_dense(d)
        p_native = plan_superscan(A, order=1, wmax=16, tau=0.9,
                                  small_w=4)
        os.environ["TPUSPARSE_NO_NATIVE"] = "1"
        native._lib = None
        try:
            p_python = plan_superscan(A, order=1, wmax=16, tau=0.9,
                                      small_w=4)
        finally:
            del os.environ["TPUSPARSE_NO_NATIVE"]
            native._lib = None
        assert p_native.flops_padded == p_python.flops_padded
        assert p_native.nlevels == p_python.nlevels
        assert len(p_native.segments) == len(p_python.segments)
        for sa, sb in zip(p_native.segments, p_python.segments):
            assert sorted(sa.xs) == sorted(sb.xs)
            for k in sa.xs:
                for nm in sa.xs[k]:
                    assert np.array_equal(sa.xs[k][nm], sb.xs[k][nm]), \
                        (k, nm)


def test_maxtrans_scc_dmperm_match_python(rng):
    """Native transversal trio (ts_maxtrans_core / ts_scc_core /
    ts_dmperm_core) vs the pure-Python implementations: identical
    matchings, permutations, and block structure on fuzz patterns
    (reference: cs_maxtrans.c / cs_scc.c / cs_dmperm.c)."""
    import importlib
    D = importlib.import_module("tpusparse.symbolic.dmperm")
    from tpusparse.core.matrix import CSCMatrix

    def rand_pattern(m, n, density, seed):
        r = np.random.default_rng(seed)
        nnz = max(1, int(m * n * density))
        i = r.integers(0, m, nnz)
        j = r.integers(0, n, nnz)
        key = np.unique(j.astype(np.int64) * m + i)
        j, i = key // m, key % m
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(j, minlength=n), out=indptr[1:])
        return CSCMatrix(m, n, indptr, i.astype(np.int64), None)

    for seed in range(12):
        m = int(rng.integers(1, 60))
        n = int(rng.integers(1, 60))
        for dens in (0.03, 0.15, 0.4):
            A = rand_pattern(m, n, dens, seed * 7 + int(dens * 100))
            sd = seed % 3
            r1 = D.dmperm(A, sd)
            jm1, im1 = D.maxtrans(A, sd)
            s1 = D.scc(A) if m == n else None
            os.environ["TPUSPARSE_NO_NATIVE"] = "1"
            native._lib = None
            try:
                r2 = D.dmperm(A, sd)
                jm2, im2 = D.maxtrans(A, sd)
                s2 = D.scc(A) if m == n else None
            finally:
                del os.environ["TPUSPARSE_NO_NATIVE"]
                native._lib = None
            assert np.array_equal(jm1, jm2) and np.array_equal(im1, im2)
            assert r1.nb == r2.nb
            for f in ("p", "q", "r", "s", "rr", "cc"):
                assert np.array_equal(getattr(r1, f), getattr(r2, f)), f
            if s1 is not None:
                assert (np.array_equal(s1.p, s2.p)
                        and np.array_equal(s1.r, s2.r)
                        and s1.nb == s2.nb)


def test_maxtrans_warmstart_native(rng):
    """Warm-started maxtrans (the MC64-analog entry point) through the
    native core keeps the partial matching and matches the cold run's
    cardinality."""
    import importlib
    D = importlib.import_module("tpusparse.symbolic.dmperm")
    from tpusparse.core.matrix import CSCMatrix

    r = np.random.default_rng(3)
    m = n = 50
    nnz = 400
    i = r.integers(0, m, nnz)
    j = r.integers(0, n, nnz)
    key = np.unique(j.astype(np.int64) * m + i)
    j, i = key // m, key % m
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(j, minlength=n), out=indptr[1:])
    A = CSCMatrix(m, n, indptr, i.astype(np.int64), None)
    jm_cold, im_cold = D.maxtrans(A, 0)
    # partial matching: first half of the cold matching
    im0 = np.full(n, -1, np.int64)
    half = [jj for jj in range(n) if im_cold[jj] >= 0][: n // 4]
    for jj in half:
        im0[jj] = im_cold[jj]
    jm_w, im_w = D.maxtrans(A, 0, imatch0=im0)
    assert (jm_w >= 0).sum() == (jm_cold >= 0).sum()
    # every valid matching property holds
    ok = im_w >= 0
    assert len(np.unique(im_w[ok])) == ok.sum()
