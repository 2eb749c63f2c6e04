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
