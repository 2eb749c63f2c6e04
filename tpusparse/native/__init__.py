"""ctypes bindings for the native host planner (planner.cpp).

Built lazily with g++ on first import (no pip deps, per the environment
contract); every entry point has a pure-Python fallback in
tpusparse.symbolic, so the framework works without a toolchain.
Set TPUSPARSE_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "etree", "post", "counts", "amd_core",
           "rowpatterns", "chol_numeric", "lsolve", "ltsolve",
           "ss_pairs", "edf", "maxtrans_core", "scc_core",
           "dmperm_core"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libtsplanner.so")
_SRC = os.path.join(_HERE, "planner.cpp")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("TPUSPARSE_NO_NATIVE"):
        return None
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    I = ctypes.c_int64
    IP = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.ts_etree.argtypes = [I, I, IP, IP, ctypes.c_int, IP]
    lib.ts_post.argtypes = [I, IP, IP]
    lib.ts_counts.argtypes = [I, I, IP, IP, IP, IP, ctypes.c_int, IP]
    lib.ts_amd_core.argtypes = [I, IP, IP, IP]
    lib.ts_amd_core.restype = ctypes.c_int
    lib.ts_rowpatterns.argtypes = [I, IP, IP, IP, IP, IP]
    DP = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ts_chol_numeric.argtypes = [I, IP, IP, DP, IP, IP, IP, DP]
    lib.ts_chol_numeric.restype = ctypes.c_long
    lib.ts_lsolve.argtypes = [I, IP, IP, DP, DP]
    lib.ts_ltsolve.argtypes = [I, IP, IP, DP, DP]
    lib.ts_ss_pairs.argtypes = [I, I, IP, IP, IP, IP, IP, ctypes.c_int,
                                IP, IP, IP, IP, IP, IP, IP, IP, IP, IP,
                                IP]
    lib.ts_edf.argtypes = [I, I, IP, IP, I, IP]
    lib.ts_edf.restype = ctypes.c_int64
    lib.ts_amalg.argtypes = [I, IP, IP, IP, IP, ctypes.c_double, I, I,
                             ctypes.c_int, IP, IP, IP, IP]
    lib.ts_ss_finalize.argtypes = [I, IP, IP, IP, IP, IP, IP, IP, IP]
    lib.ts_invert.argtypes = [I, IP, IP, IP, IP]
    lib.ts_sympat.argtypes = [I, IP, IP, IP, IP]
    lib.ts_sympat.restype = ctypes.c_int64
    lib.ts_maxtrans_core.argtypes = [I, I, IP, IP, I, IP, IP]
    lib.ts_scc_core.argtypes = [I, IP, IP, IP, IP]
    lib.ts_scc_core.restype = ctypes.c_int64
    lib.ts_dmperm_core.argtypes = [I, I, IP, IP, IP, IP, IP, IP, IP, IP,
                                   IP, IP]
    lib.ts_dmperm_core.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def etree(m, n, indptr, indices, ata: bool):
    lib = _load()
    parent = np.empty(n, dtype=np.int64)
    lib.ts_etree(m, n, _c64(indptr), _c64(indices), int(ata), parent)
    return parent


def post(parent):
    lib = _load()
    n = len(parent)
    order = np.empty(n, dtype=np.int64)
    lib.ts_post(n, _c64(parent), order)
    return order


def counts(m, n, indptr, indices, parent, porder, ata: bool):
    lib = _load()
    out = np.empty(n, dtype=np.int64)
    lib.ts_counts(m, n, _c64(indptr), _c64(indices), _c64(parent),
                  _c64(porder), int(ata), out)
    return out


def amd_core(n, Cp, Ci):
    lib = _load()
    perm = np.empty(max(n, 1), dtype=np.int64)
    rc = lib.ts_amd_core(n, _c64(Cp), _c64(Ci), perm)
    if rc != 0:
        raise RuntimeError("native AMD failed")
    return perm[:n]


def rowpatterns(n, indptr, indices, parent, total):
    """All cs_ereach row patterns of L in one pass; ``total`` = nnz of the
    strictly-lower L pattern (= sum(counts) - n)."""
    lib = _load()
    rowptr = np.empty(n + 1, dtype=np.int64)
    entries = np.empty(max(int(total), 1), dtype=np.int64)
    lib.ts_rowpatterns(n, _c64(indptr), _c64(indices), _c64(parent),
                       rowptr, entries)
    return rowptr, entries[:rowptr[n]]


def chol_numeric(n, Cp, Ci, Cx, cp, parent):
    """Native up-looking Cholesky; returns (Li, Lx) or None if not SPD."""
    lib = _load()
    lnz = int(cp[n])
    Li = np.zeros(max(lnz, 1), dtype=np.int64)
    Lx = np.zeros(max(lnz, 1), dtype=np.float64)
    rc = lib.ts_chol_numeric(n, _c64(Cp), _c64(Ci),
                             np.ascontiguousarray(Cx, np.float64),
                             _c64(cp), _c64(parent), Li, Lx)
    if rc != 0:
        return None
    return Li, Lx


def lsolve(Lp, Li, Lx, b):
    lib = _load()
    x = np.array(b, dtype=np.float64)
    lib.ts_lsolve(len(Lp) - 1, _c64(Lp), _c64(Li),
                  np.ascontiguousarray(Lx, np.float64), x)
    return x


def ltsolve(Lp, Li, Lx, b):
    lib = _load()
    x = np.array(b, dtype=np.float64)
    lib.ts_ltsolve(len(Lp) - 1, _c64(Lp), _c64(Li),
                   np.ascontiguousarray(Lx, np.float64), x)
    return x


def invert_patterns(n, rowptr, entries):
    """Row patterns -> column patterns (planner.cpp ts_invert):
    O(nnz) counting sort, rows ascending per column."""
    lib = _load()
    colptr = np.empty(n + 1, np.int64)
    colrows = np.empty(max(int(rowptr[n]), 1), np.int64)
    lib.ts_invert(n, _c64(rowptr), _c64(entries), colptr, colrows)
    return colptr, colrows[:colptr[n]]


def sympat(n, Ap, Ai):
    """Pattern of A + A' minus the diagonal (planner.cpp ts_sympat);
    returns (Cp, Ci) with sorted columns."""
    lib = _load()
    Cp = np.empty(n + 1, np.int64)
    Ci = np.empty(max(2 * int(Ap[n]), 1), np.int64)
    cnz = lib.ts_sympat(n, _c64(Ap), _c64(Ai), Cp, Ci)
    return Cp, Ci[:cnz]


def ss_finalize(pr_d, pr_s, Iptr, Lptr, w, I_pos, I_tgt, L_pos):
    """In-place offset resolution for ss_pairs output (planner.cpp
    ts_ss_finalize); arrays must be int64 C-contiguous."""
    lib = _load()
    lib.ts_ss_finalize(len(pr_d), _c64(pr_d), _c64(pr_s), _c64(Iptr),
                       _c64(Lptr), _c64(w), I_pos, I_tgt, L_pos)


def amalg(starts, colptr, colrows, cnt, tau, small_w, wmax):
    """Relaxed supernode amalgamation (planner.cpp ts_amalg).  Returns
    (mstarts, odptr, odcat): merged group boundaries and ragged merged
    od row lists."""
    lib = _load()
    ng0 = len(starts) - 1
    starts = _c64(starts)
    colptr = _c64(colptr)
    colrows = _c64(colrows)
    cnt = _c64(cnt)
    sizes = np.zeros(2, np.int64)
    z = np.zeros(1, np.int64)
    lib.ts_amalg(ng0, starts, colptr, colrows, cnt, float(tau),
                 int(small_w), int(wmax), 0, sizes, z, z, z)
    ng, nod = int(sizes[0]), int(sizes[1])
    mstarts = np.empty(ng + 1, np.int64)
    odptr = np.empty(ng + 1, np.int64)
    odcat = np.empty(max(nod, 1), np.int64)
    lib.ts_amalg(ng0, starts, colptr, colrows, cnt, float(tau),
                 int(small_w), int(wmax), 1, sizes, mstarts, odptr,
                 odcat)
    return mstarts, odptr, odcat[:nod]


def maxtrans_core(m, n, Cp, Ci, korder, jmatch):
    """Cheap/augment maximum-transversal pass (planner.cpp
    ts_maxtrans_core) over columns ``korder`` of the m x n pattern;
    ``jmatch`` (int64, len m, pre-initialized) is updated IN PLACE."""
    lib = _load()
    korder = _c64(korder)
    lib.ts_maxtrans_core(m, n, _c64(Cp), _c64(Ci), len(korder), korder,
                         jmatch)


def scc_core(n, Ap, Ai):
    """Kosaraju SCC (planner.cpp ts_scc_core); returns (p, r, nb)."""
    lib = _load()
    p = np.empty(max(n, 1), np.int64)
    r = np.empty(n + 1, np.int64)
    nb = lib.ts_scc_core(n, _c64(Ap), _c64(Ai), p, r)
    return p[:n], r[:nb + 1], int(nb)


def dmperm_core(m, n, Ap, Ai, jmatch, imatch):
    """Coarse + fine Dulmage-Mendelsohn given a maximum matching
    (planner.cpp ts_dmperm_core); returns (p, q, r, s, nb, rr, cc)."""
    lib = _load()
    p = np.empty(max(m, 1), np.int64)
    q = np.empty(max(n, 1), np.int64)
    r = np.empty(m + 6, np.int64)
    s = np.empty(n + 6, np.int64)
    rr = np.empty(5, np.int64)
    cc = np.empty(5, np.int64)
    nb = lib.ts_dmperm_core(m, n, _c64(Ap), _c64(Ai), _c64(jmatch),
                            _c64(imatch), p, q, r, s, rr, cc)
    return (p[:m], q[:n], r[:nb + 1].copy(), s[:nb + 1].copy(), int(nb),
            rr, cc)


def edf(steps, rel, dl, U0):
    """EDF greedy placement (planner.cpp ts_edf): units sorted by
    deadline, rel/dl zero-based in [0, steps).  Returns (U, step_of)."""
    lib = _load()
    nu = len(rel)
    step_of = np.empty(max(nu, 1), dtype=np.int64)
    U = lib.ts_edf(nu, steps, _c64(rel), _c64(dl), int(U0), step_of)
    return int(U), step_of[:nu]


def ss_pairs(npan, n, c0, w, rowptr, rows, col2p):
    """Superscan update-pair construction (see planner.cpp ts_ss_pairs).
    Returns (pr_d, pr_s, Iptr, Lptr, I_pos, I_tgt, I_dg, L_pos, L_col,
    levels) — local coordinates, I_tgt < 0 encodes od position -(q+1)."""
    lib = _load()
    c0 = _c64(c0); w = _c64(w); rowptr = _c64(rowptr)
    rows = _c64(rows); col2p = _c64(col2p)
    sizes = np.zeros(3, dtype=np.int64)
    z = np.zeros(1, dtype=np.int64)
    lib.ts_ss_pairs(npan, n, c0, w, rowptr, rows, col2p, 0, sizes,
                    z, z, z, z, z, z, z, z, z, z)
    npairs, nI, nL = (int(x) for x in sizes)
    pr_d = np.empty(max(npairs, 1), np.int64)
    pr_s = np.empty(max(npairs, 1), np.int64)
    Iptr = np.empty(npairs + 1, np.int64)
    Lptr = np.empty(npairs + 1, np.int64)
    I_pos = np.empty(max(nI, 1), np.int64)
    I_tgt = np.empty(max(nI, 1), np.int64)
    I_dg = np.empty(max(nI, 1), np.int64)
    L_pos = np.empty(max(nL, 1), np.int64)
    L_col = np.empty(max(nL, 1), np.int64)
    levels = np.empty(max(npan, 1), np.int64)
    lib.ts_ss_pairs(npan, n, c0, w, rowptr, rows, col2p, 1, sizes,
                    pr_d, pr_s, Iptr, Lptr, I_pos, I_tgt, I_dg,
                    L_pos, L_col, levels)
    return (pr_d[:npairs], pr_s[:npairs], Iptr, Lptr, I_pos[:nI],
            I_tgt[:nI], I_dg[:nI], L_pos[:nL], L_col[:nL],
            levels[:npan])
