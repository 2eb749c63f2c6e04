"""cs_* compatibility surface: the reference's public API names and
calling conventions, mapped onto the new engine.

A user of the reference (rwl/CSparse.py — SURVEY.md §2.2 lists every
symbol) can import this module and find every cs_* entry point with the
reference's semantics:

- drivers (cs_cholsol / cs_lusol / cs_qrsol) overwrite ``b`` in place and
  return a success flag (SURVEY.md Appendix A);
- triangular solves mutate ``x`` in place and return the flag;
- cs_gaxpy accumulates into ``y`` in place;
- failures are silent-but-flagged (False/None), never exceptions.

Matrix objects are tpusparse's COOMatrix (triplet) / CSCMatrix rather
than the reference's single dual-mode ``cs`` struct; cs_spalloc
constructs either, selected by the ``triplet`` flag, like the reference.
"""

from __future__ import annotations

import numpy as np

from .core import matrix as _m
from .core import ops as _ops
from .core import filter as _filter
from .core import perm as _perm
from .core import io as _io
# NOTE: the subpackage __init__ files re-export functions under the same
# names as their defining modules (tpusparse.symbolic.etree is BOTH a
# module and, as a package attribute, the etree function) — so bind the
# callables directly from their defining modules, never the shadowed
# module attributes.
from .symbolic.amd import amd as _amd
from .symbolic.dmperm import (dmperm as _dmperm, maxtrans as _maxtrans,
                              scc as _scc)
from .symbolic.etree import (counts as _counts, ereach as _ereach,
                             etree as _etree, leaf as _leaf, post as _post,
                             tdfs as _tdfs)
from .symbolic import plan as _plan
from .symbolic.reach import dfs as _dfs, reach as _reach
from .numeric.chol import chol as _chol, updown as _updown
from .numeric.lu import lu as _lu
from .numeric.qr import happly as _happly, house as _house, qr as _qr
from .numeric import solvers as _solvers
from .numeric import trisolve as _tri

__all__ = [
    "cs_spalloc", "cs_entry", "cs_compress", "cs_dupl", "cs_fkeep",
    "cs_droptol", "cs_dropzeros", "cs_transpose", "cs_add", "cs_multiply",
    "cs_gaxpy", "cs_norm", "cs_permute", "cs_symperm", "cs_pinv", "cs_pvec",
    "cs_ipvec", "cs_randperm", "cs_load", "cs_print", "cs_cumsum",
    "cs_scatter",
    "cs_etree", "cs_post", "cs_tdfs", "cs_counts", "cs_ereach", "cs_leaf",
    "cs_dfs", "cs_reach", "cs_amd", "cs_maxtrans", "cs_scc", "cs_dmperm",
    "cs_schol", "cs_chol", "cs_sqr", "cs_lu", "cs_qr", "cs_house",
    "cs_happly", "cs_updown", "cs_lsolve", "cs_ltsolve", "cs_usolve",
    "cs_utsolve", "cs_spsolve", "cs_cholsol", "cs_lusol", "cs_qrsol",
]


# ------------------------------------------------------------------ L0/L1
def cs_spalloc(m, n, nzmax=0, values=True, triplet=False):
    """Allocate a triplet or CSC matrix (reference: csparse::cs_spalloc)."""
    if triplet:
        return _m.COOMatrix(m, n)
    return _m.CSCMatrix(m, n, np.zeros(n + 1, dtype=np.int64),
                        np.zeros(0, dtype=np.int64),
                        np.zeros(0) if values else None)


def cs_entry(T, i, j, x):
    T.entry(i, j, x)
    return True


def cs_compress(T):
    return T.tocsc()


def cs_dupl(A):
    return _filter.dupl(A)


def cs_fkeep(A, fkeep, other=None):
    """Reference passes a per-entry callback fkeep(i, j, aij, other);
    accepts either that or a vectorized predicate."""
    try:
        return _filter.fkeep(A, lambda i, j, x: fkeep(i, j, x, other))
    except (TypeError, ValueError):
        import numpy as _np
        vals = A.data if A.data is not None else _np.ones(A.nnz)
        cols = _np.repeat(_np.arange(A.n), _np.diff(A.indptr))
        mask = _np.array([bool(fkeep(int(ii), int(jj), float(xx), other))
                          for ii, jj, xx in zip(A.indices, cols, vals)])
        return _filter.fkeep(A, lambda i, j, x: mask)


def cs_droptol(A, tol):
    return _filter.droptol(A, tol)


def cs_dropzeros(A):
    return _filter.dropzeros(A)


def cs_transpose(A, values=True):
    return _ops.transpose(A, values)


def cs_add(A, B, alpha=1.0, beta=1.0):
    return _ops.add(A, B, alpha, beta)


def cs_multiply(A, B):
    return _ops.multiply(A, B)


def cs_gaxpy(A, x, y):
    """y += A @ x, mutating y in place (reference: csparse::cs_gaxpy)."""
    y[:] = _ops.gaxpy(A, x, y)
    return True


def cs_norm(A):
    return _ops.norm1(A)


def cs_permute(A, pinv, q, values=True):
    return _ops.permute(A, pinv, q, values)


def cs_symperm(A, pinv, values=True):
    return _ops.symperm(A, pinv, values)


def cs_pinv(p, n=None):
    return _perm.pinv(p)


def cs_pvec(p, b, x=None, n=None):
    out = _perm.pvec(p, b)
    if x is not None:
        x[:len(out)] = out
        return True
    return out


def cs_ipvec(p, b, x=None, n=None):
    out = _perm.ipvec(p, b)
    if x is not None:
        x[:len(out)] = out
        return True
    return out


def cs_randperm(n, seed=0):
    return _perm.randperm(n, seed)


def cs_load(fh):
    return _io.load(fh)


def cs_print(A, brief=True):
    _io.pprint(A, brief)
    return True


def cs_cumsum(c):
    p, total = _ops.cumsum(c)
    return p, total


def cs_scatter(A, j, beta, w, x, mark, C=None, nz=None):
    """Scatter beta*A(:,j) into dense x / pattern w (reference:
    csparse::cs_scatter).  Returns the new entry count; appends new row
    indices to ``C`` (a list here, for composability)."""
    lo, hi = A.indptr[j], A.indptr[j + 1]
    out = C if C is not None else []
    for p in range(lo, hi):
        i = int(A.indices[p])
        aij = A.data[p] if A.data is not None else 1.0
        if w[i] < mark:
            w[i] = mark
            out.append(i)
            if x is not None:
                x[i] = beta * aij
        elif x is not None:
            x[i] += beta * aij
    return len(out) if nz is None else nz + len(out)


# ------------------------------------------------------------------ L2
def cs_etree(A, ata=False):
    return _etree(A, ata)


def cs_post(parent, n=None):
    return _post(parent)


def cs_tdfs(j, k, head, nxt, post, stack):
    return _tdfs(j, k, head, nxt, post, stack)


def cs_counts(A, parent, post, ata=False):
    return _counts(A, parent, post, ata)


def cs_ereach(A, k, parent, s=None, w=None):
    return _ereach(A, k, parent, s, w)


def cs_leaf(i, j, first, maxfirst, prevleaf, ancestor):
    return _leaf(i, j, first, maxfirst, prevleaf, ancestor)


def cs_dfs(j, G, marked, out, pinv=None):
    _dfs(j, G.indptr, G.indices, marked, pinv, out)
    return out


def cs_reach(G, B, k, pinv=None):
    return _reach(G, B, k, pinv)


def cs_amd(order, A):
    return _amd(order, A)


def cs_maxtrans(A, seed=0):
    return _maxtrans(A, seed)


def cs_scc(A):
    return _scc(A)


def cs_dmperm(A, seed=0):
    return _dmperm(A, seed)


# ------------------------------------------------------------------ L3
def cs_schol(order, A):
    return _plan.schol(order, A)


def cs_chol(A, S):
    return _chol(A, S)


def cs_sqr(order, A, qr):
    return _plan.sqr(order, A, qr)


def cs_lu(A, S, tol=1.0):
    return _lu(A, S, tol)


def cs_qr(A, S):
    return _qr(A, S)


def cs_house(x):
    return _house(x)


def cs_happly(V, i, beta, x):
    _happly(V, i, beta, x)
    return True


def cs_updown(L, sigma, C, parent):
    return _updown(L, sigma, C, parent)


def cs_lsolve(L, x):
    x[:] = _tri.lsolve(L, x)
    return True


def cs_ltsolve(L, x):
    x[:] = _tri.ltsolve(L, x)
    return True


def cs_usolve(U, x):
    r = _tri.usolve(U, x)
    if r is None:
        return False                     # zero pivot: b untouched, flagged
    x[:U.n] = r[:U.n]
    return True


def cs_utsolve(U, x):
    r = _tri.utsolve(U, x)
    if r is None:
        return False
    x[:U.n] = r[:U.n]
    return True


def cs_spsolve(G, B, k, pinv=None, lo=True):
    return _tri.spsolve(G, B, k, pinv, lo)


# ------------------------------------------------------------------ L4
def cs_cholsol(order, A, b):
    """Solve SPD A x = b, overwriting b with x; returns ok flag."""
    ok, x = _solvers.cholsol(order, A, b)
    if ok:
        b[:] = x
    return ok


def cs_lusol(order, A, b, tol=1.0):
    ok, x = _solvers.lusol(order, A, b, tol)
    if ok:
        b[:] = x
    return ok


def cs_qrsol(order, A, b):
    """Least-squares/min-norm solve; overwrites b[:n] with x (b must have
    length >= max(m, n) to receive the solution, like the reference's
    workspace convention — pass a max(m,n) buffer)."""
    ok, x = _solvers.qrsol(order, A, b[:A.m])
    if ok:
        b[:A.n] = x
    return ok
