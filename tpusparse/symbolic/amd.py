"""Approximate minimum-degree fill-reducing ordering.

Reference: csparse::cs_amd / cs_amd.c (SURVEY.md §2.2) — the largest
single component of the reference (~250 LoC).  This is an independent
implementation of the published AMD algorithm (Amestoy, Davis & Duff,
"An Approximate Minimum Degree Ordering Algorithm", SIAM J. Matrix Anal.
1996; Davis SIAM 2006 ch. 7): quotient graph with supervariables and
elements, element absorption, aggressive absorption, hash-based detection
of indistinguishable nodes, dense-node handling, and iterative elbow-room
garbage collection over a single workspace array.

Order codes match the reference contract (SURVEY.md Appendix A):
  0: natural (returns None)
  1: amd(A + A')        — Cholesky
  2: amd(A'A − dense rows) — LU
  3: amd(A'A)           — QR
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import add, multiply, transpose
from ..core.filter import fkeep
from .etree import tdfs

__all__ = ["amd"]

_IDX = np.int64


def _flip(i):
    return -i - 2


def _build_quotient_input(order: int, A: CSCMatrix, dense: int) -> CSCMatrix:
    """Form the symmetric pattern C the AMD core runs on (reference:
    the preamble of cs_amd.c)."""
    from .. import native
    m, n = A.m, A.n
    if order == 1 and n == m and native.available():
        # C++ fast path (planner.cpp ts_sympat): A + A' pattern union
        # minus the diagonal, already fkeep'd — same output as the
        # generic route below (parity-tested)
        Cp, Ci = native.sympat(n, A.indptr, A.indices)
        return CSCMatrix(n, n, Cp, Ci, None)
    AT = transpose(A, values=False)
    if order == 1 and n == m:
        C = add(A.pattern(), AT, 1.0, 1.0)         # A + A' (pattern union)
    elif order == 2:
        # drop rows of A with > dense entries (they are columns of AT),
        # then C = AT * AT' — the A'A pattern minus dense rows.
        rowlen = np.diff(AT.indptr)
        keepcols = np.flatnonzero(rowlen <= dense)
        # rebuild AT with only the kept columns (dims preserved)
        lens = rowlen[keepcols]
        p = np.zeros(m + 1, dtype=_IDX)
        full = np.zeros(m, dtype=_IDX)
        full[keepcols] = lens
        np.cumsum(full, out=p[1:])
        idx = np.concatenate(
            [AT.indices[AT.indptr[j]:AT.indptr[j + 1]] for j in keepcols]
        ) if keepcols.size else np.zeros(0, dtype=_IDX)
        AT2 = CSCMatrix(n, m, p, idx, None)
        C = multiply(AT2, transpose(AT2, values=False))
    else:
        C = multiply(AT, A.pattern())              # A'A
    # drop the diagonal (reference: cs_fkeep with the diag predicate)
    C = fkeep(C, lambda i, j, x: i != j)
    return C


def amd(order: int, A: CSCMatrix):
    """AMD ordering of A per the ``order`` code; returns the permutation
    p (length n) or None for natural order.  Reference: csparse::cs_amd.

    The returned p is such that C(p, p) has small fill — the same
    convention as the reference (cs_schol applies pinv = cs_pinv(p)).
    """
    if order <= 0 or order > 3:
        return None
    n = A.n
    if n == 0:
        return np.zeros(0, dtype=_IDX)
    dense = max(16, int(10 * np.sqrt(n)))
    dense = min(n - 2, dense)
    C = _build_quotient_input(order, A, dense)
    from .. import native
    if native.available():
        return native.amd_core(n, C.indptr, C.indices)
    cnz = C.nnz
    t = cnz + cnz // 5 + 2 * n                     # elbow room
    # --- workspace (reference allocates 8*(n+1) ints + Ci of size t) ----
    N = n + 1
    Cp = np.zeros(N, dtype=_IDX)
    Cp[:n + 1] = C.indptr
    Ci = np.zeros(max(t, 1), dtype=_IDX)
    Ci[:cnz] = C.indices
    nzmax = Ci.size
    length = np.zeros(N, dtype=_IDX)               # len
    nv = np.ones(N, dtype=_IDX)
    nxt = np.full(N, -1, dtype=_IDX)               # next
    head = np.full(N, -1, dtype=_IDX)
    elen = np.zeros(N, dtype=_IDX)
    degree = np.zeros(N, dtype=_IDX)
    w = np.ones(N, dtype=_IDX)
    hhead = np.full(N, -1, dtype=_IDX)
    last = np.full(N, -1, dtype=_IDX)              # doubles as perm P
    length[:n] = np.diff(Cp[:n + 1])
    length[n] = 0
    degree[:N] = length[:N]
    mark = _wclear(0, 0, w, n)
    elen[n] = -2                                   # n is a dead element
    Cp[n] = -1                                     # n is a root of the tree
    w[n] = 0
    nel = 0
    mindeg = 0
    lemax = 0
    # --- initialize degree lists ---------------------------------------
    for i in range(n):
        d = degree[i]
        if d == 0:                                 # empty node: eliminate
            elen[i] = -2
            nel += 1
            Cp[i] = -1
            w[i] = 0
        elif d > dense:                            # dense node: absorb in n
            nv[i] = 0
            elen[i] = -1
            nel += 1
            Cp[i] = _flip(n)
            nv[n] += 1
        else:
            if head[d] != -1:
                last[head[d]] = i
            nxt[i] = head[d]
            head[d] = i
    # --- main elimination loop ------------------------------------------
    while nel < n:
        # select node of minimum approximate degree
        k = -1
        while mindeg < n:
            k = head[mindeg]
            if k != -1:
                break
            mindeg += 1
        if nxt[k] != -1:
            last[nxt[k]] = -1
        head[mindeg] = nxt[k]                      # remove k from list
        elenk = elen[k]
        nvk = nv[k]
        nel += nvk
        # garbage collection when out of elbow room
        if elenk > 0 and cnz + mindeg >= nzmax:
            for j in range(n):
                p = Cp[j]
                if p >= 0:                         # j is live
                    Cp[j] = Ci[p]                  # save first entry
                    Ci[p] = _flip(j)               # mark start of object j
            q = 0
            p = 0
            while p < cnz:                         # scan memory
                jf = _flip(Ci[p])
                p += 1
                if jf >= 0:                        # found object jf
                    Ci[q] = Cp[jf]                 # restore first entry
                    Cp[jf] = q                     # new start location
                    q += 1
                    for _ in range(length[jf] - 1):
                        Ci[q] = Ci[p]
                        q += 1
                        p += 1
            cnz = q                                # Ci[cnz:] is now free
        # construct new element Lk
        dk = 0
        nv[k] = -nvk                               # flag k as in Lk
        p = Cp[k]
        pk1 = p if elenk == 0 else cnz             # in-place if no elements
        pk2 = pk1
        for k1 in range(1, elenk + 2):
            if k1 > elenk:
                e = k                              # search the nodes of k
                pj = p
                ln = length[k] - elenk
            else:
                e = Ci[p]                          # search the nodes of e
                p += 1
                pj = Cp[e]
                ln = length[e]
            for _ in range(ln):
                i = Ci[pj]
                pj += 1
                nvi = nv[i]
                if nvi <= 0:
                    continue                       # already in Lk or dead
                dk += nvi                          # degree(Lk) += size of i
                nv[i] = -nvi                       # flag i as in Lk
                Ci[pk2] = i
                pk2 += 1
                if nxt[i] != -1:
                    last[nxt[i]] = last[i]
                if last[i] != -1:                  # remove i from deg list
                    nxt[last[i]] = nxt[i]
                else:
                    head[degree[i]] = nxt[i]
            if e != k:
                Cp[e] = _flip(k)                   # absorb e into k
                w[e] = 0                           # e is now dead
        if elenk != 0:
            cnz = pk2                              # element k uses Ci[pk1:pk2]
        degree[k] = dk
        Cp[k] = pk1
        length[k] = pk2 - pk1
        elen[k] = -2                               # k is now an element
        # find set differences |Le \ Lk| for all elements e adjacent to Lk
        mark = _wclear(mark, lemax, w, n)
        for pk in range(pk1, pk2):                 # scan 1
            i = Ci[pk]
            eln = elen[i]
            if eln <= 0:
                continue
            nvi = -nv[i]                           # nv[i] was negated above
            wnvi = mark - nvi
            for p in range(Cp[i], Cp[i] + eln):
                e = Ci[p]
                if w[e] >= mark:
                    w[e] -= nvi                    # decrement |Le \ Lk|
                elif w[e] != 0:                    # e unabsorbed, 1st seen
                    w[e] = degree[e] + wnvi
        # degree update
        for pk in range(pk1, pk2):                 # scan 2
            i = Ci[pk]
            p1 = Cp[i]
            p2 = p1 + elen[i] - 1
            pn = p1
            h = 0
            d = 0
            for p in range(p1, p2 + 1):            # scan element list of i
                e = Ci[p]
                if w[e] != 0:                      # e is unabsorbed
                    dext = w[e] - mark             # dext = |Le \ Lk|
                    if dext > 0:
                        d += dext
                        Ci[pn] = e                 # keep e in Ei
                        pn += 1
                        h += e                     # hash contribution
                    else:
                        Cp[e] = _flip(k)           # aggressive absorption
                        w[e] = 0
            elen[i] = pn - p1 + 1                  # # of elements + 1 (for k)
            p3 = pn
            p4 = p1 + length[i]
            for p in range(p2 + 1, p4):            # prune node list of i
                j = Ci[p]
                nvj = nv[j]
                if nvj <= 0:
                    continue                       # dead or in Lk
                d += nvj
                Ci[pn] = j
                pn += 1
                h += j
            if d == 0:                             # mass elimination
                Cp[i] = _flip(k)
                nvi = -nv[i]
                dk -= nvi
                nvk += nvi
                nel += nvi
                nv[i] = 0
                elen[i] = -1                       # node i is dead
            else:
                degree[i] = min(degree[i], d)
                Ci[pn] = Ci[p3]                    # move first node to end
                Ci[p3] = Ci[p1]                    # move 1st element to end
                Ci[p1] = k                         # add k as 1st element
                length[i] = pn - p1 + 1
                h %= n                             # hash bucket
                nxt[i] = hhead[h]
                hhead[h] = i
                last[i] = h                        # save hash in last[i]
        degree[k] = dk
        lemax = max(lemax, dk)
        mark = _wclear(mark + lemax, lemax, w, n)
        # supernode detection: merge indistinguishable nodes
        for pk in range(pk1, pk2):
            i = Ci[pk]
            if nv[i] >= 0:
                continue                           # only flagged nodes
            h = last[i]                            # hash bucket of i
            i = hhead[h]
            hhead[h] = -1                          # empty the bucket
            while i != -1 and nxt[i] != -1:
                ln = length[i]
                eln = elen[i]
                for p in range(Cp[i] + 1, Cp[i] + ln):
                    w[Ci[p]] = mark
                jlast = i
                j = nxt[i]
                while j != -1:                     # compare i with j
                    ok = (length[j] == ln) and (elen[j] == eln)
                    if ok:
                        for p in range(Cp[j] + 1, Cp[j] + ln):
                            if w[Ci[p]] != mark:
                                ok = False
                                break
                    if ok:                         # i and j identical
                        Cp[j] = _flip(i)           # absorb j into i
                        nv[i] += nv[j]
                        nv[j] = 0
                        elen[j] = -1               # j is dead
                        j = nxt[j]
                        nxt[jlast] = j             # delete j from bucket
                    else:
                        jlast = j
                        j = nxt[j]
                i = nxt[i]
                mark += 1
        # finalize new element Lk
        p = pk1
        for pk in range(pk1, pk2):                 # restore nv, update deg
            i = Ci[pk]
            nvi = -nv[i]
            if nvi <= 0:
                continue                           # i is dead; skip
            nv[i] = nvi
            d = degree[i] + dk - nvi               # approximate ext degree
            d = min(d, n - nel - nvi)
            if head[d] != -1:
                last[head[d]] = i
            nxt[i] = head[d]                       # put i back in deg list
            last[i] = -1
            head[d] = i
            mindeg = min(mindeg, d)
            degree[i] = d
            Ci[p] = i                              # place i in Lk
            p += 1
        nv[k] = nvk
        length[k] = p - pk1
        if length[k] == 0:                         # k is a root of the tree
            Cp[k] = -1
            w[k] = 0
        if elenk != 0:
            cnz = p                                # free unused space in Lk
    # --- postorder the assembly tree ------------------------------------
    for i in range(N):
        Cp[i] = _flip(Cp[i])                       # fix assembly tree
    head[:] = -1
    for j in range(n, -1, -1):                     # nodes into child lists
        if nv[j] > 0:
            continue                               # skip elements
        nxt[j] = head[Cp[j]]
        head[Cp[j]] = j
    for e in range(n, -1, -1):                     # elements into lists
        if nv[e] <= 0:
            continue
        if Cp[e] != -1:
            nxt[e] = head[Cp[e]]
            head[Cp[e]] = e
    perm = np.zeros(N, dtype=_IDX)
    stack = np.zeros(N, dtype=_IDX)
    k = 0
    for i in range(N):
        if Cp[i] == -1:
            k = tdfs(i, k, head, nxt, perm, stack)
    # perm has length n+1 and includes the placeholder node n; drop it
    return perm[perm != n][:n].copy()


def _wclear(mark, lemax, w, n):
    """Reset the work array when the mark would overflow (reference:
    static cs_wclear in cs_amd.c)."""
    if mark < 2 or mark + lemax < 0:
        w[:n][w[:n] != 0] = 1
        mark = 2
    return mark                                     # w[0..n-1] < mark holds
