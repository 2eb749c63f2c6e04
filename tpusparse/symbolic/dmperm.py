"""Maximum transversal, strongly connected components, and the full
Dulmage–Mendelsohn decomposition.

Reference (SURVEY.md §2.2, §3.4): csparse::cs_maxtrans / cs_maxtrans.c
(with static cs_augment), csparse::cs_scc / cs_scc.c, csparse::cs_dmperm /
cs_dmperm.c (with statics cs_bfs, cs_matched, cs_unmatched, cs_rprune).
Pure graph algorithms — host-only, run once per pattern (SURVEY.md §3.4).

Output contract (SURVEY.md Appendix A): ``p``/``q`` are row/col
permutations; block k spans rows ``r[k]:r[k+1]`` and cols ``s[k]:s[k+1]``;
``rr``/``cc`` give the coarse decomposition boundaries with
``sprank = rr[3] = cc[3]``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import permute, transpose
from ..core.perm import pinv as _pinv, randperm
from .reach import dfs

__all__ = ["DmPermResult", "maxtrans", "scc", "dmperm", "sprank"]

_IDX = np.int64


@dataclass
class DmPermResult:
    """The reference's csd struct (SURVEY.md §2.1)."""
    p: np.ndarray                       # row permutation
    q: np.ndarray                       # column permutation
    r: np.ndarray                       # row block boundaries (len nb+1)
    s: np.ndarray                       # col block boundaries (len nb+1)
    nb: int                             # number of diagonal blocks
    rr: np.ndarray = field(default=None)  # coarse row boundaries (len 5)
    cc: np.ndarray = field(default=None)  # coarse col boundaries (len 5)


def _augment(k, Ap, Ai, jmatch, cheap, w, js, iss, ps):
    """Find an augmenting path starting at column k (reference: static
    cs_augment in cs_maxtrans.c — DFS with explicit j/i/position stacks)."""
    head = 0
    js[0] = k
    found = False
    while head >= 0:
        j = js[head]
        if w[j] != k:                       # first visit to j on path k
            w[j] = k
            p = cheap[j]
            i = -1
            while p < Ap[j + 1]:
                i = Ai[p]                   # try a cheap assignment (i,j)
                p += 1
                if jmatch[i] == -1:
                    found = True
                    break
            cheap[j] = p
            if found:
                iss[head] = i
                break                       # augmenting path complete
            ps[head] = Ap[j]                # no cheap match: start dfs of j
        p = ps[head]
        advanced = False
        while p < Ap[j + 1]:
            i = Ai[p]
            if w[jmatch[i]] == k:           # skip if jmatch[i] visited
                p += 1
                continue
            ps[head] = p + 1                # pause dfs of node j
            iss[head] = i                   # i matched to j if path found
            head += 1
            js[head] = jmatch[i]            # continue dfs at jmatch[i]
            advanced = True
            break
        if not advanced:
            head -= 1                       # node j is done; pop
    if found:
        for p in range(head, -1, -1):       # flip the augmenting path
            jmatch[iss[p]] = js[p]


def maxtrans(A: CSCMatrix, seed: int = 0, imatch0=None):
    """Maximum transversal (maximum bipartite matching).

    Returns (jmatch, imatch): jmatch[i] = column matched to row i (or -1),
    imatch[j] = row matched to column j (or -1).
    Reference: csparse::cs_maxtrans / cs_maxtrans.c — cheap-assignment
    pass then one augmenting-path DFS per column, on whichever of A / A'
    has fewer nonempty "columns".

    ``imatch0`` (optional, col -> row partial matching) WARM-STARTS the
    search: matched pairs are kept and only unmatched columns run the
    augmenting DFS — used by symbolic.transversal to complete a
    large-entry bottleneck matching without discarding it (augmenting
    paths reroute existing pairs only when necessary).
    """
    m, n = A.m, A.n
    Ap, Ai = A.indptr, A.indices
    if imatch0 is None:
        # quick return if the diagonal is zero-free
        mn = min(m, n)
        cols = np.repeat(np.arange(n, dtype=_IDX), np.diff(Ap))
        hit = (Ai == cols) & (cols < mn)
        k = len(np.unique(cols[hit]))
        if k == mn:
            jmatch = np.concatenate([np.arange(k, dtype=_IDX),
                                     np.full(m - k, -1, dtype=_IDX)])
            imatch = np.concatenate([np.arange(k, dtype=_IDX),
                                     np.full(n - k, -1, dtype=_IDX)])
            return jmatch, imatch
    # choose the cheaper orientation (warm start pins orientation to A)
    if imatch0 is None:
        n2 = int(np.count_nonzero(np.diff(Ap) > 0))
        rowflag = np.zeros(m, dtype=bool)
        rowflag[Ai] = True
        m2 = int(rowflag.sum())
        trans = m2 < n2
    else:
        trans = False
    C = transpose(A, values=False) if trans else A
    cm, cn = C.m, C.n
    Cp, Ci = C.indptr, C.indices
    jm = np.full(cm, -1, dtype=_IDX)            # row -> col matching of C
    if imatch0 is not None:
        ok0 = imatch0 >= 0
        jm[imatch0[ok0]] = np.where(ok0)[0]
        korder = np.where(~ok0)[0].astype(_IDX)
    else:
        q = randperm(cn, seed)
        korder = (np.arange(cn, dtype=_IDX) if q is None
                  else np.asarray(q, dtype=_IDX))
    from .. import native
    if native.available():                      # C++ twin (ts_maxtrans_core)
        native.maxtrans_core(cm, cn, Cp, Ci, korder, jm)
    else:
        cheap = Cp[:cn].copy()
        w = np.full(cn, -1, dtype=_IDX)
        js = np.zeros(cn, dtype=_IDX)
        iss = np.zeros(cn, dtype=_IDX)
        ps = np.zeros(cn, dtype=_IDX)
        for kk in korder:
            _augment(int(kk), Cp, Ci, jm, cheap, w, js, iss, ps)
    im = np.full(cn, -1, dtype=_IDX)            # col -> row matching of C
    okr = jm >= 0
    im[jm[okr]] = np.where(okr)[0]
    if trans:                                   # C = A': swap roles
        return im, jm
    return jm, im


def scc(A: CSCMatrix) -> DmPermResult:
    """Strongly connected components of a square CSC graph (Kosaraju:
    DFS of A for finish order, DFS of A' in reverse finish order).

    Reference: csparse::cs_scc / cs_scc.c.  Returns DmPermResult with
    ``p`` (node order), ``r`` (block boundaries), ``nb``; within each
    block nodes are sorted in natural order, as in the reference.
    """
    n = A.n
    from .. import native
    if native.available():                      # C++ twin (ts_scc_core)
        p, r, nb = native.scc_core(n, A.indptr, A.indices)
        return DmPermResult(p=p, q=np.arange(n, dtype=_IDX),
                            r=r, s=r.copy(), nb=nb)
    marked = np.zeros(n, dtype=bool)
    finish: list = []
    for i in range(n):
        if not marked[i]:
            dfs(i, A.indptr, A.indices, marked, None, finish)
    AT = transpose(A, values=False)
    marked2 = np.zeros(n, dtype=bool)
    comps: list = []
    for i in reversed(finish):
        if marked2[i]:
            continue
        comp: list = []
        dfs(i, AT.indptr, AT.indices, marked2, None, comp)
        comps.append(sorted(comp))              # natural order within block
    # the reference writes components from the top of p downward, which
    # REVERSES discovery order — this is what makes A(p,p) block UPPER
    # triangular (cs_scc.c fills pr via top-of-stack then shifts r up)
    comps.reverse()
    p: list = []
    r = [0]
    for comp in comps:
        p.extend(comp)
        r.append(len(p))
    return DmPermResult(
        p=np.asarray(p, dtype=_IDX), q=np.arange(n, dtype=_IDX),
        r=np.asarray(r, dtype=_IDX), s=np.asarray(r, dtype=_IDX),
        nb=len(r) - 1)


def _bfs(A: CSCMatrix, n, wi, wj, queue, imatch, jmatch, mark) -> None:
    """Alternating-path BFS from unmatched nodes (reference: static cs_bfs
    in cs_dmperm.c).  mark=1: BFS of A from unmatched cols (finds C1,R1);
    mark=3: BFS of A' from unmatched rows (finds R3,C3)."""
    tail = 0
    for j in range(n):
        if imatch[j] >= 0:
            continue                            # skip matched j
        wj[j] = 0                               # j is in set C0 (R0)
        queue[tail] = j
        tail += 1
    if tail == 0:
        return
    C = A if mark == 1 else transpose(A, values=False)
    Ap, Ai = C.indptr, C.indices
    head = 0
    while head < tail:
        j = queue[head]
        head += 1
        for pp in range(Ap[j], Ap[j + 1]):
            i = Ai[pp]
            if wi[i] >= 0:
                continue
            wi[i] = mark                        # i in set R1 (C3)
            j2 = jmatch[i]                      # alternating path via match
            if wj[j2] >= 0:
                continue
            wj[j2] = mark                       # j2 in set C1 (R3)
            queue[tail] = j2
            tail += 1


def _matched(n, wj, imatch, p, q, cc, rr, which, mark) -> None:
    """Collect matched col/row pairs of a coarse set (reference: static
    cs_matched in cs_dmperm.c)."""
    kc = cc[which]
    kr = rr[which - 1]
    for j in range(n):
        if wj[j] != mark:
            continue
        p[kr] = imatch[j]
        kr += 1
        q[kc] = j
        kc += 1
    cc[which + 1] = kc
    rr[which] = kr


def _unmatched(m, wi, p, rr, which) -> None:
    """Collect unmatched rows (reference: static cs_unmatched)."""
    kr = rr[which]
    for i in range(m):
        if wi[i] == 0:
            p[kr] = i
            kr += 1
    rr[which + 1] = kr


def dmperm(A: CSCMatrix, seed: int = 0) -> DmPermResult:
    """Full Dulmage–Mendelsohn decomposition (reference:
    csparse::cs_dmperm / cs_dmperm.c): maximum transversal -> coarse
    decomposition via alternating BFS -> fine decomposition (SCC of the
    perfectly-matched square submatrix) -> block triangular form."""
    m, n = A.m, A.n
    jmatch, imatch = maxtrans(A, seed)
    from .. import native
    if native.available():                      # C++ twin (ts_dmperm_core)
        p, q, r, s, nb, rr, cc = native.dmperm_core(
            m, n, A.indptr, A.indices, jmatch, imatch)
        return DmPermResult(p=p, q=q, r=r, s=s, nb=nb, rr=rr, cc=cc)
    p = np.zeros(m, dtype=_IDX)
    q = np.zeros(n, dtype=_IDX)
    r = np.zeros(m + 6, dtype=_IDX)
    s = np.zeros(n + 6, dtype=_IDX)
    cc = np.zeros(5, dtype=_IDX)
    rr = np.zeros(5, dtype=_IDX)
    # --- coarse decomposition -------------------------------------------
    wi = np.full(m, -1, dtype=_IDX)
    wj = np.full(n, -1, dtype=_IDX)
    _bfs(A, n, wi, wj, q, imatch, jmatch, 1)    # find C1, R1 from C0
    _bfs(A, m, wj, wi, p, jmatch, imatch, 3)    # find R3, C3 from R0
    _unmatched(n, wj, q, cc, 0)                 # unmatched set C0
    _matched(n, wj, imatch, p, q, cc, rr, 1, 1)     # sets R1, C1
    _matched(n, wj, imatch, p, q, cc, rr, 2, -1)    # sets R2, C2
    _matched(n, wj, imatch, p, q, cc, rr, 3, 3)     # sets R3, C3
    _unmatched(m, wi, p, rr, 3)                 # unmatched set R0
    # --- fine decomposition ----------------------------------------------
    C = permute(A, _pinv(p), q, values=False)
    # keep only the square perfectly-matched submatrix A(R2, C2)
    nc = int(cc[3] - cc[2])
    r1, c2 = int(rr[1]), int(cc[2])
    sub_p = C.indptr[c2:c2 + nc + 1] - C.indptr[c2]
    sub_i = C.indices[C.indptr[c2]:C.indptr[c2 + nc]]
    keep = (sub_i >= r1) & (sub_i < int(rr[2]))
    # rebuild column pointers after the row prune
    cols = np.repeat(np.arange(nc, dtype=_IDX), np.diff(sub_p))
    newp = np.zeros(nc + 1, dtype=_IDX)
    np.cumsum(np.bincount(cols[keep], minlength=nc), out=newp[1:])
    Csub = CSCMatrix(nc, nc, newp, sub_i[keep] - r1, None)
    sccres = scc(Csub)
    # --- combine coarse and fine decompositions --------------------------
    ps, rs, nb1 = sccres.p, sccres.r, sccres.nb
    q[c2:c2 + nc] = q[c2 + ps]
    p[r1:r1 + nc] = p[r1 + ps]
    nb2 = 0
    r[0] = s[0] = 0
    if cc[2] > 0:                               # leading block A(R1,[C0 C1])
        nb2 += 1
    for k in range(nb1):                        # fine blocks of A(R2,C2)
        r[nb2] = rs[k] + r1
        s[nb2] = rs[k] + c2
        nb2 += 1
    if rr[2] < m:                               # trailing block A([R3 R0],C3)
        r[nb2] = rr[2]
        s[nb2] = cc[3]
        nb2 += 1
    r[nb2] = m
    s[nb2] = n
    return DmPermResult(p=p, q=q, r=r[:nb2 + 1].copy(), s=s[:nb2 + 1].copy(),
                        nb=nb2, rr=rr, cc=cc)


def sprank(A: CSCMatrix, seed: int = 0) -> int:
    """Structural rank = size of a maximum transversal."""
    jmatch, _ = maxtrans(A, seed)
    return int(np.count_nonzero(jmatch >= 0))
