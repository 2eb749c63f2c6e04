"""Elimination-tree machinery: etree, postorder, column counts, ereach.

Reference components (SURVEY.md §2.2): csparse::cs_etree / cs_etree.c,
cs_post.c, cs_tdfs.c, cs_leaf.c, cs_counts.c, cs_ereach.c.  These are the
classic near-linear-time algorithms from Davis, *Direct Methods for Sparse
Linear Systems* (SIAM 2006), ch. 4 — inherently sequential pointer-chasing,
so they stay on host and run once per sparsity pattern (SURVEY.md §7.0).
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import transpose

__all__ = ["etree", "post", "tdfs", "counts", "ereach", "leaf"]

_IDX = np.int64


def etree(A: CSCMatrix, ata: bool = False) -> np.ndarray:
    """Elimination tree of A (SPD, upper part used) or of A'A (ata=True,
    column etree, computed without forming A'A).

    Reference: csparse::cs_etree / cs_etree.c — path-compressed ancestor
    traversal.  Returns parent array with -1 for roots.
    """
    m, n = A.m, A.n
    Ap, Ai = A.indptr, A.indices
    from .. import native
    if native.available():
        return native.etree(m, n, Ap, Ai, ata)
    parent = np.full(n, -1, dtype=_IDX)
    ancestor = np.full(n, -1, dtype=_IDX)
    prev = np.full(m, -1, dtype=_IDX) if ata else None
    for k in range(n):
        for p in range(Ap[k], Ap[k + 1]):
            i = prev[Ai[p]] if ata else Ai[p]
            while i != -1 and i < k:
                inext = ancestor[i]
                ancestor[i] = k            # path compression
                if inext == -1:
                    parent[i] = k
                i = inext
            if ata:
                prev[Ai[p]] = k
    return parent


def tdfs(j: int, k: int, head, nxt, order, stack) -> int:
    """Depth-first postorder of the (sub)tree rooted at j.

    Reference: csparse::cs_tdfs / cs_tdfs.c.  ``head``/``nxt`` are child
    linked lists, mutated in place; postorder written into ``order``
    starting at position k; returns the new k.
    """
    top = 0
    stack[0] = j
    while top >= 0:
        p = stack[top]
        i = head[p]
        if i == -1:
            top -= 1
            order[k] = p
            k += 1
        else:
            head[p] = nxt[i]
            top += 1
            stack[top] = i
    return k


def post(parent: np.ndarray) -> np.ndarray:
    """Postorder an elimination tree/forest.

    Reference: csparse::cs_post / cs_post.c — build child lists (younger
    children first, matching the reference's reverse insertion), tdfs each
    root.
    """
    parent = np.asarray(parent, dtype=_IDX)
    n = parent.size
    from .. import native
    if native.available():
        return native.post(parent)
    head = np.full(n, -1, dtype=_IDX)
    nxt = np.full(n, -1, dtype=_IDX)
    stack = np.zeros(n, dtype=_IDX)
    order = np.zeros(n, dtype=_IDX)
    for j in range(n - 1, -1, -1):
        if parent[j] == -1:
            continue
        nxt[j] = head[parent[j]]
        head[parent[j]] = j
    k = 0
    for j in range(n):
        if parent[j] != -1:
            continue
        k = tdfs(j, k, head, nxt, order, stack)
    return order


def leaf(i, j, first, maxfirst, prevleaf, ancestor):
    """Subtree-leaf test + least-common-ancestor step for column counts.

    Reference: csparse::cs_leaf / cs_leaf.c.  Returns (q, jleaf):
    jleaf=0 if j is not a leaf of i's row subtree, 1 for a first leaf,
    2 for a subsequent leaf (q = LCA of j and the previous leaf).
    """
    if i <= j or first[j] <= maxfirst[i]:
        return -1, 0
    maxfirst[i] = first[j]
    jprev = prevleaf[i]
    prevleaf[i] = j
    if jprev == -1:
        return i, 1
    q = jprev
    while q != ancestor[q]:
        q = ancestor[q]
    s = jprev
    while s != q:
        sparent = ancestor[s]
        ancestor[s] = q                    # path compression
        s = sparent
    return q, 2


def counts(A: CSCMatrix, parent, porder, ata: bool = False) -> np.ndarray:
    """Column counts of the Cholesky factor L of A (ata=False) or of the
    R factor of QR on A (ata=True), in near-linear time via the skeleton
    matrix + LCA algorithm.

    Reference: csparse::cs_counts / cs_counts.c (incl. the static
    init_ata row-linking for the ata case).
    """
    parent = np.asarray(parent, dtype=_IDX)
    porder = np.asarray(porder, dtype=_IDX)
    m, n = A.m, A.n
    from .. import native
    if native.available():
        return native.counts(m, n, A.indptr, A.indices, parent, porder, ata)
    AT = transpose(A, values=False)
    ATp, ATi = AT.indptr, AT.indices
    ancestor = np.full(n, -1, dtype=_IDX)
    maxfirst = np.full(n, -1, dtype=_IDX)
    prevleaf = np.full(n, -1, dtype=_IDX)
    first = np.full(n, -1, dtype=_IDX)
    delta = np.zeros(n, dtype=_IDX)
    for k in range(n):
        j = porder[k]
        delta[j] = 1 if first[j] == -1 else 0    # j is a leaf of its subtree
        while j != -1 and first[j] == -1:
            first[j] = k
            j = parent[j]
    if ata:
        # link each row of A into the list of its leftmost postordered col
        invpost = np.empty(n, dtype=_IDX)
        invpost[porder] = np.arange(n, dtype=_IDX)
        head = np.full(n + 1, -1, dtype=_IDX)
        nxt = np.full(m, -1, dtype=_IDX)
        for i in range(m):
            lo, hi = ATp[i], ATp[i + 1]
            k = n if lo == hi else int(invpost[ATi[lo:hi]].min())
            nxt[i] = head[k]
            head[k] = i
    ancestor[:] = np.arange(n, dtype=_IDX)
    for k in range(n):
        j = porder[k]
        if parent[j] != -1:
            delta[parent[j]] -= 1               # j is not a root
        J = head[k] if ata else j
        while J != -1:
            for p in range(ATp[J], ATp[J + 1]):
                i = ATi[p]
                q, jleaf = leaf(i, j, first, maxfirst, prevleaf, ancestor)
                if jleaf >= 1:
                    delta[j] += 1               # A(i,j) is in the skeleton
                if jleaf == 2:
                    delta[q] -= 1               # account for overlap at LCA
            J = nxt[J] if ata else -1
        if parent[j] != -1:
            ancestor[j] = parent[j]
    colcount = delta.copy()
    for j in range(n):                           # accumulate up the tree
        if parent[j] != -1:
            colcount[parent[j]] += colcount[j]
    return colcount


def ereach(A: CSCMatrix, k: int, parent, s=None, w=None) -> np.ndarray:
    """Nonzero pattern of row k of the Cholesky factor L: walk up the
    etree from each nonzero of A(0:k, k) until hitting a marked node.
    Returns the pattern (excluding k) in topological order.

    Reference: csparse::cs_ereach / cs_ereach.c (the reference returns a
    top-of-stack index into caller workspace; we return the slice).
    """
    n = A.n
    Ap, Ai = A.indptr, A.indices
    if s is None:
        s = np.zeros(n, dtype=_IDX)
    if w is None:
        w = np.zeros(n, dtype=bool)
    top = n
    w[k] = True                                  # mark node k
    for p in range(Ap[k], Ap[k + 1]):
        i = Ai[p]
        if i > k:
            continue
        length = 0
        while not w[i]:                          # traverse up the etree
            s[length] = i
            length += 1
            w[i] = True
            i = parent[i]
        while length > 0:                        # push path onto stack
            length -= 1
            top -= 1
            s[top] = s[length]
    out = np.array(s[top:n], dtype=_IDX)
    w[out] = False                               # unmark
    w[k] = False
    return out
