"""Reachability on the column graph: nonzero pattern of sparse triangular
solves.

Reference: csparse::cs_dfs / cs_dfs.c and csparse::cs_reach / cs_reach.c
(SURVEY.md §2.2).  The reference marks visited nodes by flipping Gp
entries in place (CS_MARK/CS_FLIP); we use an explicit boolean mark array
— same asymptotics, no mutation of the matrix.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix

__all__ = ["dfs", "reach"]

_IDX = np.int64


def dfs(j: int, Gp, Gi, marked, pinv, out: list) -> None:
    """Iterative depth-first search from node j on the CSC graph G
    (an edge j -> Gi[p] for p in column j), appending nodes to ``out`` in
    FINISH order.  ``pinv`` translates column indices (for LU, G = L is
    stored with rows in pivotal order; pinv maps row index -> column to
    continue the search, -1/identity handled by caller passing None).

    Reference: csparse::cs_dfs / cs_dfs.c (non-recursive, with a pstack
    of per-node scan positions; here the scan position is kept alongside
    the node on the Python stack).
    """
    stack = [(j, 0)]
    marked[j] = True
    while stack:
        node, pos = stack.pop()
        jnew = node if pinv is None else pinv[node]
        lo = 0 if jnew < 0 else int(Gp[jnew])
        hi = 0 if jnew < 0 else int(Gp[jnew + 1])
        advanced = False
        for p in range(lo + pos, hi):
            child = Gi[p]
            if marked[child]:
                continue
            marked[child] = True
            stack.append((node, p - lo + 1))   # resume here later
            stack.append((child, 0))
            advanced = True
            break
        if not advanced:
            out.append(node)                   # node is finished


def reach(G: CSCMatrix, B: CSCMatrix, k: int, pinv=None) -> np.ndarray:
    """Nonzero pattern of x solving G x = B(:,k) with G lower/upper
    triangular: all nodes reachable in the graph of G from the nonzeros
    of B(:,k), returned in TOPOLOGICAL order (reverse finish order).

    Reference: csparse::cs_reach / cs_reach.c — identical semantics to
    the reference's xi[top..n-1] output slice.
    """
    n = G.n
    marked = np.zeros(n, dtype=bool)
    out: list = []
    Bp, Bi = B.indptr, B.indices
    for p in range(Bp[k], Bp[k + 1]):
        j = Bi[p]
        if not marked[j]:
            dfs(j, G.indptr, G.indices, marked, pinv, out)
    return np.array(out[::-1], dtype=_IDX)
