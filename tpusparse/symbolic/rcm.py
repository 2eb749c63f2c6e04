"""Reverse Cuthill-McKee bandwidth-reducing ordering.

Not part of the reference's surface (cs_amd covers fill-reduction), but
the tiled device factorization (tpusparse.device.chol_tpu) prefers
orderings that keep fill NEAR THE DIAGONAL — dense tiles — over
orderings that minimize scalar fill and scatter it (SURVEY.md §7.4(3):
the padding policy drives the MXU target).  RCM is exposed as device
order code 4.
"""

from __future__ import annotations

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import add, transpose

__all__ = ["rcm"]

_IDX = np.int64


def rcm(A: CSCMatrix) -> np.ndarray:
    """Permutation p such that A(p,p) has small bandwidth (classic BFS
    with degree-sorted neighbor visits, reversed; pseudo-peripheral
    start per component via double-BFS)."""
    n = A.n
    G = add(A.pattern(), transpose(A, values=False), 1.0, 1.0)
    Gp, Gi = G.indptr, G.indices
    deg = np.diff(Gp)
    visited = np.zeros(n, dtype=bool)
    order = []

    def bfs_layers(start):
        """BFS returning (visit order, last layer) ignoring `visited`."""
        seen = np.zeros(n, dtype=bool)
        seen[start] = True
        frontier = [start]
        out = [start]
        last = [start]
        while frontier:
            nxt = []
            for u in frontier:
                for v in Gi[Gp[u]:Gp[u + 1]]:
                    if not seen[v]:
                        seen[v] = True
                        nxt.append(int(v))
            if nxt:
                last = nxt
                out.extend(nxt)
            frontier = nxt
        return out, last

    for comp_seed in np.argsort(deg, kind="stable"):
        if visited[comp_seed]:
            continue
        # pseudo-peripheral node: BFS twice from the min-degree seed
        _, last = bfs_layers(int(comp_seed))
        start = int(min(last, key=lambda u: deg[u]))
        # Cuthill-McKee BFS with degree-sorted neighbors
        visited[start] = True
        queue = [start]
        qi = 0
        while qi < len(queue):
            u = queue[qi]
            qi += 1
            order.append(u)
            nbrs = [int(v) for v in Gi[Gp[u]:Gp[u + 1]] if not visited[v]]
            nbrs.sort(key=lambda v: deg[v])
            for v in nbrs:
                visited[v] = True
            queue.extend(nbrs)
    return np.asarray(order[::-1], dtype=_IDX)       # reverse CM
