"""Scan-ified supernodal Cholesky on TPU — program size bounded by
SEGMENT x PHASE count, not elimination-tree depth.

This is the round-2 redesign of the supernodal engine
(tpusparse.device.supernodal) that removes its two structural limits
(VERDICT r1 items 1 and 2):

  * tree-depth-bound program size: the level-unrolled engine emits
    O(levels x update-group-keys) HLO ops — compile-prohibitive at
    n=262,144 (2,220 levels on the 2D Laplacian).  Here the numeric
    factorization is a handful of ``lax.scan`` calls (one per level
    SEGMENT) whose bodies are shape-generic and whose schedules arrive
    as RUNTIME int32 arrays — the chol_tpu scan trick scaled up.
  * issued-flop waste 0.93: update GEMMs were sized to the full target
    panel.  Here every descendant->ancestor update is trimmed to its
    live intersection rows, chopped into pow2 row chunks (H_CLASSES),
    and runs in a GEMM phase sliced to its power-of-two width pair —
    issued flops track true flops (canonical 3D bench: 0.48).

Storage: TWO flat packed row pools (width 32 and 128), CHOLMOD-style —
a panel of class width W holds W diagonal rows (identity-padded) plus
its od rows (8-row padded), at pool width 32 if W <= 32 else 128.
Unused columns are ZERO, which makes phase COARSENING free: a GEMM
sliced to any width >= the true width computes the same update, so the
planner can merge a rare (Wd, Ws) shape into a popular one instead of
paying a one-slot-per-step floor for it.

Reference semantics: csparse::cs_chol / cs_schol (SURVEY.md §2.2, §7.1
stage 3); numerics f32 + Precision.HIGHEST with host-f64 iterative
refinement, like every device engine here.

Plan (host, once per pattern):
  1. AMD + etree postorder; exact column patterns; fundamental
     supernodes; relaxed amalgamation (tau, small_w); split to pow2
     widths <= wmax; packed two-pool layout.
  2. levels over the panel DAG (level(target) > level(source) for every
     update pair); the STEP axis is the level axis, optionally exploding
     levels much fatter than the median (off by default — measured
     worse, see the code comment).
  3. work items:  chol(panel); TRSM od-row chunks; update units
     (d->s): L1 rows = d's od rows >= s.c0 (chopped), L0 rows = d's od
     rows inside s's columns, delta = L1 @ L0^T scatter-added into s.
  4. dynamic-programming segmentation of the step axis (cost = per-step
     demand maxima x slot flops); per segment: demand-aware greedy
     phase-menu coarsening, then EDF assignment of update units to
     steps inside their dependency window (release = source step + 1,
     deadline = target step).

Device (per segment, one jit each, cached by shape signature):
  lax.scan over the segment's levels; body = update phases
  (where-masked row gathers, batched GEMM, row scatter-add) -> chol
  phases (batched tril-symmetrized Cholesky) -> trsm phases (batched
  triangular solves written in place).  The solve reuses the same
  segments with diag-solve and od-axpy phases, forward then backward.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import permute, symperm
from ..core.perm import ipvec, pvec, pinv as _pinv
from ..symbolic.amd import amd
from ..symbolic.etree import counts, etree, post
from .config import HIGHEST

__all__ = ["SuperscanPlan", "plan_superscan", "SuperscanCholesky"]

_IDX = np.int64
H_CLASSES = (8, 16, 32, 64, 128)  # update/trsm row-chunk classes
POOLS = (32, 128)                 # storage row widths
# column-compressed update thresholds (see plan_superscan)
_SPARSEJ_RATIO = int(os.environ.get("TPUSPARSE_SPARSEJ_RATIO", "4"))
_SPARSEJ_CAP = int(os.environ.get("TPUSPARSE_SPARSEJ_CAP", "32"))


def _pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _hclass(k: int) -> int:
    for h in H_CLASSES:
        if k <= h:
            return h
    return H_CLASSES[-1]


def _poolw(W: int) -> int:
    return POOLS[0] if W <= POOLS[0] else POOLS[1]


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated [0..c) ranges (the ragged-arange trick)."""
    counts = np.asarray(counts, _IDX)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, _IDX)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=_IDX) - np.repeat(starts, counts)


def _split_widths(w: int, wmax: int) -> List[int]:
    out = []
    while w > 0:
        c = min(_pow2(w) if _pow2(w) == w else _pow2(w) // 2, wmax)
        c = min(c, w)
        out.append(c)
        w -= c
    return out


@dataclass
class _Panel:
    pid: int
    c0: int
    w: int                  # true width
    W: int                  # class width (pow2 >= max(w, 8))
    rows: np.ndarray        # od rows (global, sorted)
    pool: int = 0           # storage pool width (32 or 128)
    rbase: int = 0          # first row in the pool
    rlen: int = 0           # padded row count (W + od padded to 8)
    level: int = 0


# phase keys
#   ("chol", pool, W)            : batched W x W tril-chol
#   ("trsm", pool, H, W)         : H od rows vs the W x W diag block
#   ("upd",  pd, ps, H, Wd, Ws)  : (H,Wd) @ (Ws,Wd)^T from pool pd into ps,
#                                  scatter-added as full-width rows
#   ("upds", pd, ps, H, Wd, J)   : column-compressed variant for updates
#                                  that touch few target columns: delta is
#                                  (H,J) and lands via a 2-D element
#                                  scatter at (row, col) pairs
#   ("updg", pd, H, Wd, Ws)      : aggregated (multifrontal-style) GEMM —
#                                  one (H,Wd)@(Wd,Ws) trapezoid chunk of a
#                                  descendant's od x od update matrix,
#                                  written into the per-step scratch
#   ("upda", ps, H, Ws)          : flop-free application of one ancestor
#                                  pair's sub-block of a scratch update
#                                  matrix: 2-D gather from scratch + 2-D
#                                  element scatter-add into pool ps
def _slot_flops(key: Tuple) -> int:
    if key[0] == "chol":
        return key[2] ** 3 // 3
    if key[0] == "trsm":
        return key[2] * key[3] * key[3]
    if key[0] == "updg":
        _, pd, h, wd, ws = key
        return 2 * h * wd * ws
    if key[0] == "upda":
        return 0                     # data movement only, no multiplies
    _, pd, ps, h, wd, ws = key[:6]
    return 2 * h * wd * ws


def _slot_cost(key: Tuple) -> int:
    """Planning cost of one slot (DP segmentation + phase coarsening):
    issued flops, except the flop-free apply phases are charged a
    byte-proxy so the planner still balances and merges them."""
    if key[0] == "upda":
        _, ps, h, ws = key
        return h * ws
    return _slot_flops(key)


@dataclass
class _Segment:
    lo: int                                     # first step
    hi: int                                     # one past last step
    xs: Dict[Tuple, Dict[str, np.ndarray]] = field(default_factory=dict)
    scratch_rows: int = 0            # per-step scratch for updg/upda
    # runtime-sized phases ("switch ladders"): per key, the STATIC list
    # of branch batch sizes and the per-step branch index.  At runtime
    # the scan body lax.switch-es to the branch that covers the step's
    # ACTIVE slot count, so idle capacity costs nothing — the lever
    # that breaks the occupancy/compile-wall trade (VERDICT r3 item 2).
    ladders: Dict[Tuple, Tuple[int, ...]] = field(default_factory=dict)
    lvls: Dict[Tuple, np.ndarray] = field(default_factory=dict)


def _full_ladder(U: int) -> Tuple[int, ...]:
    """Deterministic branch-size list for capacity U: exact counts up
    to TPUSPARSE_SWITCH_EXACT (default 8), then geometric sub-steps
    (TPUSPARSE_SWITCH_SUBSTEPS per octave; default 4 = 1.25x steps),
    capped at U.  A FUNCTION OF U ONLY — chunks sharing a capacity
    share the ladder, so their compiled programs share a shape
    signature.  Finer ladders cut the count-rounding waste at the cost
    of more compiled branch bodies per program."""
    exact = int(os.environ.get("TPUSPARSE_SWITCH_EXACT", "8"))
    sub = int(os.environ.get("TPUSPARSE_SWITCH_SUBSTEPS", "4"))
    vals = list(range(0, min(exact, U) + 1))
    p = 8
    while p * 2 <= max(exact, 8):
        p *= 2
    while vals[-1] < U:
        for q in range(sub + 1):
            m = p + q * p // sub
            if m >= U:
                break
            if m > vals[-1]:
                vals.append(m)
        p *= 2
        if p > 4 * U:
            break
    if vals[-1] != U:
        vals.append(U)
    # Branch-count cap: every lax.switch branch is a separately
    # compiled body over the full pools dict, so total compile work is
    # sum(branches) across phases x programs — the axon relay compiles
    # slowly enough that an uncapped ladder (20+ branches/phase) walls
    # the first call.  Downsample geometrically, keeping 0 and U.
    cap = int(os.environ.get("TPUSPARSE_SWITCH_BRANCHES", "6"))
    if cap > 0 and len(vals) > cap:
        keep = {0, vals[-1]}
        pos = np.unique(np.round(
            np.linspace(1, len(vals) - 1, cap - 1)).astype(int))
        keep.update(vals[i] for i in pos)
        vals = sorted(keep)
    return tuple(vals)


def _make_ladder(U: int, fills: np.ndarray, fkey: Tuple):
    """Branch-size list + per-step branch index for a runtime-sized
    phase.  The list depends only on (key kind, U); the per-step index
    comes from the ACTIVE slot counts ``fills``.  None (mask mode)
    when the phase is too small for idle slots to matter — the gate is
    also shape-deterministic (spad x U x slot cost), so chunks of one
    cluster make the same choice."""
    if os.environ.get("TPUSPARSE_SWITCH", "1") == "0":
        return None, None
    min_flops = int(os.environ.get("TPUSPARSE_SWITCH_MIN_FLOPS",
                                   str(1 << 14)))
    if int(fills.size) * U * _slot_cost(fkey) < min_flops:
        return None, None
    vals = np.asarray(_full_ladder(U), np.int64)
    lvl = np.searchsorted(vals, np.asarray(fills, np.int64),
                          side="left").astype(np.int32)
    return tuple(int(v) for v in vals), lvl


def _rung_curve(vals: np.ndarray, wts: np.ndarray, kmax: int):
    """Optimal ladder rungs for a weighted fill histogram: choose k
    rung values (from the observed fills — any other choice can be
    lowered) minimizing sum_i w_i * min{r in rungs: r >= v_i}.  DP over
    sorted unique values, O(V^2 k).  Returns (costs[1..k], rungsets):
    costs[k-1] = optimal covered-slot total with k rungs; rungsets[k-1]
    the rung tuple achieving it.  Replaces the geometric _full_ladder
    (which ignored the fill DISTRIBUTION — VERDICT r4 item 3: the
    cap-6 geometric ladder shipped occ 0.715 where exact rungs reach
    0.97; picking the 6 rungs where the distribution mass sits recovers
    most of the gap at the same compiled-body count)."""
    v = np.asarray(vals, np.float64)
    w = np.asarray(wts, np.float64)
    V = v.size
    kmax = max(1, min(kmax, V))
    Wc = np.cumsum(w)                          # inclusive prefix weights
    # strict DP: C_t[j] = min cost covering values[0..j] with EXACTLY
    # t rungs, top rung = v[j]; recovery via backpointers.
    C = Wc * v                                 # t = 1
    back = [np.full(V, -1, np.int64)]
    rows = [C.copy()]
    lowmask = np.tril(np.ones((V, V), bool))   # jp >= j -> masked
    for _t in range(2, kmax + 1):
        # M[jp, j] = C[jp] + (Wc[j] - Wc[jp]) * v[j], jp < j
        M = C[:, None] + (Wc[None, :] - Wc[:, None]) * v[None, :]
        M[lowmask] = np.inf
        bp = np.argmin(M, axis=0)
        C = M[bp, np.arange(V)]
        back.append(np.where(np.isfinite(C), bp, -1))
        rows.append(C.copy())
    costs, rungsets = [], []
    for t in range(1, kmax + 1):
        costs.append(float(rows[t - 1][V - 1]))
        rs, j, tt = [], V - 1, t - 1
        while j >= 0:
            rs.append(int(v[j]))
            if tt <= 0:
                break
            j = int(back[tt][j])
            tt -= 1
        rungsets.append(tuple(sorted(set(rs))))
    return costs, rungsets


def _finalize_ladders(segments: List["_Segment"], pend: List[Tuple],
                      gids: np.ndarray, lu_extras: bool):
    """Deferred ladder construction with DISTRIBUTION-OPTIMAL rungs and
    a global branch-body budget (VERDICT r4 item 3).

    ``pend`` holds (seg_index, key, capacity U, per-step fills, padded
    steps) for every ladder-eligible phase.  Phases are grouped by
    (cluster id, key) so every chunk of a cluster shares ONE rung list
    — the compiled-program signature stays shared (n_program_sigs
    unchanged).  Rung VALUES per group come from the weighted DP over
    the group's aggregate fill histogram (_rung_curve); rung COUNTS are
    allocated from a global budget (TPUSPARSE_SWITCH_BRANCHES x number
    of laddered groups — same total compiled-body count as the old
    uniform cap) by marginal issued-cost gain, so branches go where the
    fill-count variance is.  Returns (flops_padded_add,
    slots_issued_add)."""
    import heapq
    switch_on = (not lu_extras
                 and os.environ.get("TPUSPARSE_SWITCH", "1") != "0")
    min_flops = int(os.environ.get("TPUSPARSE_SWITCH_MIN_FLOPS",
                                   str(1 << 14)))
    cap = int(os.environ.get("TPUSPARSE_SWITCH_BRANCHES", "6"))
    gmax = int(os.environ.get("TPUSPARSE_SWITCH_GROUP_MAX", "24"))
    groups: Dict[Tuple, List] = {}
    for (si, fkey, U, fills, spad) in pend:
        groups.setdefault((int(gids[si]), fkey), []).append(
            (si, U, fills, spad))
    fp_add = 0
    si_add = 0
    cand = []
    for gk, members in sorted(groups.items()):
        fkey = gk[1]
        U = members[0][1]
        total_steps = sum(f.size for (_, _, f, _) in members)
        if not (switch_on
                and total_steps * U * _slot_cost(fkey) >= min_flops):
            for (_si, U_, _fills, spad) in members:
                fp_add += spad * U_ * _slot_flops(fkey)
                si_add += spad * U_
            continue
        allf = np.concatenate([f for (_, _, f, _) in members])
        vals, wts = np.unique(allf, return_counts=True)
        kmax = (vals.size if cap <= 0
                else min(max(gmax, cap), vals.size))
        costs, rsets = _rung_curve(vals, wts, kmax)
        cand.append((fkey, members, costs, rsets))
    if cap <= 0:
        alloc = [len(c[2]) for c in cand]
    else:
        budget = cap * len(cand) - len(cand)
        alloc = [1] * len(cand)
        heap = []
        for ci, (fkey, _m, costs, _r) in enumerate(cand):
            if len(costs) > 1:
                heapq.heappush(
                    heap, (-(costs[0] - costs[1]) * _slot_cost(fkey),
                           ci, 1))
        while budget > 0 and heap:
            _negg, ci, k = heapq.heappop(heap)
            if alloc[ci] != k:
                continue
            alloc[ci] = k + 1
            budget -= 1
            fkey, _m, costs, _r = cand[ci]
            if k + 1 < len(costs):
                heapq.heappush(
                    heap, (-(costs[k] - costs[k + 1]) * _slot_cost(fkey),
                           ci, k + 1))
    for ci, (fkey, members, _costs, rsets) in enumerate(cand):
        rungs = rsets[alloc[ci] - 1]
        rung_a = np.asarray(rungs, np.int64)
        for (si, _U, fills, _spad) in members:
            lvl = np.searchsorted(rung_a, np.asarray(fills, np.int64),
                                  side="left").astype(np.int32)
            segments[si].ladders[fkey] = rungs
            segments[si].lvls[fkey] = lvl
            issued = int(rung_a[lvl].sum())
            fp_add += issued * _slot_flops(fkey)
            si_add += issued
    return fp_add, si_add


@dataclass
class SuperscanPlan:
    n: int
    perm: np.ndarray
    panels: List[_Panel]
    pool_rows: Dict[int, int]               # pool width -> real rows
    pool_init: Dict[int, np.ndarray]        # pool width -> (rows, pw) f32
    segments: List[_Segment]
    nlevels: int
    nsteps: int                             # levels exploded by load
    flops_true: int
    flops_padded: int
    lnz: int
    slots_used: int = 0                     # scheduled units/items
    slots_issued: int = 0                   # steps x capacity totals

    @property
    def waste_ratio(self) -> float:
        return 1.0 - self.flops_true / max(self.flops_padded, 1)

    @property
    def slot_occupancy(self) -> float:
        """Scheduled units / issued slots across every phase — the
        schedule-efficiency factor orthogonal to shape padding
        (VERDICT r2 weak-2 measured 0.77 before the capacity trim)."""
        return self.slots_used / max(self.slots_issued, 1)

    def _sigs(self) -> Dict:
        sigs = {}
        for seg in self.segments:
            sig = ((seg.scratch_rows,
                    tuple(sorted((k, seg.ladders[k])
                                 for k in seg.ladders)))
                   + tuple(sorted(
                       (k, tuple(sorted((nm, a.shape)
                                        for nm, a in seg.xs[k].items())))
                       for k in seg.xs)))
            sigs.setdefault(sig, seg)
        return sigs

    @property
    def n_program_sigs(self) -> int:
        """Distinct factor-program shape signatures across segments —
        the compiled-program count (programs are cached by signature,
        so segments sharing one compile once)."""
        return len(self._sigs())

    @property
    def n_ladder_bodies(self) -> int:
        """Total switch-branch bodies the relay actually compiles: one
        per (unique program signature, phase, rung) — the compile-wall
        driver (segments sharing a signature compile once)."""
        return sum(len(lad) for seg in self._sigs().values()
                   for lad in seg.ladders.values())


def _edf(steps: int, rel: np.ndarray, dl: np.ndarray, U0: int):
    """EDF greedy placement (units pre-sorted by deadline): native
    ts_edf when available, else the Python union-find twin.  Returns
    (capacity, step_of)."""
    from .. import native
    if native.available():
        return native.edf(steps, rel, dl, U0)
    U = max(1, int(U0))
    while True:
        nxt = np.arange(steps + 1, dtype=np.int64)
        fill = np.zeros(steps, dtype=np.int64)
        step_of = np.empty(rel.size, np.int64)

        def find(t):
            root = t
            while nxt[root] != root:
                root = nxt[root]
            while nxt[t] != root:
                nxt[t], t = root, nxt[t]
            return root

        okall = True
        for i in range(rel.size):
            t = find(int(rel[i]))
            if t > dl[i]:
                okall = False
                break
            step_of[i] = t
            fill[t] += 1
            if fill[t] == U:
                nxt[t] = t + 1
        if okall:
            return U, step_of
        U += max(1, U // 4)


def _symbolic(A: CSCMatrix, order: int):
    """AMD + postorder composition and exact column patterns (shared
    logic with the level-unrolled engine — csparse::cs_schol analog)."""
    from .supernodal import _column_patterns
    n = A.n
    p = amd(order, A)
    if p is None:
        p = np.arange(n, dtype=_IDX)
    piv = _pinv(p)
    Cu0 = symperm(A, piv, values=False)
    p = p[post(etree(Cu0))]
    piv = _pinv(p)
    Cu = symperm(A, piv, values=False)
    parent = etree(Cu)
    cnt = counts(Cu, parent, post(parent))
    colptr, colrows = _column_patterns(Cu, parent, cnt)
    return p, piv, parent, cnt, colptr, colrows


def _build_panels(n, parent, cnt, colptr, colrows, wmax, tau, small_w):
    """Fundamental supernodes -> relaxed amalgamation -> pow2 splits."""
    from .. import native
    if n > 1:
        fuse = ((parent[:-1] == np.arange(1, n))
                & (cnt[1:] == cnt[:-1] - 1))
        starts = np.concatenate(
            [[0], np.where(~fuse)[0] + 1, [n]]).astype(_IDX)
    else:
        starts = np.arange(n + 1, dtype=_IDX)
    if native.available() and n:
        # C++ twin of the merge loop below (planner.cpp ts_amalg) —
        # identical output, parity-tested (test_native.py)
        mstarts, odptr, odcat = native.amalg(
            starts, colptr, colrows, cnt, tau, small_w, wmax)
        merged = [[int(mstarts[i]), int(mstarts[i + 1]),
                   odcat[odptr[i]:odptr[i + 1]], 0]
                  for i in range(len(mstarts) - 1)]
    else:
        groups = []
        for i in range(len(starts) - 1):
            c0, c1 = int(starts[i]), int(starts[i + 1])
            rows_full = colrows[colptr[c0]:colptr[c0 + 1]]
            od = rows_full[rows_full >= c1]
            groups.append([c0, c1, np.asarray(od, _IDX),
                           int(cnt[c0:c1].sum())])
        merged = [groups[0]] if groups else []
        for g in groups[1:]:
            a = merged[-1]
            w_m = g[1] - a[0]
            if w_m <= wmax:
                od_m = np.union1d(a[2], g[2])
                od_m = od_m[od_m >= g[1]]
                r_m = w_m + od_m.size
                nnz_m = a[3] + g[3]
                if nnz_m >= tau * max(r_m * w_m, 1) or w_m <= small_w:
                    merged[-1] = [a[0], g[1], od_m, nnz_m]
                    continue
            merged.append(g)
    panels: List[_Panel] = []
    col2p = np.zeros(n, dtype=_IDX)
    for c0, c1, od_rows, _nnz in merged:
        off = c0
        for w in _split_widths(c1 - c0, wmax):
            rest = np.arange(off + w, c1, dtype=_IDX)
            rows = np.concatenate([rest, od_rows])
            pid = len(panels)
            W = max(_pow2(w), 8)
            panels.append(_Panel(pid=pid, c0=off, w=w, W=W,
                                 pool=_poolw(W),
                                 rows=np.asarray(rows, _IDX)))
            col2p[off:off + w] = pid
            off += w
    return panels, col2p


def _coarsen_menu(dem: Dict[Tuple, np.ndarray], issued, coarser):
    """Greedy phase-menu coarsening: repeatedly move a phase's demand
    into a coarser (>= dims) phase while the ISSUED cost model says it
    helps — merging phases whose demand spikes land on different steps
    smooths the aggregate even when it inflates per-unit flops.
    Returns the key remap ({fine key -> final key})."""
    remap: Dict[Tuple, Tuple] = {k: k for k in dem}
    fine = sorted(dem, key=lambda k: dem[k].sum() * _slot_cost(k))
    eff: Dict[Tuple, np.ndarray] = {k: v.copy() for k, v in dem.items()}
    changed = True
    while changed:
        changed = False
        for k in fine:
            cur = remap[k]
            if cur not in eff:
                continue
            vk = dem[k]
            best, bestgain = cur, 0.0
            for q in coarser(cur):
                if q == cur or q not in eff or remap.get(q, q) != q:
                    continue
                gain = (issued(cur, eff[cur]) + issued(q, eff[q])
                        - issued(cur, eff[cur] - vk)
                        - issued(q, eff[q] + vk))
                if gain > bestgain:
                    best, bestgain = q, gain
            if best != cur:
                eff[cur] = eff[cur] - vk
                if eff[cur].max() == 0:
                    del eff[cur]
                eff[best] = eff[best] + vk
                remap[k] = best
                changed = True
    return remap


def _coarser_key(key):
    """Phases a unit may run in (same kind/pools, >= dims)."""
    kind = key[0]
    outs = []
    if kind in ("upd", "upds"):
        _, pd, ps, h, wd, ws = key
        smax = 32 if kind == "upds" else ps
        for h2 in H_CLASSES:
            if h2 < h:
                continue
            w2 = wd
            while w2 <= pd:
                s2 = ws
                while s2 <= smax:
                    outs.append((kind, pd, ps, h2, w2, s2))
                    s2 *= 2
                w2 *= 2
    elif kind == "updg":
        _, pd, h, wd, ws = key
        for h2 in H_CLASSES:
            if h2 < h:
                continue
            w2 = wd
            while w2 <= pd:
                s2 = ws
                while s2 <= 128:
                    outs.append((kind, pd, h2, w2, s2))
                    s2 *= 2
                w2 *= 2
    else:                                    # upda
        _, ps, h, ws = key
        for h2 in H_CLASSES:
            if h2 < h:
                continue
            s2 = ws
            while s2 <= 128:
                outs.append((kind, ps, h2, s2))
                s2 *= 2
    return outs


def _dp_bounds(nsteps: int, CL: np.ndarray, slotf: np.ndarray,
               max_segments: int) -> List[int]:
    """Round-3 segmentation: DP over candidate step boundaries with at
    most ``max_segments`` segments (one compiled program each).

    Update units mostly have width-1 windows (src and target on
    adjacent steps), so the EDF capacity is the per-step demand MAX,
    not ceil(total/steps) — modelling it as the latter made the DP
    pick boundaries blind to demand spikes (measured: EDF issued 2.3x
    the ceil model at n=262k).  TPUSPARSE_SEG_COMPILE_COST charges a
    flop-equivalent per extra segment (a segment program costs a
    ~fixed ~24 s relay compile) so one-shot factorizations can trade
    issued flops for first-run wall."""
    stride = max(1, nsteps // 192)
    cands = sorted(set(list(range(0, nsteps, stride)) + [nsteps]))
    B = len(cands)
    blkmax = np.zeros((B - 1, CL.shape[1]), dtype=np.int64)
    for bi in range(B - 1):
        blkmax[bi] = CL[cands[bi]:cands[bi + 1]].max(axis=0)

    def seg_cost(bi, bj):
        steps = cands[bj] - cands[bi]
        mx = blkmax[bi:bj].max(axis=0)
        return float((mx * steps * slotf).sum())

    INF = float("inf")
    dp = np.full((B, max_segments + 1), INF)
    back = np.full((B, max_segments + 1), -1, np.int64)
    dp[0, 0] = 0.0
    for j in range(1, B):
        for i in range(j):
            c = seg_cost(i, j)
            for s in range(1, max_segments + 1):
                v = dp[i, s - 1] + c
                if v < dp[j, s]:
                    dp[j, s] = v
                    back[j, s] = i
    per_seg = float(os.environ.get("TPUSPARSE_SEG_COMPILE_COST", "0"))
    sbest = int(np.argmin(dp[B - 1]
                          + per_seg * np.arange(max_segments + 1)))
    bnds = [B - 1]
    while bnds[-1] > 0:
        bnds.append(int(back[bnds[-1], sbest]))
        sbest -= 1
    return [cands[b] for b in reversed(bnds)]


def _cluster_caps(vecs: np.ndarray, weights: np.ndarray, P: int):
    """Greedy agglomerative clustering of per-chunk capacity vectors
    into <= P groups (the shape-signature budget = compiled-program
    budget): repeatedly merge the pair with the least ADDED issued cost
    (elementwise max capacity x chunk count x per-key slot cost).
    Returns (assign (nchunks,), cluster capacity matrix (P', K))."""
    nch = vecs.shape[0]
    uniq, inv = np.unique(vecs, axis=0, return_inverse=True)
    V = uniq.astype(np.float64)                 # (C, K) capacities
    sz = np.bincount(inv).astype(np.float64)    # chunks per cluster
    alive = np.ones(V.shape[0], bool)
    group = inv.copy()
    while int(alive.sum()) > max(P, 1):
        ai = np.where(alive)[0]
        Va, sa = V[ai], sz[ai]
        base = (Va * weights).sum(axis=1) * sa              # (C,)
        M = np.maximum(Va[:, None, :], Va[None, :, :])      # (C,C,K)
        cm = (M * weights).sum(axis=2) * (sa[:, None] + sa[None, :])
        inc = cm - base[:, None] - base[None, :]
        np.fill_diagonal(inc, np.inf)
        i, j = np.unravel_index(int(np.argmin(inc)), inc.shape)
        gi, gj = int(ai[i]), int(ai[j])
        V[gi] = np.maximum(V[gi], V[gj])
        sz[gi] += sz[gj]
        alive[gj] = False
        group[group == gj] = gi
    # compact group ids
    ids = {g: i for i, g in enumerate(np.unique(group))}
    assign = np.array([ids[g] for g in group], np.int64)
    caps = np.stack([V[g] for g in np.unique(group)]).astype(np.int64)
    return assign, caps


def _plan_tic(label, _state={"t": None}):
    """Env-gated (TPUSPARSE_PLAN_TIMING=1) section timer for
    plan_superscan — prints elapsed time since the previous tic."""
    import sys
    import time as _time
    if not os.environ.get("TPUSPARSE_PLAN_TIMING"):
        return
    now = _time.perf_counter()
    if _state["t"] is not None:
        print(f"plan[{label}]: {now - _state['t']:.2f}s",
              file=sys.stderr, flush=True)
    _state["t"] = now


def plan_superscan(A: CSCMatrix, order: int = 1, wmax: int = None,
                   tau: float = 0.9, small_w: int = 8,
                   max_segments: int = 10,
                   lu_extras: bool = False) -> SuperscanPlan:
    """``wmax=None`` auto-selects the panel-width cap from the fill
    density: narrow-front problems (2D-grid-like, lnz/n ~ 40) pad far
    less with wmax=32 (measured 0.84 -> 0.66 waste at n=262k) while
    wide-front 3D problems want 128 (0.48 vs 0.51).  ``lu_extras``
    additionally emits, for every update phase, a diagonal-masked
    target array ``tgtu`` (in-diagonal positions -> -1) so the LU
    engine can scatter its U-side deltas without double-counting the
    diagonal block (see superscan_lu)."""
    n = A.n
    _plan_tic("start")
    p, piv, parent, cnt, colptr, colrows = _symbolic(A, order)
    _plan_tic("symbolic")
    if wmax is None:
        mean_fill = int(cnt.sum()) / max(n, 1)
        wmax = int(np.clip(_pow2(max(int(mean_fill) // 2, 1)), 32, 128))
    panels, col2p = _build_panels(n, parent, cnt, colptr, colrows,
                                  wmax, tau, small_w)
    _plan_tic("build_panels")

    # ---- storage layout: packed rows, two pools ---------------------------
    pool_rows = {pw: 0 for pw in POOLS}
    for pl in panels:
        pl.rlen = pl.W + (-(-pl.rows.size // 8) * 8)
        pl.rbase = pool_rows[pl.pool]
        pool_rows[pl.pool] += pl.rlen
    # pool = [real rows][identity 128/32 rows][dump 128 rows]
    id_base = {pw: pool_rows[pw] for pw in POOLS}
    dump_base = {pw: pool_rows[pw] + pw for pw in POOLS}
    pool_init = {}
    for pw in POOLS:
        buf = np.zeros((pool_rows[pw] + pw + H_CLASSES[-1], pw),
                       np.float32)
        buf[id_base[pw]:id_base[pw] + pw] = np.eye(pw, dtype=np.float32)
        pool_init[pw] = buf
    for pl in panels:                 # identity pad for width-padded diag
        for t in range(pl.w, pl.W):
            pool_init[pl.pool][pl.rbase + t, t] = 1.0

    # scatter the permuted lower triangle of A into the panels
    C = permute(A, piv, p, values=True)
    Cp, Ci, Cx = C.indptr, C.indices, C.data
    cols_of = np.repeat(np.arange(n, dtype=_IDX), np.diff(Cp))
    keep = Ci >= cols_of
    ent_i, ent_j, ent_x = Ci[keep], cols_of[keep], Cx[keep]
    ent_p = col2p[ent_j]
    order_e = np.argsort(ent_p, kind="stable")
    ent_i, ent_j, ent_x, ent_p = (ent_i[order_e], ent_j[order_e],
                                  ent_x[order_e], ent_p[order_e])
    bounds = np.searchsorted(ent_p, np.arange(len(panels) + 1))
    for pl in panels:
        lo, hi = bounds[pl.pid], bounds[pl.pid + 1]
        if lo == hi:
            continue
        ii, jj, xx = ent_i[lo:hi], ent_j[lo:hi], ent_x[lo:hi]
        lc = jj - pl.c0
        q = np.where(ii < pl.c0 + pl.w, ii - pl.c0,
                     pl.W + np.searchsorted(pl.rows, ii))
        pool_init[pl.pool][pl.rbase + q, lc] = xx

    _plan_tic("init_scatter")
    # ---- levels + work items (flat pair arrays) ----------------------------
    # pairs: prd/prs (P,); Iptr (P+1,) ranges into Isrc_all / Itgt_all /
    # Idg_all (the update rows, pool-local); Lptr (P+1,) ranges into
    # Lsrc_all / Lcol (the per-pair L0 rows and target-local columns).
    # Everything downstream is vectorized over these arrays — the
    # round-2 per-unit dict pipeline cost 14 s of the 33 s plan at
    # n=262k (ROADMAP round-3 item 2).
    from .. import native
    npan = len(panels)
    rbase_a = np.array([pl.rbase for pl in panels], _IDX)
    pool_a = np.array([pl.pool for pl in panels], _IDX)
    Wp_a = np.array([max(_pow2(pl.w), 8) for pl in panels], _IDX)
    level = np.zeros(max(npan, 1), dtype=_IDX)
    if native.available() and panels:
        # C++ pair construction (planner.cpp ts_ss_pairs) — identical
        # output to the Python fallback, parity-tested (test_native.py)
        rows_cat = (np.concatenate([pl.rows for pl in panels])
                    if any(pl.rows.size for pl in panels)
                    else np.zeros(0, _IDX))
        rptr = np.zeros(npan + 1, _IDX)
        np.cumsum([pl.rows.size for pl in panels], out=rptr[1:])
        c0a = np.array([pl.c0 for pl in panels], _IDX)
        wa = np.array([pl.w for pl in panels], _IDX)
        Wa = np.array([pl.W for pl in panels], _IDX)
        (prd, prs, Iptr, Lptr, Ipos, Itgt, Idg, Lpos, Lcol,
         lev) = native.ss_pairs(npan, n, c0a, wa, rptr,
                                rows_cat, col2p)
        level = lev.astype(_IDX)
        native.ss_finalize(prd, prs, Iptr, Lptr, wa, Ipos, Itgt, Lpos)
        Isrc_all, Itgt_all, Lsrc_all = Ipos, Itgt, Lpos
        Idg_all = Idg.astype(bool)
    else:
        pr_d, pr_s = [], []
        I_srcs, I_tgts, I_dgs, L_srcs, L_cols = [], [], [], [], []
        for d in panels:
            if d.rows.size == 0:
                continue
            tgt = col2p[d.rows]
            odpos = np.arange(d.rows.size, dtype=_IDX)
            for t in np.unique(tgt):
                s = panels[int(t)]
                sel = tgt == t
                l0_cols = d.rows[sel] - s.c0
                l0_src = d.W + odpos[sel]
                gesel = d.rows >= s.c0
                ge_rows = d.rows[gesel]
                ge_src = d.W + odpos[gesel]
                in_diag = ge_rows < s.c0 + s.w
                pos = np.searchsorted(s.rows, ge_rows)
                found = np.zeros(ge_rows.size, dtype=bool)
                inb = pos < s.rows.size
                found[inb] = s.rows[pos[inb]] == ge_rows[inb]
                ok = in_diag | found
                pr_d.append(d.pid)
                pr_s.append(s.pid)
                I_srcs.append(ge_src[ok])
                I_tgts.append(np.where(in_diag, ge_rows - s.c0,
                                       s.W + pos)[ok])
                I_dgs.append(in_diag[ok])
                L_srcs.append(l0_src)
                L_cols.append(l0_cols)
                level[s.pid] = max(level[s.pid], level[d.pid] + 1)
        prd = np.array(pr_d, _IDX)
        prs = np.array(pr_s, _IDX)
        Iptr = np.zeros(prd.size + 1, _IDX)
        np.cumsum([a.size for a in I_srcs], out=Iptr[1:])
        Lptr = np.zeros(prd.size + 1, _IDX)
        np.cumsum([a.size for a in L_srcs], out=Lptr[1:])

        def _cat(lst, dt):
            return (np.concatenate(lst).astype(dt) if lst
                    else np.zeros(0, dt))

        Isrc_all = _cat(I_srcs, _IDX)
        Itgt_all = _cat(I_tgts, _IDX)
        Idg_all = _cat(I_dgs, bool)
        Lsrc_all = _cat(L_srcs, _IDX)
        Lcol = _cat(L_cols, _IDX)
    P = int(prd.size)
    Kp = np.diff(Iptr)                          # per-pair update rows
    Jp_true = np.diff(Lptr)                     # per-pair L0 columns
    _plan_tic("pairs")
    nlevels = int(level.max()) + 1 if panels else 0
    for pl in panels:
        pl.level = int(level[pl.pid])

    # ---- explode fat levels into multiple STEPS ---------------------------
    # per-segment capacities are maxima over the segment's steps, so a
    # level much fatter than its neighbours would force idle slots
    # everywhere else (measured occupancy 0.38 at n=262k before this).
    # Splitting a fat level across ceil(load/median) steps is always
    # legal (panels at one level are independent); panels round-robin
    # over the level's steps and their updates inherit the step windows.
    lvl_load = np.zeros(max(nlevels, 1))
    if P:
        wd_pair = Wp_a[prd]
        ws_pair = Wp_a[prs]
        np.add.at(lvl_load, level[prs],
                  2.0 * Kp * wd_pair * ws_pair)
    nzl = lvl_load[lvl_load > 0]
    med = float(np.median(nzl)) if nzl.size else 1.0
    # MEASURED: splitting multiplies the one-slot-per-step floors faster
    # than it shrinks capacity variance (median split: 3D 0.49 -> 0.76
    # waste; 8x-median split: 3D 0.55, 2D 0.87) — so splitting is OFF by
    # default (split_8x_median=inf keeps steps == levels); the machinery
    # stays for problems with a single monster level.
    split_den = float(os.environ.get("TPUSPARSE_SPLIT_MED", "0")) or \
        float("inf")
    m_L = np.clip(np.ceil(lvl_load / max(split_den * med, 1.0)),
                  1, 64).astype(np.int64)[:max(nlevels, 1)]
    step0 = np.zeros(max(nlevels, 1) + 1, np.int64)
    np.cumsum(m_L, out=step0[1:])
    nsteps = int(step0[nlevels]) if nlevels else 0
    rrob: Dict[Tuple, int] = {}
    panel_step = np.zeros(len(panels), np.int64)
    for pl in panels:
        kk = (pl.level, pl.pool, pl.W)
        i = rrob.get(kk, 0)
        rrob[kk] = i + 1
        panel_step[pl.pid] = step0[pl.level] + (i % m_L[pl.level])

    _plan_tic("steps")
    # chol items per (step, pool, W); trsm units per (step, key)
    chol_items: Dict[Tuple, List] = {}
    trsm_items: Dict[Tuple, List] = {}
    for pl in panels:
        st = int(panel_step[pl.pid])
        chol_items.setdefault((st, ("chol", pl.pool, pl.W)),
                              []).append(pl.rbase)
        off = 0
        while off < pl.rows.size:
            h = _hclass(min(pl.rows.size - off, H_CLASSES[-1]))
            m = min(h, pl.rows.size - off)
            rows_q = pl.rbase + pl.W + off + np.arange(m)   # exact size
            trsm_items.setdefault(
                (st, ("trsm", pl.pool, h, pl.W)), []).append(
                    (pl.pid, rows_q))
            off += m

    # ---- update units as flat parallel arrays ------------------------------
    # one unit = one <=128-row chunk of one pair; u_* arrays carry its
    # pair id, row offset, true row count, phase-key id, and its EDF
    # release/deadline steps.  No per-unit Python objects.
    HMAX = H_CLASSES[-1]
    agg_on = (not lu_extras
              and os.environ.get("TPUSPARSE_AGG", "0") == "1")
    agg_mmax = int(os.environ.get("TPUSPARSE_AGG_MMAX", "1024"))
    m_pan = np.array([pl.rows.size for pl in panels] or [0], _IDX)
    agg_d = agg_on & (m_pan > 0) & (m_pan <= agg_mmax)
    agg_pair = agg_d[prd] if P else np.zeros(0, bool)
    ukeys: List[Tuple] = []
    _kindex: Dict[Tuple, int] = {}

    def _key_id(key: Tuple) -> int:
        i = _kindex.get(key)
        if i is None:
            i = _kindex[key] = len(ukeys)
            ukeys.append(key)
        return i

    def _lg(a):
        return np.round(np.log2(a)).astype(_IDX)

    if P:
        rel_pair = panel_step[prd] + 1
        dl_pair = panel_step[prs]
    po = np.where(~agg_pair)[0] if P else np.zeros(0, _IDX)
    if po.size:
        Jp2 = np.maximum(
            1 << np.ceil(np.log2(np.maximum(Jp_true[po], 1))
                         ).astype(_IDX), 8)
        sparse_p = ((Jp2 * _SPARSEJ_RATIO <= ws_pair[po])
                    & (Jp2 <= _SPARSEJ_CAP))
        wsJ_po = np.where(sparse_p, Jp2, ws_pair[po])
        nck = -(-Kp[po] // HMAX)
        NU = int(nck.sum())
        iu = np.repeat(np.arange(po.size, dtype=_IDX), nck)
        u_pair = po[iu]
        u_off = _ranges(nck) * HMAX
        u_m = np.minimum(Kp[u_pair] - u_off, HMAX)
        lg_h = np.ceil(np.log2(np.maximum(u_m, 8))).astype(_IDX)
        code = ((sparse_p[iu].astype(_IDX) << 20)
                | ((pool_a[prd][u_pair] == POOLS[1]).astype(_IDX) << 19)
                | ((pool_a[prs][u_pair] == POOLS[1]).astype(_IDX) << 18)
                | (lg_h << 12) | (_lg(wd_pair[u_pair]) << 6)
                | _lg(wsJ_po[iu]))
        ucodes, u_kid0 = np.unique(code, return_inverse=True)
        kmap = np.empty(ucodes.size, _IDX)
        for ci, c in enumerate(ucodes):
            c = int(c)
            kmap[ci] = _key_id(
                ("upds" if (c >> 20) & 1 else "upd",
                 POOLS[(c >> 19) & 1], POOLS[(c >> 18) & 1],
                 1 << ((c >> 12) & 63), 1 << ((c >> 6) & 63),
                 1 << (c & 63)))
        u_kid = kmap[u_kid0]
        u_rel = rel_pair[u_pair]
        u_dl = dl_pair[u_pair]
    else:
        NU = 0
        u_pair = u_off = u_m = u_kid = u_rel = u_dl = \
            np.zeros(0, _IDX)

    # ---- aggregated (multifrontal-style) updates, TPUSPARSE_AGG=1 ----------
    # Descendants with 0 < m <= AGG_MMAX od rows compute their od x od
    # update matrix ONCE ("updg": Delta = Lod @ Lod^T in column strips
    # of <= AGG_WCAP cols, rows [first live row, m) — a trapezoid,
    # because strip c's first live row tracks its first column) into
    # the per-step scratch buffer; each ancestor pair then applies its
    # sub-block by a 2-D gather + element scatter-add ("upda", zero
    # flops).  MEASURED RESULT (round 3, BASELINE.md "aggregation
    # experiment"): this TIES the per-pair pipeline, slightly worse —
    # 2D n=262k waste 0.69 vs 0.66, canonical 3D 0.54 vs 0.48 — because
    # the pair pipeline is already trapezoid-optimal and both pay the
    # same 8-row/8-lane slot quantization (the real 2D floor).  OFF by
    # default; kept env-gated for pattern families with much higher
    # ancestor fan-out per descendant, where one GEMM amortizes over
    # more applies.  Reference semantics identical either way
    # (csparse::cs_chol trailing update; CHOLMOD-style assembly).
    AGG_WCAP = int(os.environ.get("TPUSPARSE_AGG_WCAP", "32"))
    NA = NB = NS = 0
    step_scratch = np.zeros(max(nsteps, 1), np.int64)
    if P and bool(agg_pair.any()):
        ap = np.where(agg_pair)[0]               # aggregated pairs
        d_ap = prd[ap]
        Wd_ap = Wp_a[d_ap]
        a0_ap = Isrc_all[Iptr[ap]] - Wd_ap       # first live od position
        b0_ap = Lsrc_all[Lptr[ap]] - Wd_ap       # first L0 od position
        J_ap = Jp_true[ap]
        wc_pan = np.where(m_pan <= 128, AGG_WCAP, 128)
        wc_ap = wc_pan[d_ap]
        big = np.iinfo(np.int64).max
        # sub-pairs: split column ranges at strip boundaries
        c_lo = b0_ap // wc_ap
        c_hi = (b0_ap + J_ap - 1) // wc_ap
        nsp = c_hi - c_lo + 1
        SP = int(nsp.sum())
        sp_ap = np.repeat(np.arange(ap.size, dtype=_IDX), nsp)
        sp_ci = c_lo[sp_ap] + _ranges(nsp)
        sp_lo = np.maximum(b0_ap[sp_ap], sp_ci * wc_ap[sp_ap])
        sp_hi = np.minimum(b0_ap[sp_ap] + J_ap[sp_ap],
                           (sp_ci + 1) * wc_ap[sp_ap])
        sp_J = sp_hi - sp_lo
        # strips = unique (descendant, column chunk)
        scode = d_ap[sp_ap] * (1 << 24) + sp_ci
        scu, sp_strip = np.unique(scode, return_inverse=True)
        st_d = scu >> 24
        st_ci = scu & ((1 << 24) - 1)
        NS = st_d.size
        st_alo = np.full(NS, big, np.int64)
        np.minimum.at(st_alo, sp_strip, a0_ap[sp_ap])
        st_rows = m_pan[st_d] - st_alo
        st_w = np.minimum(wc_pan[st_d],
                          m_pan[st_d] - st_ci * wc_pan[st_d])
        # strip-level EDF: each strip group (its "updg" GEMM chunks plus
        # the "upda" applies that read it) is independently placeable in
        # [step(d)+1, min step of the ancestors its columns touch] —
        # far-column strips have wide windows, recovering the schedule
        # slack the old per-pair pipeline exploited (descendant-level
        # pinning measured occupancy 0.65 vs the pair engine's 0.77)
        st_rel = panel_step[st_d] + 1
        st_dl = np.full(NS, big, np.int64)
        np.minimum.at(st_dl, sp_strip, panel_step[prs[ap[sp_ap]]])
        ords2 = np.argsort(st_dl, kind="stable")
        dem0 = np.cumsum(np.bincount(st_dl[ords2],
                                     minlength=max(nsteps, 1)))
        U0 = max(1, int(np.ceil(
            dem0 / np.arange(1, max(nsteps, 1) + 1)).max()))
        _, tpl = _edf(max(nsteps, 1), st_rel[ords2], st_dl[ords2], U0)
        st_step = np.empty(NS, np.int64)
        st_step[ords2] = tpl
        # scratch layout: strips packed per step, trailing dump row
        ords = np.argsort(st_step, kind="stable")
        cum = np.cumsum(st_rows[ords]) - st_rows[ords]
        stp = st_step[ords]
        newg = np.concatenate([[True], stp[1:] != stp[:-1]])
        gidx = np.where(newg)[0]
        st_base = np.empty(NS, np.int64)
        st_base[ords] = cum - np.repeat(
            cum[gidx], np.diff(np.concatenate([gidx, [NS]])))
        np.add.at(step_scratch, st_step, st_rows)
        # A units: <=AGG_HCAP-row chunks of each strip (smaller chunks
        # pad the trapezoid tails less; measured best near 32)
        AGG_HCAP = int(os.environ.get("TPUSPARSE_AGG_HCAP", "32"))
        anck = -(-st_rows // AGG_HCAP)
        NA = int(anck.sum())
        ga_strip = np.repeat(np.arange(NS, dtype=_IDX), anck)
        ga_off = _ranges(anck) * AGG_HCAP
        ga_m = np.minimum(st_rows[ga_strip] - ga_off, AGG_HCAP)
        lg_ah = np.ceil(np.log2(np.maximum(ga_m, 8))).astype(_IDX)
        lg_aw = np.ceil(np.log2(np.maximum(st_w[ga_strip], 8))
                        ).astype(_IDX)
        acode = (((pool_a[st_d][ga_strip] == POOLS[1]).astype(_IDX)
                  << 20)
                 | (lg_ah << 12)
                 | (_lg(Wp_a[st_d][ga_strip]) << 6) | lg_aw)
        acu, akid0 = np.unique(acode, return_inverse=True)
        akmap = np.empty(acu.size, _IDX)
        for ci, c in enumerate(acu):
            c = int(c)
            akmap[ci] = _key_id(
                ("updg", POOLS[(c >> 20) & 1],
                 1 << ((c >> 12) & 63), 1 << ((c >> 6) & 63),
                 1 << (c & 63)))
        ga_kid = akmap[akid0]
        ga_step = st_step[ga_strip]
        # B units: <=128-row chunks of each sub-pair's live row list
        K_sp = Kp[ap][sp_ap]
        bnck = -(-K_sp // HMAX)
        NB = int(bnck.sum())
        gb_sp = np.repeat(np.arange(SP, dtype=_IDX), bnck)
        gb_off = _ranges(bnck) * HMAX
        gb_m = np.minimum(K_sp[gb_sp] - gb_off, HMAX)
        lg_bh = np.ceil(np.log2(np.maximum(gb_m, 8))).astype(_IDX)
        lg_bw = np.ceil(np.log2(np.maximum(sp_J[gb_sp], 8))
                        ).astype(_IDX)
        bcode = (((pool_a[prs[ap[sp_ap[gb_sp]]]] == POOLS[1])
                  .astype(_IDX) << 20)
                 | (lg_bh << 12) | lg_bw)
        bcu, bkid0 = np.unique(bcode, return_inverse=True)
        bkmap = np.empty(bcu.size, _IDX)
        for ci, c in enumerate(bcu):
            c = int(c)
            bkmap[ci] = _key_id(
                ("upda", POOLS[(c >> 20) & 1],
                 1 << ((c >> 12) & 63), 1 << (c & 63)))
        gb_kid = bkmap[bkid0]
        gb_step = st_step[sp_strip[gb_sp]]

    _plan_tic("units")
    # ---- segmentation (DP over the step axis) ------------------------------
    # fine per-step, per-phase counts
    fine_keys = sorted({k for (_, k) in chol_items}
                       | {k for (_, k) in trsm_items}
                       | set(ukeys))
    kidx = {k: i for i, k in enumerate(fine_keys)}
    CL = np.zeros((max(nsteps, 1), len(fine_keys)), dtype=np.int64)
    for (L, k), v in chol_items.items():
        CL[L, kidx[k]] += len(v)
    for (L, k), v in trsm_items.items():
        CL[L, kidx[k]] += len(v)
    ukid2fine = np.array([kidx[k] for k in ukeys] or [0], np.int64)
    if NU:
        np.add.at(CL, (u_dl, ukid2fine[u_kid]), 1)
    if NA:
        np.add.at(CL, (ga_step, ukid2fine[ga_kid]), 1)
    if NB:
        np.add.at(CL, (gb_step, ukid2fine[gb_kid]), 1)
    slotf = np.array([_slot_cost(k) for k in fine_keys], np.float64)

    # ---- segmentation mode ------------------------------------------------
    # "cluster" (default): uniform fixed-S step chunks whose per-chunk
    # capacity vectors are clustered into <= TPUSPARSE_SEG_PROGRAMS
    # shared SHAPE SIGNATURES — fine per-chunk capacities (low issued
    # flops, high occupancy) at a tiny compiled-program bound, because
    # the factor cache keys programs by signature.  Measured 2D 262k
    # with the SHIPPED defaults (distribution-optimal rungs, global
    # branch budget — _finalize_ladders): waste 0.484 / occ 0.999 /
    # issued 4.68G at 8 programs, vs the round-4 geometric cap-6
    # ladder's 0.553/0.715/5.40G and round-3's 0.660/0.666/7.09G.  "dp"
    # (TPUSPARSE_SEG_MODE=dp): DP over candidate boundaries, one
    # program per segment — kept for plans the chunk model fits badly.
    # The switch ladders below trim each phase's ISSUED work to the
    # per-step active count at runtime in both modes, so idle capacity
    # costs shape only, not flops.
    seg_mode = os.environ.get("TPUSPARSE_SEG_MODE", "cluster")
    if (P and bool(agg_pair.any())) or nsteps == 0:
        seg_mode = "dp"
    nprog_cap = min(max_segments, int(os.environ.get(
        "TPUSPARSE_SEG_PROGRAMS", "8")))
    forced_caps = None          # cluster mode: per-chunk {key: capacity}
    global_remap = None         # cluster mode: one menu for all chunks
    if seg_mode == "cluster":
        nch_env = os.environ.get("TPUSPARSE_SEG_CHUNKS")
        # default chunk size ~2 steps (cap 192 chunks): plan-side sweep
        # at canonical 3D n=13,824 measured waste 0.4092 (S_chunk=4) ->
        # 0.3990 (S=3) -> 0.3970 (S=2, the knee; S=1 only 0.3969 and
        # occupancy drops), 2D n=262,144: 0.4839 -> 0.4696, 3D
        # n=110,592: 0.1529 -> 0.1475 — programs stay at 8 in every
        # case (shared cluster signatures), the cost is one extra relay
        # dispatch per chunk at factor time (~10-20 ms each)
        ncht = (int(nch_env) if nch_env
                else min(192, max(1, -(-nsteps // 2))))
        S_chunk = -(-nsteps // max(min(ncht, nsteps), 1))
        nchunks = -(-nsteps // S_chunk)
        bnds = [min(i * S_chunk, nsteps) for i in range(nchunks + 1)]

        # global phase-menu coarsening with a chunk-aware issued model
        def _chunkmax(v):
            pad = nchunks * S_chunk - v.size
            vv = (np.concatenate([v, np.zeros(pad, v.dtype)])
                  if pad else v)
            return vv.reshape(nchunks, S_chunk).max(axis=1)

        DEMG = np.zeros((max(len(ukeys), 1), max(nsteps, 1)), np.int64)
        if NU:
            np.add.at(DEMG, (u_kid, u_dl), 1)
        demG = {ukeys[i]: DEMG[i] for i in range(len(ukeys))
                if DEMG[i].any()}

        def _issuedG(k, v):
            return (float(_chunkmax(v).sum()) * S_chunk
                    * _slot_cost(k))

        global_remap = _coarsen_menu(demG, _issuedG, _coarser_key)
        finG: List[Tuple] = []
        finG_index: Dict[Tuple, int] = {}
        fin_of_kid_G = np.full(max(len(ukeys), 1), -1, np.int64)
        for i, k in enumerate(ukeys):
            if k not in demG:
                continue
            fk = global_remap[k]
            if fk not in finG_index:
                finG_index[fk] = len(finG)
                finG.append(fk)
            fin_of_kid_G[i] = finG_index[fk]
        # capacity keyspace: final update keys + chol/trsm keys
        pool_keys = [k for k in fine_keys if k[0] in ("chol", "trsm")]
        allK = finG + pool_keys
        allK_index = {k: i for i, k in enumerate(allK)}
        wK = np.array([_slot_cost(k) for k in allK], np.float64) \
            * S_chunk
        # fine per-chunk capacities (EDF for updates, per-step max for
        # chol/trsm), then cluster into <= nprog_cap signatures
        cap_vecs = np.zeros((nchunks, len(allK)), np.int64)
        ordG = (np.argsort(u_dl, kind="stable") if NU
                else np.zeros(0, _IDX))
        dlG = u_dl[ordG]
        ufidG = (fin_of_kid_G[u_kid[ordG]] if NU
                 else np.zeros(0, np.int64))
        for ci in range(nchunks):
            lo, hi = bnds[ci], bnds[ci + 1]
            steps_c = hi - lo
            a0, a1 = np.searchsorted(dlG, [lo, hi])
            cu, cf = ordG[a0:a1], ufidG[a0:a1]
            for f in np.unique(cf):
                us = cu[cf == f]
                rel_c = np.maximum(u_rel[us], lo) - lo
                dl_c = u_dl[us] - lo
                demand = np.cumsum(np.bincount(dl_c,
                                               minlength=steps_c))
                U0 = max(1, int(np.ceil(
                    demand / np.arange(1, steps_c + 1)).max()))
                U, step_of = _edf(steps_c, rel_c, dl_c, U0)
                fill = np.bincount(step_of, minlength=steps_c)
                cap_vecs[ci, f] = int(fill.max())
            for k in pool_keys:
                cap_vecs[ci, allK_index[k]] = int(
                    CL[lo:hi, kidx[k]].max())
        assign, caps = _cluster_caps(cap_vecs, wK, nprog_cap)
        forced_caps = [
            {allK[ki]: int(caps[assign[ci], ki])
             for ki in range(len(allK)) if caps[assign[ci], ki] > 0}
            for ci in range(nchunks)]
        _plan_tic("cluster")
    else:
        bnds = _dp_bounds(nsteps, CL, slotf, max_segments)
        _plan_tic("dp")

    # ---- per segment: menu coarsening + EDF + emission ---------------------
    segments: List[_Segment] = []
    flops_padded = 0
    slots_used = 0
    slots_issued = 0
    # ladder-eligible phases are collected here and finalized AFTER the
    # loop: rung values are chosen per (cluster, key) from the
    # aggregate fill distribution (_finalize_ladders), so chunks of one
    # cluster share rung lists and program signatures stay shared
    lad_pend: List[Tuple] = []
    seg_gids = (assign if seg_mode == "cluster"
                else np.arange(len(bnds) - 1, dtype=np.int64))

    # units pre-sorted by deadline: each segment is a contiguous slice
    order_u = (np.argsort(u_dl, kind="stable") if NU
               else np.zeros(0, _IDX))
    dl_sorted = u_dl[order_u]

    S_pad = (bnds[1] - bnds[0]) if seg_mode == "cluster" else None

    for si in range(len(bnds) - 1):
        lo, hi = bnds[si], bnds[si + 1]
        steps = hi - lo
        # cluster mode pads every chunk's arrays to S_pad steps so the
        # last (short) chunk shares the cluster's shape signature; the
        # padded steps carry -1 / identity / dump indices (no-ops)
        spad = S_pad if S_pad is not None else steps
        seg = _Segment(lo=lo, hi=hi)
        a0, a1 = np.searchsorted(dl_sorted, [lo, hi])
        seg_u = order_u[a0:a1]           # this segment's units, dl order
        # --- greedy phase-menu coarsening --------------------------------
        # cost model works on PER-STEP DEADLINE DEMAND vectors, not
        # totals: most units have width-1 windows, so the achievable
        # capacity is ~max per-step demand — merging phases whose
        # demand spikes land on DIFFERENT steps smooths the aggregate
        # even when it inflates per-unit flops (the 2D-chain regime).
        DEM = np.zeros((max(len(ukeys), 1), steps), np.int64)
        if seg_u.size:
            np.add.at(DEM, (u_kid[seg_u], u_dl[seg_u] - lo), 1)
        sa = (np.where((ga_step >= lo) & (ga_step < hi))[0] if NA
              else np.zeros(0, _IDX))
        if sa.size:
            np.add.at(DEM, (ga_kid[sa], ga_step[sa] - lo), 1)
        sb = (np.where((gb_step >= lo) & (gb_step < hi))[0] if NB
              else np.zeros(0, _IDX))
        if sb.size:
            np.add.at(DEM, (gb_kid[sb], gb_step[sb] - lo), 1)
        dem: Dict[Tuple, np.ndarray] = {
            ukeys[i]: DEM[i] for i in range(len(ukeys))
            if DEM[i].any()}

        def issued(k, v):
            return float(v.max()) * steps * _slot_cost(k)

        # --- phase menu + unit grouping (selection keeps dl order) -------
        if forced_caps is not None:
            # cluster mode: the menu is GLOBAL (one coarsening for all
            # chunks) and the final keyset/capacities come from this
            # chunk's cluster — every chunk of a cluster emits the same
            # shapes, so their compiled programs are shared
            fcaps = forced_caps[si]
            fin_keys_seg = [k for k in allK if k in fcaps
                            and k[0] in ("upd", "upds")]
            fin_index = {k: i for i, k in enumerate(fin_keys_seg)}
            fin_of_kid = np.full(max(len(ukeys), 1), -1, np.int64)
            for i, k in enumerate(ukeys):
                if fin_of_kid_G[i] >= 0:
                    fk = finG[fin_of_kid_G[i]]
                    fin_of_kid[i] = fin_index.get(fk, -1)
        else:
            fcaps = None
            remap = _coarsen_menu(dem, issued, _coarser_key)
            fin_of_kid = np.full(max(len(ukeys), 1), -1, np.int64)
            fin_keys_seg = []
            fin_index = {}
            for i, k in enumerate(ukeys):
                if k not in dem:
                    continue
                fk = remap[k]
                if fk not in fin_index:
                    fin_index[fk] = len(fin_keys_seg)
                    fin_keys_seg.append(fk)
                fin_of_kid[i] = fin_index[fk]
        fi_seg = (fin_of_kid[u_kid[seg_u]] if seg_u.size
                  else np.zeros(0, np.int64))
        for f, fkey in enumerate(fin_keys_seg):
            if fkey[0] in ("updg", "upda"):
                continue            # aggregated pipeline emits these below
            us_idx = seg_u[fi_seg == f]
            # --- EDF assignment of units to steps -------------------------
            rel_arr = np.maximum(u_rel[us_idx], lo) - lo
            dl_arr = u_dl[us_idx] - lo
            demand = np.cumsum(np.bincount(dl_arr, minlength=steps))
            U0 = max(1, int(np.ceil(demand
                                    / np.arange(1, steps + 1)).max()))
            if fcaps is not None:
                # the cluster capacity is feasible by construction (it
                # is an elementwise max over feasible fine capacities)
                U0 = max(U0, fcaps[fkey])
            U, step_of = _edf(steps, rel_arr, dl_arr, U0)
            # slot within step = placement (deadline) order
            ordst = np.argsort(step_of, kind="stable")
            sts = step_of[ordst]
            slot_of = np.zeros(sts.size, np.int64)
            if sts.size:
                new = np.concatenate([[True], sts[1:] != sts[:-1]])
                gstart = np.where(new)[0]
                glen = np.diff(np.concatenate([gstart, [sts.size]]))
                cc = np.arange(sts.size) - np.repeat(gstart, glen)
                slot_of[ordst] = cc
            if fcaps is not None:
                U = max(U, fcaps[fkey])      # shared shape signature
            elif sts.size:
                # trim capacity to the ACTUAL max fill: the EDF
                # feasibility loop grows U in 25% jumps, so the returned
                # capacity can overshoot what the placement ever uses —
                # every trimmed slot is a steps-worth of pure idle issue
                U = min(U, int(slot_of.max()) + 1)
            # --- vectorized xs emission -----------------------------------
            kind, pd, ps, H, Wd, Ws = fkey
            base = step_of * U + slot_of                     # (nu_f,)
            pair_f = u_pair[us_idx]
            rb_d = rbase_a[prd[pair_f]]
            rb_s = rbase_a[prs[pair_f]]
            m_arr = u_m[us_idx]
            uu = np.repeat(np.arange(us_idx.size, dtype=_IDX), m_arr)
            within = _ranges(m_arr)
            ppos = (Iptr[pair_f] + u_off[us_idx])[uu] + within
            dst = base[uu] * H + within
            src = np.full(spad * U * H, -1, np.int32)
            tg = np.full(spad * U * H, -1, np.int32)
            src[dst] = rb_d[uu] + Isrc_all[ppos]
            tg[dst] = rb_s[uu] + Itgt_all[ppos]
            if lu_extras:
                tgu = np.full(spad * U * H, -1, np.int32)
                tgu[dst] = np.where(Idg_all[ppos], -1, tg[dst])
            # the pair's shared L0 row, replicated into each chunk slot
            j_arr = Jp_true[pair_f]
            vv = np.repeat(np.arange(us_idx.size, dtype=_IDX), j_arr)
            wthn = _ranges(j_arr)
            lpos = Lptr[pair_f][vv] + wthn
            l0 = np.full(spad * U * Ws, -1, np.int32)
            if kind == "upds":
                cmap = np.zeros(spad * U * Ws, np.int32)
                at = base[vv] * Ws + wthn
                l0[at] = rb_d[vv] + Lsrc_all[lpos]
                cmap[at] = Lcol[lpos]
            else:
                l0[base[vv] * Ws + Lcol[lpos]] = \
                    rb_d[vv] + Lsrc_all[lpos]
            seg.xs[fkey] = {"src": src.reshape(spad, U, H),
                            "tgt": tg.reshape(spad, U, H),
                            "l0": l0.reshape(spad, U, Ws)}
            if kind == "upds":
                seg.xs[fkey]["cmap"] = cmap.reshape(spad, U, Ws)
            if lu_extras:
                seg.xs[fkey]["tgtu"] = tgu.reshape(spad, U, H)
            fills = np.bincount(step_of, minlength=spad)
            lad_pend.append((si, fkey, U, fills, spad))
            slots_used += int(us_idx.size)

        def _pinned_slots(t_of):
            """Slot index within each step for step-pinned units (A/B);
            returns (U, base) with base = t*U + slot."""
            cnt = np.bincount(t_of, minlength=steps)
            U = max(1, int(cnt.max()))
            ordt = np.argsort(t_of, kind="stable")
            ts = t_of[ordt]
            slot = np.zeros(ts.size, np.int64)
            if ts.size:
                newt = np.concatenate([[True], ts[1:] != ts[:-1]])
                gs = np.where(newt)[0]
                gl = np.diff(np.concatenate([gs, [ts.size]]))
                cc = np.arange(ts.size) - np.repeat(gs, gl)
                slot[ordt] = cc
            return U, t_of * U + slot

        # --- aggregated GEMM ("updg") emission ----------------------------
        fa_seg = (fin_of_kid[ga_kid[sa]] if sa.size
                  else np.zeros(0, np.int64))
        for f, fkey in enumerate(fin_keys_seg):
            if fkey[0] != "updg":
                continue
            idx = sa[fa_seg == f]
            _, pd, H, Wd, Ws = fkey
            U, base = _pinned_slots(ga_step[idx] - lo)
            strips = ga_strip[idx]
            dpan = st_d[strips]
            m_arr = ga_m[idx]
            uu = np.repeat(np.arange(idx.size, dtype=_IDX), m_arr)
            within = _ranges(m_arr)
            pos = st_alo[strips][uu] + ga_off[idx][uu] + within
            dst = base[uu] * H + within
            srcg = np.full(steps * U * H, -1, np.int32)
            swr = np.full(steps * U * H, -1, np.int32)
            srcg[dst] = rbase_a[dpan][uu] + Wp_a[dpan][uu] + pos
            swr[dst] = st_base[strips][uu] + ga_off[idx][uu] + within
            w_arr = st_w[strips]
            vv = np.repeat(np.arange(idx.size, dtype=_IDX), w_arr)
            wthn = _ranges(w_arr)
            colpos = (st_ci[strips] * wc_pan[st_d[strips]])[vv] + wthn
            l0g = np.full(steps * U * Ws, -1, np.int32)
            l0g[base[vv] * Ws + wthn] = \
                rbase_a[dpan][vv] + Wp_a[dpan][vv] + colpos
            seg.xs[fkey] = {"src": srcg.reshape(steps, U, H),
                            "l0": l0g.reshape(steps, U, Ws),
                            "swr": swr.reshape(steps, U, H)}
            flops_padded += steps * U * _slot_flops(fkey)
        # --- aggregated apply ("upda") emission ----------------------------
        fb_seg = (fin_of_kid[gb_kid[sb]] if sb.size
                  else np.zeros(0, np.int64))
        for f, fkey in enumerate(fin_keys_seg):
            if fkey[0] != "upda":
                continue
            idx = sb[fb_seg == f]
            _, ps, H, Ws = fkey
            U, base = _pinned_slots(gb_step[idx] - lo)
            sp = gb_sp[idx]
            pr = ap[sp_ap[sp]]                      # original pair ids
            strips = sp_strip[sp]
            m_arr = gb_m[idx]
            uu = np.repeat(np.arange(idx.size, dtype=_IDX), m_arr)
            within = _ranges(m_arr)
            ipos = (Iptr[pr] + gb_off[idx])[uu] + within
            dst = base[uu] * H + within
            srd = np.full(steps * U * H, -1, np.int32)
            tgb = np.full(steps * U * H, -1, np.int32)
            srd[dst] = (st_base[strips][uu]
                        + (Isrc_all[ipos] - Wp_a[prd[pr]][uu])
                        - st_alo[strips][uu])
            tgb[dst] = rbase_a[prs[pr]][uu] + Itgt_all[ipos]
            j_arr = sp_J[sp]
            vv = np.repeat(np.arange(idx.size, dtype=_IDX), j_arr)
            wthn = _ranges(j_arr)
            bcol = np.full(steps * U * Ws, -1, np.int32)
            cmap = np.zeros(steps * U * Ws, np.int32)
            at = base[vv] * Ws + wthn
            bcol[at] = (sp_lo[sp] - st_ci[strips]
                        * wc_pan[st_d[strips]])[vv] + wthn
            lpos = (Lptr[pr] + sp_lo[sp]
                    - b0_ap[sp_ap[sp]])[vv] + wthn
            cmap[at] = Lcol[lpos]
            seg.xs[fkey] = {"srd": srd.reshape(steps, U, H),
                            "tgt": tgb.reshape(steps, U, H),
                            "bcol": bcol.reshape(steps, U, Ws),
                            "cmap": cmap.reshape(steps, U, Ws)}
        if sa.size:
            seg.scratch_rows = int(step_scratch[lo:hi].max()) + 1
        # chol / trsm phases: capacity = max per level (dp) or the
        # cluster's shared capacity (cluster mode)
        if fcaps is not None:
            ck = {k for k in fcaps if k[0] == "chol"}
        else:
            ck = {k for (L, k) in chol_items if lo <= L < hi}
        for k in sorted(ck):
            _, pw, W = k
            U = max(len(chol_items.get((L, k), []))
                    for L in range(lo, hi))
            if fcaps is not None:
                U = max(fcaps[k], U)
            arr = np.full((spad, U), id_base[pw], np.int32)
            fills = np.zeros(spad, np.int64)
            for L in range(lo, hi):
                for ui, rb in enumerate(chol_items.get((L, k), [])):
                    arr[L - lo, ui] = rb
                fills[L - lo] = len(chol_items.get((L, k), []))
            seg.xs[k] = {"dbase": arr}
            lad_pend.append((si, k, U, fills, spad))
            slots_used += sum(len(chol_items.get((L, k), []))
                              for L in range(lo, hi))
        if fcaps is not None:
            tk = {k for k in fcaps if k[0] == "trsm"}
        else:
            tk = {k for (L, k) in trsm_items if lo <= L < hi}
        for k in sorted(tk):
            _, pw, H, W = k
            U = max(len(trsm_items.get((L, k), []))
                    for L in range(lo, hi))
            if fcaps is not None:
                U = max(fcaps[k], U)
            rows = np.full((spad, U, H), dump_base[pw], np.int32)
            dbs = np.full((spad, U), id_base[pw], np.int32)
            fills = np.zeros(spad, np.int64)
            for L in range(lo, hi):
                for ui, (pid, rq) in enumerate(trsm_items.get((L, k), [])):
                    pl = panels[pid]
                    rows[L - lo, ui, :rq.size] = rq
                    dbs[L - lo, ui] = pl.rbase
                fills[L - lo] = len(trsm_items.get((L, k), []))
            seg.xs[k] = {"rows": rows, "dbase": dbs}
            lad_pend.append((si, k, U, fills, spad))
            slots_used += sum(len(trsm_items.get((L, k), []))
                              for L in range(lo, hi))
        segments.append(seg)

    fp_add, si_add = _finalize_ladders(segments, lad_pend, seg_gids,
                                       lu_extras)
    flops_padded += fp_add
    slots_issued += si_add
    _plan_tic("segments")
    lnz = int(cnt.sum())
    flops_true = int(np.sum(cnt.astype(np.float64) ** 2))
    return SuperscanPlan(
        n=n, perm=p, panels=panels, pool_rows=pool_rows,
        pool_init=pool_init, segments=segments, nlevels=nlevels,
        nsteps=nsteps,
        flops_true=flops_true, flops_padded=flops_padded, lnz=lnz,
        slots_used=slots_used, slots_issued=slots_issued)


# ------------------------------------------------------------------ device
_JIT_CACHE: Dict = {}


def _segment_factor(seg_keys: Tuple, shard_fn=None,
                    scratch_rows: int = 0, ladders=None) -> callable:
    """Shape-generic scan body for one segment: the phase list is
    static; every index array is a runtime input, so the compiled
    program is reused across matrices with the same signature.

    ``shard_fn`` (optional) is applied to the gathered per-step update
    batches (axis 0 = units) — the multi-chip driver passes a
    with_sharding_constraint so GSPMD splits the batched GEMMs over the
    mesh and all-reduces the scatter-adds (parallel.sharded).

    ``scratch_rows`` > 0 allocates the per-step scratch buffer that the
    aggregated update phases use: "updg" GEMMs write trapezoid chunks of
    each descendant's od x od update matrix there, and "upda" phases
    gather each ancestor pair's sub-block and scatter-add it into the
    target pool.  Scratch rows are only read in the step that wrote
    them, so one (scratch_rows, 128) carry serves the whole scan; its
    last row is the dump slot for padded indices.

    TPUSPARSE_PALLAS_CHOL=1 factors the batched diagonal blocks with
    the Pallas tile kernel (kernels.chol_tile, right-looking in VMEM)
    instead of jnp.linalg.cholesky — same NaN failure contract.

    ``ladders`` maps a phase key to its STATIC branch-size list: the
    phase becomes runtime-sized — a lax.switch over batch slices
    [0:bs], indexed by the per-step ``lvl`` scan input — so steps with
    few (or zero) active slots execute a small (or empty) branch
    instead of the full masked capacity.  Idle slots then cost nothing
    at runtime; capacity padding is shape-only (hardware-validated on
    axon: switch-in-scan compiles and runs, /tmp prototype round 4)."""
    has_agg = scratch_rows > 0
    use_pallas_chol = bool(os.environ.get("TPUSPARSE_PALLAS_CHOL"))
    use_pallas_trsm = bool(os.environ.get("TPUSPARSE_PALLAS_TRSM"))
    # per-step transient-gather budget: a single scan step whose unit
    # batch gathers >~150MB kernel-faults the axon worker (seg8 dp at
    # 3D n=262,144: the 2,580-unit step gathers 169MB and crashed 2/2
    # in round 5 after surviving 2/2 in round 3 — it straddles the
    # threshold).  Steps above the budget process their units in
    # sequential <=cap chunks INSIDE the body — same flops, same
    # scatter results (within one step, finalized source rows and
    # accumulating target rows are disjoint by the level schedule), no
    # planner/EDF change; steps under the cap compile to the identical
    # program.  Mirrors TPUSPARSE_SOLVE_SLOT_CAP on the solve side.
    gmb = float(os.environ.get("TPUSPARSE_STEP_GATHER_MB", "64"))
    gbytes = int(gmb * (1 << 20)) if gmb > 0 else 0

    def _cap(unit_bytes: int) -> int:
        return max(1, gbytes // max(unit_bytes, 1)) if gbytes else 1 << 30
    # the sharded body applies shard_fn to full-capacity batches; its
    # per-branch shapes would fight the mesh partitioner — mask mode
    ladders = {} if shard_fn is not None else (ladders or {})

    def run(pools: Dict[int, jnp.ndarray], xs: Dict):
        def body(carry, x):
            pools, scratch = carry
            pools = dict(pools)
            for key in seg_keys:               # 0. aggregated GEMMs
                if key[0] != "updg":
                    continue
                _, pd, H, Wd, Ws = key
                a = x[key]
                srci, l0i, swr = a["src"], a["l0"], a["swr"]
                flat_d = jax.lax.slice_in_dim(pools[pd], 0, Wd, axis=1)
                l1 = jnp.where((srci >= 0)[..., None],
                               flat_d[jnp.maximum(srci, 0)], 0.0)
                l0 = jnp.where((l0i >= 0)[..., None],
                               flat_d[jnp.maximum(l0i, 0)], 0.0)
                if shard_fn is not None:
                    l1 = shard_fn(l1)
                    l0 = shard_fn(l0)
                delta = jnp.einsum("uhw,usw->uhs", l1, l0,
                                   precision=HIGHEST)
                if Ws < scratch.shape[1]:
                    delta = jnp.pad(
                        delta, ((0, 0), (0, 0),
                                (0, scratch.shape[1] - Ws)))
                rows = jnp.where(swr >= 0, swr,
                                 scratch.shape[0] - 1).reshape(-1)
                scratch = scratch.at[rows].set(
                    delta.reshape(-1, scratch.shape[1]))
            for key in seg_keys:               # 0b. aggregated applies
                if key[0] != "upda":
                    continue
                _, ps, H, Ws = key
                a = x[key]
                srd, tgti = a["srd"], a["tgt"]
                bcol, cmap = a["bcol"], a["cmap"]
                rows = jnp.maximum(srd, 0)               # (U,H)
                lanes = jnp.maximum(bcol, 0)             # (U,Ws)
                sub = scratch[rows[:, :, None], lanes[:, None, :]]
                sub = jnp.where((srd >= 0)[:, :, None]
                                & (bcol >= 0)[:, None, :], sub, 0.0)
                rowi = jnp.maximum(tgti, 0)[:, :, None]
                coli = cmap[:, None, :]
                pools[ps] = pools[ps].at[
                    jnp.broadcast_to(rowi, sub.shape),
                    jnp.broadcast_to(coli, sub.shape)].add(-sub)
            for key in seg_keys:                       # 1. update phases
                if key[0] not in ("upd", "upds"):
                    continue

                def upd_bs(bs, key=key, a=x[key]):
                    kind, pd, ps, H, Wd, Ws = key
                    cap = _cap(max(H, Ws) * Wd * 4)

                    def br(pools):
                        if bs == 0:
                            return pools
                        flat_d = jax.lax.slice_in_dim(pools[pd], 0, Wd,
                                                      axis=1)
                        acc = pools[ps]
                        for c0 in range(0, bs, cap):
                            c1 = min(bs, c0 + cap)
                            srci = a["src"][c0:c1]
                            tgti = a["tgt"][c0:c1]
                            l0i = a["l0"][c0:c1]
                            l1 = jnp.where(
                                (srci >= 0)[..., None],
                                flat_d[jnp.maximum(srci, 0)], 0.0)
                            l0 = jnp.where(
                                (l0i >= 0)[..., None],
                                flat_d[jnp.maximum(l0i, 0)], 0.0)
                            if shard_fn is not None:
                                l1 = shard_fn(l1)
                                l0 = shard_fn(l0)
                            delta = jnp.einsum("uhw,usw->uhs", l1, l0,
                                               precision=HIGHEST)
                            if kind == "upds":
                                # column-compressed: 2-D element
                                # scatter at (target row, col) pairs
                                rowi = jnp.maximum(tgti, 0)[:, :, None]
                                coli = a["cmap"][c0:c1][:, None, :]
                                acc = acc.at[
                                    jnp.broadcast_to(rowi, delta.shape),
                                    jnp.broadcast_to(coli, delta.shape)
                                ].add(-delta)
                            else:
                                if Ws < acc.shape[1]:
                                    delta = jnp.pad(
                                        delta,
                                        ((0, 0), (0, 0),
                                         (0, acc.shape[1] - Ws)))
                                tgts = jnp.maximum(tgti, 0).reshape(-1)
                                acc = acc.at[tgts].add(
                                    -delta.reshape(-1, acc.shape[1]))
                        out = dict(pools)
                        out[ps] = acc
                        return out
                    return br

                lad = ladders.get(key)
                if lad is None:
                    pools = upd_bs(x[key]["src"].shape[0])(pools)
                else:
                    pools = jax.lax.switch(
                        x[key]["lvl"], [upd_bs(b) for b in lad], pools)
            for key in seg_keys:                       # 2. chol phases
                if key[0] != "chol":
                    continue

                def chol_bs(bs, key=key, a=x[key]):
                    _, pw, W = key
                    cap = _cap(W * W * 4)

                    def br(pools):
                        if bs == 0:
                            return pools
                        acc = pools[pw]
                        sl = jax.lax.slice_in_dim(pools[pw], 0, W,
                                                  axis=1)
                        for c0 in range(0, bs, cap):
                            c1 = min(bs, c0 + cap)
                            dbase = a["dbase"][c0:c1]        # (c,)
                            idx = (dbase[:, None]
                                   + jnp.arange(W)[None, :])
                            P = sl[idx]
                            low = jnp.tril(P)
                            sym = low + jnp.swapaxes(
                                jnp.tril(P, -1), 1, 2)
                            if use_pallas_chol:
                                from .kernels.chol_tile import \
                                    chol_tiles
                                Lkk = chol_tiles(sym)
                            else:
                                Lkk = jnp.linalg.cholesky(sym)
                            if W < acc.shape[1]:
                                Lkk = jnp.pad(
                                    Lkk, ((0, 0), (0, 0),
                                          (0, acc.shape[1] - W)))
                            acc = acc.at[idx.reshape(-1)].set(
                                Lkk.reshape(-1, acc.shape[1]))
                        out = dict(pools)
                        out[pw] = acc
                        return out
                    return br

                lad = ladders.get(key)
                if lad is None:
                    pools = chol_bs(x[key]["dbase"].shape[0])(pools)
                else:
                    pools = jax.lax.switch(
                        x[key]["lvl"], [chol_bs(b) for b in lad], pools)
            for key in seg_keys:                       # 3. trsm phases
                if key[0] != "trsm":
                    continue

                def trsm_bs(bs, key=key, a=x[key]):
                    _, pw, H, W = key
                    cap = _cap(H * W * 4)

                    def br(pools):
                        if bs == 0:
                            return pools
                        acc = pools[pw]
                        sl = jax.lax.slice_in_dim(pools[pw], 0, W,
                                                  axis=1)
                        for c0 in range(0, bs, cap):
                            c1 = min(bs, c0 + cap)
                            rows = a["rows"][c0:c1]
                            dbs = a["dbase"][c0:c1]
                            didx = dbs[:, None] + jnp.arange(W)[None, :]
                            Lkk = sl[didx]                  # (c, W, W)
                            X = sl[rows]                    # (c, H, W)
                            if use_pallas_trsm:
                                from .kernels.trsm_tile import \
                                    trsm_tiles_batched
                                Y = trsm_tiles_batched(Lkk, X)
                            else:
                                Y = jax.lax.linalg.triangular_solve(
                                    Lkk, X, left_side=False, lower=True,
                                    transpose_a=True)
                            if W < acc.shape[1]:
                                Y = jnp.pad(
                                    Y, ((0, 0), (0, 0),
                                        (0, acc.shape[1] - W)))
                                # pad cols of od rows are zero already,
                                # and Y pad cols are zero here
                            acc = acc.at[rows.reshape(-1)].set(
                                Y.reshape(-1, acc.shape[1]))
                        out = dict(pools)
                        out[pw] = acc
                        return out
                    return br

                lad = ladders.get(key)
                if lad is None:
                    pools = trsm_bs(x[key]["rows"].shape[0])(pools)
                else:
                    pools = jax.lax.switch(
                        x[key]["lvl"], [trsm_bs(b) for b in lad], pools)
            return (pools, scratch), None

        scratch0 = jnp.zeros((scratch_rows if has_agg else 1, 128),
                             jnp.float32)
        (pools, _), _ = jax.lax.scan(body, (pools, scratch0), xs)
        return pools

    return run


def _pools_sig(pools) -> Tuple:
    """Pool shapes AND shardings as part of every cached-program
    signature: AOT Compiled executables are shape- and sharding-exact
    (a jit would silently re-trace / reshard; the compiled form
    raises)."""
    def one(v):
        sh = getattr(v, "sharding", None)
        return (tuple(v.shape), repr(sh) if sh is not None else "")

    return tuple(sorted((k, one(v)) for k, v in pools.items()))


def _factor(plan: SuperscanPlan, pools):
    from .compilepool import compile_many
    jobs = []
    for seg in plan.segments:
        if not seg.xs:
            continue
        keys = tuple(sorted(seg.xs))
        lads = tuple(sorted((k, seg.ladders[k]) for k in seg.ladders))
        sig = ("factor", seg.scratch_rows, _pools_sig(pools),
               lads) + tuple(
            (k,) + tuple(a.shape) for k in keys
            for a in seg.xs[k].values())
        xs = {k: {nm: jnp.asarray(a) for nm, a in seg.xs[k].items()}
              for k in keys}
        for k, lvl in seg.lvls.items():
            xs[k]["lvl"] = jnp.asarray(lvl)
        jobs.append((sig, _segment_factor(
            keys, scratch_rows=seg.scratch_rows, ladders=seg.ladders),
            (pools, xs)))
    compile_many(_JIT_CACHE, jobs)
    for sig, _fn, (_p0, xs) in jobs:
        pools = _JIT_CACHE[sig](pools, xs)
    return pools


# ------------------------------------------------------------------ solve
def _solve_xs(plan: SuperscanPlan):
    """Per-segment solve schedules derived from the factor schedules:
    diag phase (cols + pool diag rows) per chol slot; od-axpy phase
    (pool rows, panel cols, global target rows) per trsm slot.
    Vectorized slot resolution: per pool, panel rbases are assigned in
    increasing order, so searchsorted maps every slot's dbase back to
    its panel in one pass (the per-slot Python loop cost ~a minute at
    n=2.36M)."""
    n = plan.n
    # per-pool sorted panel tables
    tables = {}
    for pw in plan.pool_init:
        ps = [pl for pl in plan.panels if pl.pool == pw]
        tables[pw] = dict(
            rb=np.array([pl.rbase for pl in ps], np.int64),
            c0=np.array([pl.c0 for pl in ps], np.int64),
            w=np.array([pl.w for pl in ps], np.int64),
            W=np.array([pl.W for pl in ps], np.int64),
            m=np.array([pl.rows.size for pl in ps], np.int64),
            rptr=np.concatenate(
                [[0], np.cumsum([pl.rows.size for pl in ps])]
            ).astype(np.int64),
            rcat=(np.concatenate([pl.rows for pl in ps])
                  if any(pl.rows.size for pl in ps)
                  else np.zeros(0, np.int64)))

    def _panels_of(pw, dbase):
        """Map slot dbase values to panel table indices (-1 = dump)."""
        T = tables[pw]
        d = dbase.astype(np.int64)
        i = np.searchsorted(T["rb"], d)
        ok = (i < T["rb"].size)
        i = np.minimum(i, max(T["rb"].size - 1, 0))
        ok &= (T["rb"][i] == d) if T["rb"].size else False
        return np.where(ok, i, -1)

    # the solve segmentation is DECOUPLED from the factor's: one solve
    # scan program per <=SOLVE_XS_MAX_BYTES of schedule arrays.  Fewer
    # factor segments (TPUSPARSE_SEG_COMPILE_COST / BENCH_SEGMENTS=8)
    # concentrate steps, and a single oversized solve program faults
    # the axon worker (observed at 262k/seg8: factor fine, solve
    # crashed the TPU worker); splitting along the step axis is always
    # legal — the scan is sequential over steps either way.
    max_bytes = int(os.environ.get("TPUSPARSE_SOLVE_XS_MAX_BYTES",
                                   str(96 << 20)))
    # per-STEP slot-capacity cap (VERDICT r3 item 3): coarse factor
    # segmentation (dp/seg8) packs ~4x the units per step, and the
    # axon worker kernel-faults on the resulting per-step gather/
    # scatter extents even after byte splitting (artifacts
    # bench_tpu_superscan_3d_262144_seg8*).  Steps whose capacity
    # exceeds the cap are split along the SLOT axis into sub-steps —
    # always legal: within one step the diag solves are independent
    # (disjoint panels) and the od-axpys scatter-add into LATER steps'
    # rows, so any chol-sub-steps-then-trsm-sub-steps order is a valid
    # refinement of the step (the backward scan sees the exact
    # reverse, which is the order it needs).
    slot_cap = int(os.environ.get("TPUSPARSE_SOLVE_SLOT_CAP", "1024"))

    def _cap_slots(seg_xs):
        if not seg_xs or slot_cap <= 0:
            return seg_xs
        if all(next(iter(d.values())).shape[1] <= slot_cap
               for d in seg_xs.values()):
            return seg_xs
        steps = next(iter(next(iter(seg_xs.values())).values())).shape[0]
        ck = sorted(k for k in seg_xs if k[0] == "chol")
        tk = sorted(k for k in seg_xs if k[0] == "trsm")
        nsl = {k: -(-next(iter(seg_xs[k].values())).shape[1]
                    // slot_cap) for k in seg_xs}
        S1 = max([nsl[k] for k in ck], default=0)
        S2 = max([nsl[k] for k in tk], default=0)
        out = {}
        for k, d in seg_xs.items():
            base = 0 if k[0] == "chol" else S1
            pw = k[1]
            fill = {"dbase": plan.pool_rows[pw],            # identity
                    "rows": plan.pool_rows[pw] + pw,        # dump row
                    "cols": n, "tgt": n}
            nd = {}
            for nm, a in d.items():
                U = a.shape[1]
                Upad = nsl[k] * slot_cap
                ap = np.full((steps, Upad) + a.shape[2:],
                             fill[nm], a.dtype)
                ap[:, :U] = a
                # (steps, nsl*cap, ...) -> sub-step rows at the key's
                # offset inside each step's (S1+S2)-row band
                na = np.full((steps, S1 + S2, slot_cap) + a.shape[2:],
                             fill[nm], a.dtype)
                na[:, base:base + nsl[k]] = ap.reshape(
                    (steps, nsl[k], slot_cap) + a.shape[2:])
                nd[nm] = na.reshape((steps * (S1 + S2), slot_cap)
                                    + a.shape[2:])
            out[k] = nd
        return out

    def _split(seg_xs):
        if not seg_xs:
            return [seg_xs]
        steps = next(iter(next(iter(seg_xs.values())).values())).shape[0]
        bytes_per_step = sum(a.nbytes // max(steps, 1)
                             for d in seg_xs.values()
                             for a in d.values())
        chunk = max(1, max_bytes // max(bytes_per_step, 1))
        if steps <= chunk:
            return [seg_xs]
        return [{k: {nm: a[lo:lo + chunk] for nm, a in d.items()}
                 for k, d in seg_xs.items()}
                for lo in range(0, steps, chunk)]

    out = []
    for seg in plan.segments:
        seg_xs = {}
        for key, arrs in seg.xs.items():
            if key[0] == "chol":
                _, pw, W = key
                T = tables[pw]
                d = arrs["dbase"]
                pi = _panels_of(pw, d)                      # (nst, U)
                ok = pi >= 0
                pis = np.maximum(pi, 0)
                c0s = np.where(ok, T["c0"][pis], 0)
                ws = np.where(ok, T["w"][pis], 0)
                cols = c0s[..., None] + np.arange(W)[None, None, :]
                cols = np.where(
                    np.arange(W)[None, None, :] < ws[..., None],
                    cols, n).astype(np.int32)
                seg_xs[key] = {"dbase": d, "cols": cols}
            elif key[0] == "trsm":
                _, pw, H, W = key
                T = tables[pw]
                d, rows = arrs["dbase"], arrs["rows"]
                pi = _panels_of(pw, d)
                ok = pi >= 0
                pis = np.maximum(pi, 0)
                c0s = np.where(ok, T["c0"][pis], 0)
                ws = np.where(ok, T["w"][pis], 0)
                cols = c0s[..., None] + np.arange(W)[None, None, :]
                cols = np.where(
                    np.arange(W)[None, None, :] < ws[..., None],
                    cols, n).astype(np.int32)
                rq = (rows.astype(np.int64)
                      - np.where(ok, T["rb"][pis] + T["W"][pis],
                                 0)[..., None])
                ms = np.where(ok, T["m"][pis], 0)
                valid = (rq >= 0) & (rq < ms[..., None]) & ok[..., None]
                gidx = np.where(ok, T["rptr"][pis], 0)[..., None]                     + np.clip(rq, 0, None)
                gidx = np.minimum(gidx, max(T["rcat"].size - 1, 0))
                tgt = np.where(valid,
                               (T["rcat"][gidx] if T["rcat"].size
                                else 0), n).astype(np.int32)
                seg_xs[key] = {"rows": rows, "cols": cols, "tgt": tgt}
        out.extend(_split(_cap_slots(seg_xs)))
    return out


def _segment_solve(seg_keys: Tuple, backward: bool,
                   shard_fn=None) -> callable:
    """``shard_fn`` (optional) is applied to the gathered per-step trsm
    row batches (axis 0 = slots) so GSPMD splits the od-GEMMs over the
    mesh and all-reduces the xpad scatter-adds (parallel.sharded)."""
    def run(pools, xpad, xs):
        def body(xpad, x):
            nn = xpad.shape[0] - 1
            if not backward:
                for key in seg_keys:
                    if key[0] != "chol":
                        continue
                    _, pw, W = key
                    dbase, cols = x[key]["dbase"], x[key]["cols"]
                    idx = dbase[:, None] + jnp.arange(W)[None, :]
                    Lkk = jax.lax.slice_in_dim(pools[pw], 0, W,
                                               axis=1)[idx]
                    xc = xpad[cols]
                    y = jax.lax.linalg.triangular_solve(
                        Lkk, xc[:, :, None], left_side=True,
                        lower=True)[:, :, 0]
                    xpad = xpad.at[cols.reshape(-1)].set(y.reshape(-1))
                for key in seg_keys:
                    if key[0] != "trsm":
                        continue
                    _, pw, H, W = key
                    a = x[key]
                    sl = jax.lax.slice_in_dim(pools[pw], 0, W, axis=1)
                    mask = a["tgt"] < nn
                    Y = jnp.where(mask[..., None], sl[a["rows"]], 0.0)
                    if shard_fn is not None:
                        Y = shard_fn(Y)
                    xc = xpad[a["cols"]]                     # (U,W)
                    delta = jnp.einsum("uhw,uw->uh", Y, xc,
                                       precision=HIGHEST)
                    xpad = xpad.at[a["tgt"].reshape(-1)].add(
                        -delta.reshape(-1))
            else:
                for key in seg_keys:
                    if key[0] != "trsm":
                        continue
                    _, pw, H, W = key
                    a = x[key]
                    sl = jax.lax.slice_in_dim(pools[pw], 0, W, axis=1)
                    mask = a["tgt"] < nn
                    Y = jnp.where(mask[..., None], sl[a["rows"]], 0.0)
                    if shard_fn is not None:
                        Y = shard_fn(Y)
                    xod = jnp.where(mask, xpad[a["tgt"]], 0.0)
                    delta = jnp.einsum("uhw,uh->uw", Y, xod,
                                       precision=HIGHEST)
                    xpad = xpad.at[a["cols"].reshape(-1)].add(
                        -delta.reshape(-1))
                for key in seg_keys:
                    if key[0] != "chol":
                        continue
                    _, pw, W = key
                    dbase, cols = x[key]["dbase"], x[key]["cols"]
                    idx = dbase[:, None] + jnp.arange(W)[None, :]
                    Lkk = jax.lax.slice_in_dim(pools[pw], 0, W,
                                               axis=1)[idx]
                    xc = xpad[cols]
                    y = jax.lax.linalg.triangular_solve(
                        Lkk, xc[:, :, None], left_side=True, lower=True,
                        transpose_a=True)[:, :, 0]
                    xpad = xpad.at[cols.reshape(-1)].set(y.reshape(-1))
            xpad = xpad.at[nn].set(0.0)
            return xpad, None

        xpad, _ = jax.lax.scan(body, xpad, xs, reverse=backward)
        return xpad

    return run


class SuperscanCholesky:
    """Plan + factor + solve driver (same contracts as TpuCholesky /
    SupernodalCholesky): f32 device factor, f64 refined solves."""

    def __init__(self, A: CSCMatrix, order: int = 1, wmax: int = None,
                 tau: float = 0.9, small_w: int = 8,
                 max_segments: int = 10):
        self.A = A
        self.plan = plan_superscan(A, order=order, wmax=wmax, tau=tau,
                                   small_w=small_w,
                                   max_segments=max_segments)
        self._solve_sched = None
        self.pools = None

    def factor(self) -> bool:
        plan = self.plan
        pools = {pw: jnp.asarray(v) for pw, v in plan.pool_init.items()}
        pools = _factor(plan, pools)
        ok = all(bool(jnp.all(jnp.isfinite(v[:plan.pool_rows[pw]])))
                 for pw, v in pools.items())
        if ok:
            self.pools = pools
        return ok

    def _sched(self):
        if self._solve_sched is None:
            self._solve_sched = _solve_xs(self.plan)
        return self._solve_sched

    def _sched_dev(self, si):
        """Device-resident solve schedule for segment si, uploaded once
        and cached — each refinement iteration re-runs the solve, and
        re-uploading hundreds of MB of index arrays per call dominated
        large-n solves on the relay.  The cache is BUDGETED
        (TPUSPARSE_SOLVE_SCHED_CACHE_MB, default 2048): at 3D
        n=262,144 / lnz=184M the full schedule no longer fits next to
        the 1.1GB pools (RESOURCE_EXHAUSTED on hardware, round 5), so
        segments beyond the budget upload transiently per call and are
        freed when the caller drops the reference."""
        if getattr(self, "_sched_dev_cache", None) is None:
            self._sched_dev_cache = {}
            self._sched_dev_bytes = 0
        xs = self._sched_dev_cache.get(si)
        if xs is None:
            sched = self._sched()
            nbytes = sum(a.nbytes for d in sched[si].values()
                         for a in d.values())
            xs = {k: {nm: jnp.asarray(a)
                      for nm, a in sched[si][k].items()}
                  for k in sorted(sched[si])}
            budget = int(os.environ.get(
                "TPUSPARSE_SOLVE_SCHED_CACHE_MB", "2048")) << 20
            if self._sched_dev_bytes + nbytes <= budget:
                self._sched_dev_cache[si] = xs
                self._sched_dev_bytes += nbytes
        return xs

    def _sched_abs(self, si):
        """ShapeDtypeStructs of segment si's solve schedule (dtype
        canonicalized as jnp.asarray would) — compile_many only needs
        avals, so compilation must not force a device upload of every
        segment's index arrays at once (that peak OOMed at lnz=184M)."""
        from jax import dtypes
        sched = self._sched()
        return {k: {nm: jax.ShapeDtypeStruct(
                        a.shape, dtypes.canonicalize_dtype(a.dtype))
                    for nm, a in sched[si][k].items()}
                for k in sorted(sched[si])}

    def _run_solve(self, xpad: jnp.ndarray) -> jnp.ndarray:
        from .compilepool import compile_many
        plan = self.plan
        sched = self._sched()
        jobs = []
        for direction in ("solvef", "solveb"):
            for si in range(len(sched)):
                keys = tuple(sorted(sched[si]))
                if not keys:
                    continue
                sig = (direction, _pools_sig(self.pools),
                       xpad.shape) + tuple(
                    (k,) + tuple(a.shape) for k in keys
                    for a in sched[si][k].values())
                jobs.append((sig, _segment_solve(
                    keys, direction == "solveb"),
                    (self.pools, xpad, self._sched_abs(si))))
        compile_many(_JIT_CACHE, jobs)
        for direction in ("solvef", "solveb"):
            order = (range(len(sched)) if direction == "solvef"
                     else range(len(sched) - 1, -1, -1))
            for si in order:
                keys = tuple(sorted(sched[si]))
                if not keys:
                    continue
                sig = (direction, _pools_sig(self.pools),
                       xpad.shape) + tuple(
                    (k,) + tuple(a.shape) for k in keys
                    for a in sched[si][k].values())
                xpad = _JIT_CACHE[sig](self.pools, xpad,
                                       self._sched_dev(si))
        return xpad

    def _solve_f32(self, b: np.ndarray) -> np.ndarray:
        plan = self.plan
        bp = pvec(plan.perm, np.asarray(b, np.float64))
        xpad = np.zeros(plan.n + 1, dtype=np.float32)
        xpad[:plan.n] = bp
        out = self._run_solve(jnp.asarray(xpad))
        xp = np.asarray(out, np.float64)[:plan.n]
        return ipvec(plan.perm, xp)

    def solve(self, b: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        from .refine import refine
        if self.pools is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        return refine(self.A, self._solve_f32, b, iters=refine_iters)

    @staticmethod
    def _fetch(v, chunk_rows: int = 1 << 19) -> np.ndarray:
        """Device->host in bounded slices: the axon relay fails on
        single transfers of very large arrays (measured at the ~400MB
        pool of the 262k wmax=32 plan)."""
        if v.shape[0] <= chunk_rows:
            return np.asarray(v, np.float64)
        out = np.empty(v.shape, np.float64)
        for a in range(0, v.shape[0], chunk_rows):
            out[a:a + chunk_rows] = np.asarray(v[a:a + chunk_rows])
        return out

    def extract_L(self) -> CSCMatrix:
        """Download the factored pools into a host CSC L (permuted
        coordinates, diagonal-first columns, true pattern only)."""
        if self.pools is None:
            raise ValueError("factor() first")
        plan = self.plan
        n = plan.n
        host = {pw: self._fetch(v) for pw, v in self.pools.items()}
        cols: List[Tuple[np.ndarray, np.ndarray]] = [None] * n
        for pl in plan.panels:
            buf = host[pl.pool]
            for c in range(pl.w):
                j = pl.c0 + c
                diag_rows = np.arange(j, pl.c0 + pl.w)
                diag_vals = buf[pl.rbase + c + np.arange(pl.w - c), c]
                od_vals = buf[pl.rbase + pl.W
                              + np.arange(pl.rows.size), c]
                cols[j] = (np.concatenate([diag_rows, pl.rows]),
                           np.concatenate([diag_vals, od_vals]))
        indptr = np.zeros(n + 1, dtype=_IDX)
        for j in range(n):
            indptr[j + 1] = indptr[j] + cols[j][0].size
        rows = np.concatenate([c[0] for c in cols]) if n else \
            np.zeros(0, _IDX)
        vals = np.concatenate([c[1] for c in cols]) if n else \
            np.zeros(0)
        return CSCMatrix(n, n, indptr, np.asarray(rows, _IDX), vals)

    def solve_host(self, b: np.ndarray,
                   refine_iters: int = 3) -> np.ndarray:
        """Solve using host f64 triangular solves on the extracted
        device factor (zero extra device compiles — bench path)."""
        from ..numeric.trisolve import lsolve, ltsolve
        from .refine import refine
        if self.pools is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        if getattr(self, "_Lhost", None) is None:
            self._Lhost = self.extract_L()

        def f32_solve(rhs):
            xp = lsolve(self._Lhost, pvec(self.plan.perm, rhs))
            xp = ltsolve(self._Lhost, xp)
            return ipvec(self.plan.perm, xp)

        return refine(self.A, f32_solve, b, iters=refine_iters)

    def solve_many(self, B: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        """Solve A X = B for (n, k) right-hand sides: the device solve
        scans vmapped over the RHS axis (one dispatch chain per
        segment) + batched f64 refinement — the factor-once/solve-many
        contract shared by every engine (SURVEY.md §5)."""
        B = np.asarray(B, dtype=np.float64)
        if B.ndim == 1:
            return self.solve(B, refine_iters)
        if self.pools is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        plan = self.plan
        from ..core.ops import gaxpy, norm1
        sched = self._sched()

        def run_many(xpads):                     # (k, n+1) jnp
            for direction in ("solvef", "solveb"):
                order = (range(len(sched))
                         if direction == "solvef"
                         else range(len(sched) - 1, -1, -1))
                for si in order:
                    keys = tuple(sorted(sched[si]))
                    if not keys:
                        continue
                    sig = ("v" + direction,) + tuple(
                        (k,) + tuple(a.shape) for k in keys
                        for a in sched[si][k].values())
                    if sig not in _JIT_CACHE:
                        _JIT_CACHE[sig] = jax.jit(jax.vmap(
                            _segment_solve(keys,
                                           direction == "solveb"),
                            in_axes=(None, 0, None)))
                    xpads = _JIT_CACHE[sig](self.pools, xpads,
                                            self._sched_dev(si))
            return xpads

        def solve_f32_many(Bm):
            k = Bm.shape[1]
            Bp = Bm[plan.perm]
            xpad = np.zeros((k, plan.n + 1), dtype=np.float32)
            xpad[:, :plan.n] = Bp.T
            out = np.asarray(run_many(jnp.asarray(xpad)),
                             np.float64)[:, :plan.n].T
            res = np.zeros_like(out)
            res[plan.perm] = out
            return res

        X = solve_f32_many(B)
        nrmA = norm1(self.A)
        for _ in range(refine_iters):
            R = np.stack([B[:, j] - gaxpy(self.A, X[:, j],
                                          np.zeros(self.A.m))
                          for j in range(B.shape[1])], axis=1)
            denom = nrmA * np.abs(X).max() + np.abs(B).max()
            if denom == 0 or np.abs(R).max() / denom < 1e-14:
                break
            X = X + solve_f32_many(R)
        return X

    # ------------------------------------------------------------ updown
    def _updown_sched(self):
        """Static per-column schedule for the device-resident updown
        scan over the packed pools (one combined flat vector): for every
        column, the flat indices of its stored entries and their global
        rows.  The recurrence is an exact no-op where w is zero, so the
        scan always covers all n columns — one compile per plan."""
        if getattr(self, "_ud_sched", None) is not None:
            return self._ud_sched
        plan = self.plan
        n = plan.n
        pws = sorted(plan.pool_init)
        off = {}
        total = 0
        for pw in pws:
            off[pw] = total
            total += plan.pool_init[pw].size
        H = max((pl.W - 1 + pl.rows.size for pl in plan.panels),
                default=1)
        H = max(H, 1)
        dflat = np.zeros(n, np.int64)
        colidx = np.full((n, H), total, np.int64)      # pad -> dump slot
        rowid = np.full((n, H), n, np.int64)
        for pl in plan.panels:
            pw = pl.pool
            for c in range(pl.w):
                j = pl.c0 + c
                base = off[pw] + (pl.rbase) * pw + c
                dflat[j] = base + c * pw
                q = np.arange(c + 1, pl.W)
                colidx[j, :q.size] = base + q * pw
                rows_d = pl.c0 + q
                rowid[j, :q.size] = np.where(rows_d < pl.c0 + pl.w,
                                             rows_d, n)
                m = pl.rows.size
                colidx[j, q.size:q.size + m] = \
                    base + (pl.W + np.arange(m)) * pw
                rowid[j, q.size:q.size + m] = pl.rows
        self._ud_sched = dict(
            dflat=jnp.asarray(dflat.astype(np.int32)),
            colidx=jnp.asarray(colidx.astype(np.int32)),
            rowid=jnp.asarray(rowid.astype(np.int32)),
            H=H, total=total, pws=pws, off=off)
        return self._ud_sched

    _UD_JIT: Dict = {}

    def updown(self, sigma: int, w: np.ndarray) -> bool:
        """Rank-1 update/downdate of the FACTORED pools in place
        (reference: csparse::cs_updown) — device-resident: the
        alpha/beta/gamma path recurrence runs as one lax.scan over the
        combined flat pools.  w is in ORIGINAL coordinates with pattern
        contained in a column pattern of L (the demo3 contract)."""
        from ..core.matrix import csc_from_dense
        from ..core.ops import add, multiply, transpose
        from .chol_tpu import TpuCholesky
        if self.pools is None:
            raise ValueError("factor() first")
        plan = self.plan
        n = plan.n
        w = np.asarray(w, dtype=np.float64)
        wp = w[plan.perm]
        sched = self._updown_sched()
        key = (1 if sigma > 0 else -1, n, sched["H"], sched["total"])
        if key not in SuperscanCholesky._UD_JIT:
            SuperscanCholesky._UD_JIT[key] = jax.jit(
                TpuCholesky._updown_scan(1 if sigma > 0 else -1))
        poolf = jnp.concatenate(
            [self.pools[pw].reshape(-1) for pw in sched["pws"]]
            + [jnp.zeros(1, jnp.float32)])
        wpad = jnp.asarray(
            np.concatenate([wp, [0.0]]).astype(np.float32))
        poolf, okf = SuperscanCholesky._UD_JIT[key](
            poolf, wpad, sched["dflat"], sched["colidx"],
            sched["rowid"])
        if not bool(okf):
            return False
        pools = {}
        for pw in sched["pws"]:
            sz = plan.pool_init[pw].size
            o = sched["off"][pw]
            pools[pw] = poolf[o:o + sz].reshape(
                plan.pool_init[pw].shape)
        self.pools = pools
        self._Lhost = None                     # invalidate host cache
        W1 = csc_from_dense(w.reshape(-1, 1))
        self.A = add(self.A, multiply(W1, transpose(W1)), 1.0,
                     float(sigma))
        return True

    def metrics(self):
        from ..utils.profiling import Metrics
        plan = self.plan
        m = Metrics().record_plan("chol", plan)
        m.record(chol_engine="superscan",
                 chol_panels=len(plan.panels),
                 chol_steps=int(plan.nsteps),
                 chol_segments=len(plan.segments),
                 chol_levels=int(plan.nlevels),
                 chol_nnz_predicted=int(plan.lnz))
        return m
