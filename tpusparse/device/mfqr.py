"""Multifrontal sparse Householder QR on TPU.

This is the TPU-native redesign of the reference's sparse Householder
QR with TRUE Q semantics at sparse scale — the engine VERDICT r2 item 5
option (a) asked for.  Reference: csparse::cs_qr / cs_qr.c (numeric),
cs_house.c / cs_happly.c (reflections), cs_sqr.c (symbolic analysis);
call stack in SURVEY.md §3.3.

Where the reference computes one sparse reflection per column, this
engine factors by FRONTS (SuiteSparseQR-style multifrontal): supernodes
of the column elimination tree become dense padded frontal matrices,
each fully QR-factored by a blocked Householder kernel (compact-WY, MXU
GEMMs — tpusparse.device.dense.qr_factor_partial), batched per etree
level so every level is ONE vmapped device program.  The Householder
vectors V and taus of every front stay device-resident, so

* ``apply_qt`` / ``apply_q`` apply the EXACT orthogonal factor (the
  reference's cs_happly loop, as level-scheduled batched WY GEMMs),
* least-squares solves are x = R^{-1} (Q'b)[:n] — condition kappa(A),
  NOT the kappa^2 of the Q-less CSNE path (device.qr_tpu.SparseQR),
* min-norm solves are x = Q [R'^{-1} b_q; 0],
* R / R' solves run device-resident against the front pools (no factor
  download), reverse/forward level-scheduled.

Host planning (once per pattern, pure numpy):
  1. column order amd(3, A) composed with a column-etree postorder;
  2. fundamental supernodes from (parent, R row counts) + relaxed
     amalgamation + power-of-two width splitting (shared heuristics
     with the supernodal Cholesky planner);
  3. RECURSIVE front column sets: front cols = pivot cols + union of
     (A-row patterns, child contribution columns) beyond the pivots —
     self-consistent by construction, no pattern-nesting assumption;
  4. rows: original rows are assigned to the front owning their
     leftmost column (cs_sqr's vcount row-assignment invariant);
     each child front passes an upper-trapezoidal contribution block
     (rows w..min(nrow,ncol) of its dense R) to its parent;
  5. buckets (padded rows, padded cols, exact width) + level schedules
     for factor, Q'/Q application, and R/R' solves.

Structural rank handling follows cs_qr's fictitious-row scheme: fronts
with fewer rows than pivot columns are padded with zero rows, whose
reflectors are identity (tau=0) and whose R diagonal is exactly zero —
surfacing as ``rank_ok == False``.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import gaxpy, norm1, permute, transpose
from ..symbolic.amd import amd
from ..symbolic.etree import counts, etree, post
from .config import HIGHEST
from .dense import qr_factor_partial, qr_q_mul_batched, qr_qt_mul_batched

__all__ = ["MfqrPlan", "plan_mfqr", "MultifrontalQR"]

_IDX = np.int64
_BS = 8          # Householder panel width inside front QR


def _ground(x: int) -> int:
    """Round up to the next size in {8, 16, 24, 32, 48, 64, 96, ...}
    (powers of two and 1.5x powers of two, all multiples of 8): bounds
    per-dimension padding waste at 33% while keeping the number of
    front buckets logarithmic."""
    if x <= 8:
        return 8
    p = 8
    while True:
        if x <= p:
            return p
        if x <= p + p // 2:
            return p + p // 2
        p *= 2


@dataclass
class _Front:
    sid: int
    c0: int
    w: int
    od: np.ndarray              # contribution col ids (global, sorted)
    rows_a: np.ndarray          # original row ids assigned to this front
    nrow_real: int = 0
    nrow_eff: int = 0
    kstar: int = 0              # min(nrow_eff, ncol) — eliminated cols
    cr: int = 0                 # contribution rows = kstar - w
    level: int = 0
    bucket: Tuple[int, int, int] = None
    slot: int = 0
    comp_off: int = 0
    children: List[int] = field(default_factory=list)
    child_base: Dict[int, int] = field(default_factory=dict)

    @property
    def ncol(self) -> int:
        return self.w + self.od.size


@dataclass
class MfqrPlan:
    m: int
    n: int
    q: np.ndarray                                  # final column perm
    fronts: List[_Front]
    col2sn: np.ndarray
    nlevels: int
    buckets: List[Tuple[int, int, int]]
    bucket_count: Dict[Tuple[int, int, int], int]
    pool_init: Dict[Tuple[int, int, int], np.ndarray]
    level_factor: List[Dict]                       # bucket -> slots
    level_assemble: List[Dict]                     # (cb,pb) -> maps
    level_disassemble: List[Dict]                  # same, keyed child lvl
    level_io: List[Dict]                           # bucket -> (slots,bidx,outmap)
    level_rsolve: List[Dict]                       # bucket -> (slots,colsJ,odidx)
    pass_rows: np.ndarray
    pass_slots: np.ndarray
    ysize: int
    ncomp: int
    flops_true: int
    flops_padded: int
    rnz: int
    vnz: int

    @property
    def waste_ratio(self) -> float:
        return 1.0 - self.flops_true / max(self.flops_padded, 1)


def plan_mfqr(A: CSCMatrix, order: int = 3, wmax: int = 64,
              small_w: int = 8, amalg_tau: float = 0.35) -> MfqrPlan:
    """Host symbolic analysis + front/bucket/level schedule construction
    (the reference's cs_sqr analysis driving a multifrontal plan)."""
    m, n = A.m, A.n
    if m < n:
        raise ValueError("m >= n required (caller factors A')")
    if n == 0:
        raise ValueError("empty matrix")
    # 1. ordering composed with a column-etree postorder ------------------
    q = amd(order, A)
    qq = q if q is not None else np.arange(n, dtype=_IDX)
    Aq = permute(A, None, qq, values=True)
    parent0 = etree(Aq, ata=True)
    po = post(parent0)
    q2 = np.asarray(qq, _IDX)[po]
    Aq = permute(A, None, q2, values=True)
    parent = etree(Aq, ata=True)
    porder = post(parent)
    cnt = counts(Aq, parent, porder, ata=True)     # R row counts

    # 2. supernodes of the column etree -----------------------------------
    starts = [0]
    for j in range(n - 1):
        if not (parent[j] == j + 1 and cnt[j + 1] == cnt[j] - 1):
            starts.append(j + 1)
    starts.append(n)
    groups = []                       # [c0, c1, nnzR_true]
    for i in range(len(starts) - 1):
        c0, c1 = starts[i], starts[i + 1]
        groups.append([c0, c1, int(cnt[c0:c1].sum())])
    merged = [groups[0]]
    for g in groups[1:]:
        a = merged[-1]
        w_m = g[1] - a[0]
        if w_m <= wmax and parent[a[1] - 1] == a[1]:
            # R-pattern density estimate (nested-pattern approximation)
            od_est = max(int(cnt[a[0]]) - (g[1] - a[0]), 0)
            dens = (a[2] + g[2]) / max(w_m * (w_m + od_est), 1)
            if w_m <= small_w or dens >= amalg_tau:
                merged[-1] = [a[0], g[1], a[2] + g[2]]
                continue
        merged.append(g)
    from .supernodal import _split_widths
    sn_ranges: List[Tuple[int, int]] = []
    col2sn = np.zeros(n, dtype=_IDX)
    for c0, c1, _nnz in merged:
        off = c0
        for w in _split_widths(c1 - c0, wmax):
            col2sn[off:off + w] = len(sn_ranges)
            sn_ranges.append((off, off + w))
            off += w

    # 3. row assignment by leftmost column --------------------------------
    AqT = transpose(Aq, values=True)               # CSR view of Aq
    Tp, Ti, Tx = AqT.indptr, AqT.indices, AqT.data
    rdeg = np.diff(Tp)
    leftmost = np.full(m, -1, dtype=_IDX)
    nz_rows = np.flatnonzero(rdeg > 0)
    leftmost[nz_rows] = Ti[Tp[:-1][nz_rows]]       # cols sorted per row
    rows_by_sn: Dict[int, List[int]] = defaultdict(list)
    for i in nz_rows:
        rows_by_sn[int(col2sn[leftmost[i]])].append(int(i))

    # 4. recursive front construction (ascending sid = topological) -------
    fronts: List[_Front] = []
    pend_children: Dict[int, List[int]] = defaultdict(list)
    for sid, (c0, c1) in enumerate(sn_ranges):
        w = c1 - c0
        rows_a = np.asarray(rows_by_sn.get(sid, []), _IDX)
        col_parts = [np.zeros(0, _IDX)]
        for i in rows_a:
            seg = Ti[Tp[i]:Tp[i + 1]]
            lo = np.searchsorted(seg, c1)
            col_parts.append(seg[lo:])
        kids = pend_children.get(sid, [])
        for c in kids:
            fc = fronts[c]
            col_parts.append(fc.od[fc.od >= c1])
        od = np.unique(np.concatenate(col_parts))
        f = _Front(sid=sid, c0=c0, w=w, od=od, rows_a=rows_a)
        f.children = kids
        f.nrow_real = len(rows_a) + sum(fronts[c].cr for c in kids)
        f.nrow_eff = max(f.nrow_real, w)           # fictitious zero rows
        f.kstar = min(f.nrow_eff, f.ncol)
        f.cr = f.kstar - w
        base = len(rows_a)
        for c in kids:
            f.child_base[c] = base
            base += fronts[c].cr
        if f.cr > 0 and od.size:
            pend_children[int(col2sn[od[0]])].append(sid)
        fronts.append(f)

    # 5. levels (factor deps via contributions; solve deps via od cols) ---
    nf = len(fronts)
    level = np.zeros(nf, dtype=_IDX)
    for f in fronts:
        if f.od.size:
            for t in np.unique(col2sn[f.od]):
                level[t] = max(level[t], level[f.sid] + 1)
    nlevels = int(level.max()) + 1 if nf else 0
    for f in fronts:
        f.level = int(level[f.sid])

    # 6. buckets, slots, pools ---------------------------------------------
    bucket_count: Dict[Tuple[int, int, int], int] = defaultdict(int)
    for f in fronts:
        Rh = _ground(max(f.nrow_eff, 8))
        Ch = _ground(max(f.ncol, 8))
        f.bucket = (Rh, Ch, f.w)
        f.slot = bucket_count[f.bucket]
        bucket_count[f.bucket] += 1
    buckets = sorted(bucket_count)
    pool_init = {b: np.zeros((bucket_count[b], b[0], b[1]), np.float32)
                 for b in buckets}
    for f in fronts:                               # scatter A rows
        P = pool_init[f.bucket]
        for rs, i in enumerate(f.rows_a):
            seg = slice(Tp[i], Tp[i + 1])
            cols_i = Ti[seg]
            piv = cols_i < f.c0 + f.w
            P[f.slot, rs, cols_i[piv] - f.c0] = Tx[seg][piv]
            rest = cols_i[~piv]
            if rest.size:
                pos = np.searchsorted(f.od, rest)
                P[f.slot, rs, f.w + pos] = Tx[seg][~piv]

    # 7. complement/output coordinates -------------------------------------
    ncomp = 0
    for f in fronts:
        f.comp_off = n + ncomp
        ncomp += f.nrow_real - f.kstar
    pass_rows = np.flatnonzero(leftmost < 0).astype(_IDX)
    pass_slots = n + ncomp + np.arange(pass_rows.size, dtype=_IDX)
    ysize = n + ncomp + pass_rows.size
    TRASH = ysize

    # 8. schedules ----------------------------------------------------------
    level_factor: List[Dict] = [defaultdict(list) for _ in range(nlevels)]
    level_io: List[Dict] = [defaultdict(list) for _ in range(nlevels)]
    level_rsolve: List[Dict] = [defaultdict(list) for _ in range(nlevels)]
    level_assemble: List[Dict] = [
        defaultdict(lambda: ([], [], [], [])) for _ in range(nlevels)]
    level_disassemble: List[Dict] = [
        defaultdict(lambda: ([], [], [], [])) for _ in range(nlevels)]
    for f in fronts:
        Rh, Ch, W = f.bucket
        level_factor[f.level][f.bucket].append(f.slot)
        bidx = np.full(Rh, -1, _IDX)
        bidx[:len(f.rows_a)] = f.rows_a
        outmap = np.full(Rh, TRASH, _IDX)
        outmap[:f.w] = np.arange(f.c0, f.c0 + f.w)
        ncm = f.nrow_real - f.kstar
        if ncm > 0:
            outmap[f.kstar:f.nrow_real] = f.comp_off + np.arange(ncm)
        level_io[f.level][f.bucket].append((f.slot, bidx, outmap))
        colsJ = np.arange(f.c0, f.c0 + W, dtype=_IDX)
        odidx = np.full(Ch - W, n, _IDX)
        odidx[:f.od.size] = f.od
        level_rsolve[f.level][f.bucket].append((f.slot, colsJ, odidx))
        # contribution maps child -> parent
        for c in f.children:
            fc = fronts[c]
            Rhc, Chc, Wc = fc.bucket
            RM = np.full(Rh, -1, _IDX)
            base = f.child_base[c]
            RM[base:base + fc.cr] = Wc + np.arange(fc.cr)
            CM = np.full(Ch, -1, _IDX)
            gcols = np.concatenate(
                [np.arange(f.c0, f.c0 + f.w, dtype=_IDX), f.od])
            pos = np.searchsorted(fc.od, gcols)
            ok = (pos < fc.od.size)
            ok[ok] = fc.od[pos[ok]] == gcols[ok]
            CM[:gcols.size][ok] = Wc + pos[ok]
            grp = level_assemble[f.level][(fc.bucket, f.bucket)]
            grp[0].append(f.slot)
            grp[1].append(fc.slot)
            grp[2].append(RM)
            grp[3].append(CM)
            grp2 = level_disassemble[fc.level][(fc.bucket, f.bucket)]
            grp2[0].append(f.slot)
            grp2[1].append(fc.slot)
            grp2[2].append(RM)
            grp2[3].append(CM)

    def _pack_pairs(levels):
        out = []
        for lu in levels:
            d = {}
            for k, (psl, csl, RMs, CMs) in lu.items():
                d[k] = (np.asarray(psl, np.int32),
                        np.asarray(csl, np.int32),
                        np.stack(RMs).astype(np.int32),
                        np.stack(CMs).astype(np.int32))
            out.append(d)
        return out

    level_assemble = _pack_pairs(level_assemble)
    level_disassemble = _pack_pairs(level_disassemble)
    level_factor = [{b: np.asarray(v, np.int32) for b, v in lf.items()}
                    for lf in level_factor]
    level_io2 = []
    for li in level_io:
        d = {}
        for b, items in li.items():
            items.sort(key=lambda t: t[0])
            d[b] = (np.asarray([t[0] for t in items], np.int32),
                    np.stack([t[1] for t in items]).astype(np.int32),
                    np.stack([t[2] for t in items]).astype(np.int32))
        level_io2.append(d)
    level_rsolve2 = []
    for lr in level_rsolve:
        d = {}
        for b, items in lr.items():
            items.sort(key=lambda t: t[0])
            d[b] = (np.asarray([t[0] for t in items], np.int32),
                    np.stack([t[1] for t in items]).astype(np.int32),
                    np.stack([t[2] for t in items]).astype(np.int32))
        level_rsolve2.append(d)

    # 9. flop accounting -----------------------------------------------------
    ft = fp = 0
    rnz = int(cnt.sum())
    vnz = 0
    for f in fronts:
        j = np.arange(f.kstar, dtype=np.float64)
        ft += int(np.sum(4.0 * (f.nrow_real - j) * (f.ncol - j)))
        Rh, Ch, W = f.bucket
        ke = min(Rh, Ch)
        jj = np.arange(ke, dtype=np.float64)
        fp += int(np.sum(4.0 * (Rh - jj) * (Ch - jj)))
        vnz += int(np.sum(np.maximum(f.nrow_real - j, 0)))
    return MfqrPlan(
        m=m, n=n, q=q2, fronts=fronts, col2sn=col2sn, nlevels=nlevels,
        buckets=buckets, bucket_count=dict(bucket_count),
        pool_init=pool_init, level_factor=level_factor,
        level_assemble=level_assemble,
        level_disassemble=level_disassemble, level_io=level_io2,
        level_rsolve=level_rsolve2, pass_rows=pass_rows,
        pass_slots=pass_slots, ysize=ysize, ncomp=ncomp,
        flops_true=ft, flops_padded=fp, rnz=rnz, vnz=vnz)


# ---------------------------------------------------------------- device
def _gather_contrib(pools, cb, csl, RM):
    """(P, Rh_p) 1-D gather of child contribution vector components."""
    Rhc, Chc, Wc = cb
    # z-pools are (cnt, Rh_c): flatten and slab-gather
    flat = pools[cb].reshape(-1)
    idx = jnp.asarray(csl)[:, None] * Rhc + jnp.maximum(jnp.asarray(RM), 0)
    vals = flat[idx]
    return vals * (jnp.asarray(RM) >= 0).astype(vals.dtype)


def _factor_fn(plan: MfqrPlan):
    def factor(pools, taus):
        pools = dict(pools)
        taus = dict(taus)
        for lvl in range(plan.nlevels):
            for (cb, pb), (psl, csl, RM, CM) in \
                    plan.level_assemble[lvl].items():
                Rhc, Chc, Wc = cb
                Rhp, Chp, Wp = pb
                P = psl.shape[0]
                flat = pools[cb].reshape(-1, Chc)
                rm = jnp.asarray(RM)
                cm = jnp.asarray(CM)
                rows = flat[jnp.asarray(csl)[:, None] * Rhc
                            + jnp.maximum(rm, 0)]        # (P, Rhp, Chc)
                cmb = jnp.broadcast_to(jnp.maximum(cm, 0)[:, None, :],
                                       (P, Rhp, Chp))
                vals = jnp.take_along_axis(rows, cmb, axis=2)
                mask = ((rm >= 0)[:, :, None] & (cm >= 0)[:, None, :]
                        & (jnp.maximum(cm, 0)[:, None, :]
                           >= jnp.maximum(rm, 0)[:, :, None]))
                pools[pb] = pools[pb].at[jnp.asarray(psl)].add(
                    vals * mask.astype(vals.dtype))
            for b, slots in plan.level_factor[lvl].items():
                Rh, Ch, W = b
                kelim = min(Rh, Ch)
                sl = jnp.asarray(slots)
                fn = jax.vmap(
                    lambda M, t, ke=kelim: qr_factor_partial(M, t, _BS, ke))
                Mb, tb = fn(pools[b][sl], taus[b][sl])
                pools[b] = pools[b].at[sl].set(Mb)
                taus[b] = taus[b].at[sl].set(tb)
        return pools, taus

    return factor


def _rdiag_fn(plan: MfqrPlan):
    """Jittable: min |R diagonal| over the real pivot columns + finite
    check — the rank_ok contract without downloading the pools."""
    def rdiag(pools):
        mn = jnp.inf
        finite = jnp.array(True)
        for b in plan.buckets:
            Rh, Ch, W = b
            d = jnp.abs(jnp.diagonal(pools[b][:, :W, :W],
                                     axis1=1, axis2=2))
            mn = jnp.minimum(mn, d.min())
            finite = jnp.logical_and(finite,
                                     jnp.all(jnp.isfinite(pools[b])))
        return mn, finite

    return rdiag


def _qt_fn(plan: MfqrPlan):
    """Q' b: level-scheduled forward traversal.  bpad is (m+1,) f32
    (trash slot m = 0); returns ypad (ysize+1,)."""
    def qt(pools, taus, bpad):
        ypad = jnp.zeros(plan.ysize + 1, jnp.float32)
        if plan.pass_rows.size:
            ypad = ypad.at[jnp.asarray(plan.pass_slots)].set(
                bpad[jnp.asarray(plan.pass_rows)])
        z = {b: jnp.zeros((plan.bucket_count[b], b[0]), jnp.float32)
             for b in plan.buckets}
        for lvl in range(plan.nlevels):
            for b, (slots, bidx, _om) in plan.level_io[lvl].items():
                bi = jnp.asarray(bidx)
                vals = bpad[jnp.minimum(jnp.maximum(bi, 0), plan.m)]
                vals = vals * (bi >= 0).astype(vals.dtype)
                z[b] = z[b].at[jnp.asarray(slots)].set(vals)
            for (cb, pb), (psl, csl, RM, _CM) in \
                    plan.level_assemble[lvl].items():
                vals = _gather_contrib(z, cb, csl, RM)
                z[pb] = z[pb].at[jnp.asarray(psl)].add(vals)
            for b, (slots, _bi, outmap) in plan.level_io[lvl].items():
                Rh, Ch, W = b
                kelim = min(Rh, Ch)
                sl = jnp.asarray(slots)
                zb = qr_qt_mul_batched(pools[b][sl], taus[b][sl],
                                       z[b][sl], _BS, kelim)
                z[b] = z[b].at[sl].set(zb)
                ypad = ypad.at[jnp.asarray(outmap)].set(zb)
        return ypad.at[plan.ysize].set(0.0)

    return qt


def _q_fn(plan: MfqrPlan):
    """Q y: reverse traversal (inverse of _qt_fn).  ypad is (ysize+1,);
    returns bpad (m+1,)."""
    def qf(pools, taus, ypad):
        bpad = jnp.zeros(plan.m + 1, jnp.float32)
        if plan.pass_rows.size:
            bpad = bpad.at[jnp.asarray(plan.pass_rows)].set(
                ypad[jnp.asarray(plan.pass_slots)])
        # a-pools carry each front's reconstructed pre-Q' local vector;
        # one trash column (index Rh) absorbs masked scatters
        a = {b: jnp.zeros((plan.bucket_count[b], b[0] + 1), jnp.float32)
             for b in plan.buckets}
        z = {b: jnp.zeros((plan.bucket_count[b], b[0]), jnp.float32)
             for b in plan.buckets}
        for lvl in range(plan.nlevels - 1, -1, -1):
            for b, (slots, _bi, outmap) in plan.level_io[lvl].items():
                om = jnp.asarray(outmap)
                vals = ypad[jnp.minimum(om, plan.ysize)]
                vals = vals * (om < plan.ysize).astype(vals.dtype)
                z[b] = z[b].at[jnp.asarray(slots)].set(vals)
            for (cb, pb), (psl, csl, RM, _CM) in \
                    plan.level_disassemble[lvl].items():
                Rhc = cb[0]
                avals = a[pb][jnp.asarray(psl)][:, :pb[0]]    # (P, Rhp)
                rm = jnp.asarray(RM)
                idx = jnp.where(rm >= 0, rm, Rhc)
                zc = jnp.concatenate(
                    [z[cb], jnp.zeros((plan.bucket_count[cb], 1),
                                      jnp.float32)], axis=1)
                zc = zc.at[jnp.asarray(csl)[:, None], idx].set(avals)
                z[cb] = zc[:, :Rhc]
            for b, (slots, bidx, _om) in plan.level_io[lvl].items():
                Rh, Ch, W = b
                kelim = min(Rh, Ch)
                sl = jnp.asarray(slots)
                ab = qr_q_mul_batched(pools[b][sl], taus[b][sl],
                                      z[b][sl], _BS, kelim)
                a[b] = a[b].at[sl, :Rh].set(ab)
                bi = jnp.asarray(bidx)
                bpad = bpad.at[jnp.where(bi >= 0, bi, plan.m)].set(
                    jnp.where(bi >= 0, ab, 0.0))
        return bpad.at[plan.m].set(0.0)

    return qf


def _rsolve_fn(plan: MfqrPlan):
    """x = R \\ y[:n] device-resident (reverse level order)."""
    n = plan.n

    def rsolve(pools, y):                          # y: (n,) f32
        xpad = jnp.zeros(n + 1, jnp.float32)
        for lvl in range(plan.nlevels - 1, -1, -1):
            for b, (slots, colsJ, odidx) in plan.level_rsolve[lvl].items():
                Rh, Ch, W = b
                P = pools[b][jnp.asarray(slots)]
                RJJ = jnp.triu(P[:, :W, :W])
                rhs = y[jnp.asarray(colsJ)]
                if Ch > W:
                    Rrest = P[:, :W, W:]
                    xod = xpad[jnp.asarray(odidx)]
                    rhs = rhs - jnp.einsum("pwc,pc->pw", Rrest, xod,
                                           precision=HIGHEST)
                xJ = jax.lax.linalg.triangular_solve(
                    RJJ, rhs[:, :, None], left_side=True,
                    lower=False)[:, :, 0]
                xpad = xpad.at[jnp.asarray(colsJ)].set(xJ)
        return xpad[:n]

    return rsolve


def _rtsolve_fn(plan: MfqrPlan):
    """z = R' \\ b device-resident (forward level order)."""
    n = plan.n

    def rtsolve(pools, b):                         # b: (n,) f32
        ypad = jnp.concatenate([b, jnp.zeros(1, jnp.float32)])
        for lvl in range(plan.nlevels):
            for bk, (slots, colsJ, odidx) in plan.level_rsolve[lvl].items():
                Rh, Ch, W = bk
                P = pools[bk][jnp.asarray(slots)]
                RJJ = jnp.triu(P[:, :W, :W])
                rhs = ypad[jnp.asarray(colsJ)]
                zJ = jax.lax.linalg.triangular_solve(
                    RJJ, rhs[:, :, None], left_side=True, lower=False,
                    transpose_a=True)[:, :, 0]
                ypad = ypad.at[jnp.asarray(colsJ)].set(zJ)
                if Ch > W:
                    Rrest = P[:, :W, W:]
                    delta = jnp.einsum("pwc,pw->pc", Rrest, zJ,
                                       precision=HIGHEST)
                    ypad = ypad.at[jnp.asarray(odidx)].add(-delta)
                    ypad = ypad.at[n].set(0.0)
        return ypad[:n]

    return rtsolve


class MultifrontalQR:
    """Device sparse Householder QR with true Q semantics.

    Factors A(:, q) = Q R by batched dense fronts; Q (as V/tau pools)
    and R stay device-resident.  ``apply_qt``/``apply_q`` are the
    reference's cs_happly as an operator; ``solve_ls``/``solve_minnorm``
    follow the cs_qrsol driver, wrapped in f64 iterative refinement
    (contraction rate ~kappa(A)*eps_f32 since Q is exact — not the
    kappa^2 of the Q-less CSNE engine)."""

    def __init__(self, A: CSCMatrix, order: int = 3, **plan_kw):
        if A.m < A.n:
            raise ValueError("m >= n required (caller factors A')")
        self.A = A
        self.At = transpose(A, values=True)
        self.plan = plan_mfqr(A, order=order, **plan_kw)
        self._factorf = jax.jit(_factor_fn(self.plan))
        self._rdiag = jax.jit(_rdiag_fn(self.plan))
        self._qtf = jax.jit(_qt_fn(self.plan))
        self._qf = jax.jit(_q_fn(self.plan))
        self._rsolvef = jax.jit(_rsolve_fn(self.plan))
        self._rtsolvef = jax.jit(_rtsolve_fn(self.plan))
        self.pools = None
        self.taus = None
        self.rank_ok = False
        self.last_info = {}

    def factor(self) -> bool:
        plan = self.plan
        pools = {b: jnp.asarray(v) for b, v in plan.pool_init.items()}
        taus = {b: jnp.zeros((plan.bucket_count[b], b[1]), jnp.float32)
                for b in plan.buckets}
        pools, taus = self._factorf(pools, taus)
        mn, finite = self._rdiag(pools)
        self.rank_ok = bool(finite) and float(mn) > 0.0
        if bool(finite):
            self.pools, self.taus = pools, taus
        return self.rank_ok

    # ---------------------------------------------------------- operators
    def apply_qt(self, b: np.ndarray) -> np.ndarray:
        """y = Q' b (length plan.ysize; y[:n] are the R-row coords)."""
        bpad = np.zeros(self.plan.m + 1, np.float32)
        bpad[:self.plan.m] = b
        out = self._qtf(self.pools, self.taus, jnp.asarray(bpad))
        return np.asarray(out, np.float64)[:self.plan.ysize]

    def apply_q(self, y: np.ndarray) -> np.ndarray:
        """b = Q y for y of length plan.ysize (inverse of apply_qt)."""
        ypad = np.zeros(self.plan.ysize + 1, np.float32)
        ypad[:len(y)] = y
        out = self._qf(self.pools, self.taus, jnp.asarray(ypad))
        return np.asarray(out, np.float64)[:self.plan.m]

    def _qt_np(self, v: np.ndarray) -> np.ndarray:
        bpad = np.zeros(self.plan.m + 1, np.float32)
        bpad[:self.plan.m] = v
        out = self._qtf(self.pools, self.taus, jnp.asarray(bpad))
        return np.asarray(out, np.float64)[:self.plan.ysize]

    def _q_np(self, y: np.ndarray) -> np.ndarray:
        ypad = np.zeros(self.plan.ysize + 1, np.float32)
        ypad[:len(y)] = y
        out = self._qf(self.pools, self.taus, jnp.asarray(ypad))
        return np.asarray(out, np.float64)[:self.plan.m]

    def _aug_solve(self, f1: np.ndarray, f2q: np.ndarray):
        """Exact augmented-system solve (Bjorck) using the true Q:
        [[I, Aq], [Aq', 0]] [dr; dxq] = [f1; f2q] via
        h = R'^{-1} f2q;  g = Q'f1;  dxq = R^{-1}(g[:n] - h);
        dr = Q [h; g[n:]].  All four device-resident passes."""
        n = self.plan.n
        h = np.asarray(self._rtsolvef(self.pools,
                                      jnp.asarray(f2q, jnp.float32)),
                       np.float64)
        g = self._qt_np(f1)
        dxq = np.asarray(self._rsolvef(self.pools,
                                       jnp.asarray(g[:n] - h,
                                                   jnp.float32)),
                         np.float64)
        y = g.copy()
        y[:n] = h
        dr = self._q_np(y)
        return dr, dxq

    def solve_ls(self, b: np.ndarray, refine_iters: int = 4,
                 rtol: float = 1e-14) -> np.ndarray:
        """min ||A x - b||: augmented-system iterative refinement with
        the EXACT Q (contraction ~kappa(A)*eps_f32; converges to the
        true LS solution AND residual, unlike plain QR refinement whose
        floor is eps_f32*||r||)."""
        if not self.rank_ok:
            raise ValueError("rank deficient")
        b = np.asarray(b, np.float64)
        plan = self.plan
        x = np.zeros(plan.n)
        r = np.zeros(plan.m)
        nrmA = norm1(self.A)
        ne = true = np.inf
        for it in range(refine_iters):
            f1 = b - r - gaxpy(self.A, x, np.zeros(plan.m))
            f2 = -gaxpy(self.At, r, np.zeros(plan.n))
            scale = nrmA * max(np.abs(x).max(), 0.0) + np.abs(b).max()
            true = np.abs(f1).max() / max(scale, 1e-300)
            ne = np.abs(f2).max() / max(nrmA * scale, 1e-300)
            if max(ne, true) < rtol:
                break
            dr, dxq = self._aug_solve(f1, f2[plan.q])
            dx = np.zeros(plan.n)
            dx[plan.q] = dxq
            x = x + dx
            r = r + dr
        self.last_info = {"iters": it + 1, "ne_resid": float(ne),
                          "aug_resid": float(true)}
        return x

    def solve_minnorm(self, b: np.ndarray, refine_iters: int = 4,
                      rtol: float = 1e-14) -> np.ndarray:
        """This object factors B = A_orig' (tall); returns the min-norm
        solution of A_orig x = b: x = Q [R'^{-1} b_q; 0], refined on the
        KKT system (x = B lam, B'x = b) so the nullspace component is
        removed to f64 grade as well."""
        if not self.rank_ok:
            raise ValueError("rank deficient")
        b = np.asarray(b, np.float64)
        plan = self.plan
        x = np.zeros(plan.m)                        # len = cols of A_orig
        lamq = np.zeros(plan.n)                     # multiplier, permuted
        eq = np.inf
        nrmB = norm1(self.A)
        for it in range(refine_iters):
            # f1 = B lam - x  (x in range(B));  f2 = b - B' x.  lam
            # lives in the permuted column coordinate of Bq = B(:, q):
            # map back through plan.q before the unpermuted SpMV.
            lam_full = np.zeros(plan.n)
            lam_full[plan.q] = lamq
            f1 = gaxpy(self.A, lam_full, np.zeros(plan.m)) - x
            f2 = b - gaxpy(self.At, x, np.zeros(plan.n))
            eq = np.abs(f2).max() / max(
                nrmB * max(np.abs(x).max(), 0.0) + np.abs(b).max(),
                1e-300)
            if eq < rtol and np.abs(f1).max() < rtol * max(
                    np.abs(x).max(), 1.0):
                break
            # dx = Q [u; g2], dlamq = R^{-1}(u - g1), u = R'^{-1} f2q
            u = np.asarray(self._rtsolvef(
                self.pools, jnp.asarray(f2[plan.q], jnp.float32)),
                np.float64)
            g = self._qt_np(f1)
            dlamq = np.asarray(self._rsolvef(
                self.pools, jnp.asarray(u - g[:plan.n], jnp.float32)),
                np.float64)
            y = g.copy()
            y[:plan.n] = u
            dx = self._q_np(y)
            x = x + dx
            lamq = lamq + dlamq
        self.last_info = {"iters": it + 1, "eq_resid": float(eq)}
        return x

    def metrics(self):
        from ..utils.profiling import Metrics
        plan = self.plan
        m = Metrics()
        m.record(qr_engine="multifrontal",
                 qr_fronts=len(plan.fronts),
                 qr_buckets=len(plan.buckets),
                 qr_levels=plan.nlevels,
                 qr_flops_true=int(plan.flops_true),
                 qr_flops_padded=int(plan.flops_padded),
                 qr_waste_ratio=float(plan.waste_ratio),
                 qr_rnz=int(plan.rnz), qr_vnz=int(plan.vnz))
        return m
