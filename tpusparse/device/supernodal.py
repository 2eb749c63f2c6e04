"""Variable-width supernodal Cholesky on TPU.

The full supernodal redesign of csparse::cs_chol (SURVEY.md §7.1 stage 3,
BASELINE.json north star: "static supernodal/elimination-tree schedule;
numeric cs_chol becomes dense panel-factorize + GEMM-update kernels").

Host planning (once per pattern):
  1. AMD (or chosen) ordering composed with an etree POSTORDER so
     supernode columns are contiguous;
  2. exact scalar fill patterns (native batched ereach);
  3. fundamental supernodes  (parent(j)=j+1 and |pat(j+1)|=|pat(j)|-1),
     split to power-of-two widths <= 128;
  4. panels bucketed by (padded rows R, exact width W); per-pair update
     index maps (descendant od-rows -> ancestor panel coordinates);
  5. a LEVEL schedule over the supernode etree: supernodes at one level
     are independent, so each level runs as
        scatter-add updates  (batched 2-D gathers from update matrices)
        batched panel factor (Pallas/XLA chol of (cnt,W,W) diag blocks,
                              batched TRSM of (cnt,R-W,W) od rows)
        batched SYRK         ((cnt,R-W,R-W) update matrices, MXU).

Numerics: f32 + Precision.HIGHEST + f64 refinement, same contracts as
the fixed-tile engine (tpusparse.device.chol_tpu).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import permute, symperm
from ..core.perm import ipvec, pvec, pinv as _pinv
from ..symbolic.amd import amd
from ..symbolic.etree import counts, etree, post
from .config import HIGHEST

__all__ = ["SupernodalPlan", "plan_supernodal", "SupernodalCholesky"]

_IDX = np.int64


def _pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _split_widths(w: int, wmax: int = 128) -> List[int]:
    """Split a supernode width into power-of-two chunks <= wmax."""
    out = []
    while w > 0:
        c = min(_pow2(w) if _pow2(w) == w else _pow2(w) // 2, wmax)
        c = min(c, w)
        out.append(c)
        w -= c
    return out


@dataclass
class _Snode:
    sid: int
    c0: int                 # first column
    w: int                  # exact width (power of two)
    rows: np.ndarray        # od rows (below the diagonal block), sorted
    level: int = 0
    bucket: Tuple[int, int] = None     # (R, W)
    slot: int = 0                      # index within its bucket array


@dataclass
class SupernodalPlan:
    n: int
    perm: Optional[np.ndarray]
    snodes: List[_Snode]
    col2sn: np.ndarray
    nlevels: int
    buckets: List[Tuple[int, int]]                  # ordered bucket keys
    pool_init: Dict[Tuple[int, int], np.ndarray]    # bucket -> (cnt,R,W)
    # per level: factor membership per bucket: bucket -> slot array
    level_factor: List[Dict[Tuple[int, int], np.ndarray]]
    # per level: update groups keyed (d_bucket, s_bucket):
    #   (s_slots (P,), G1 (P,Rs), G0 (P,Ws), d_slots (P,)) — update
    #   blocks computed directly as L1 @ L0^T from row slab-gathers of
    #   the factored descendant panels (no multifrontal U matrices)
    level_updates: List[Dict[Tuple, Tuple]]
    flops_true: int
    flops_padded: int
    lnz: int

    @property
    def waste_ratio(self) -> float:
        return 1.0 - self.flops_true / max(self.flops_padded, 1)


def _column_patterns(Cu: CSCMatrix, parent, cnt):
    """Exact strictly-lower column patterns of L from the row patterns."""
    n = Cu.n
    from .chol_tpu import _scalar_row_patterns
    from .. import native
    rowptr, entries = _scalar_row_patterns(Cu, parent, cnt)
    # row k has cols entries[rowptr[k]:rowptr[k+1]] -> invert to columns
    if native.available():
        # O(nnz) counting sort (planner.cpp ts_invert)
        colptr, colrows = native.invert_patterns(n, rowptr, entries)
        if colrows.size == 0:
            colrows = np.zeros(1, _IDX)
        return colptr, colrows
    counts_lower = np.zeros(n, dtype=_IDX)
    np.add.at(counts_lower, entries, 1)
    colptr = np.zeros(n + 1, dtype=_IDX)
    np.cumsum(counts_lower, out=colptr[1:])
    # vectorized inversion: stable argsort by column keeps rows sorted
    # (entries are laid out row-major, k ascending)
    rows_of = np.repeat(np.arange(n, dtype=_IDX), np.diff(rowptr))
    order = np.argsort(entries, kind="stable")
    colrows = rows_of[order] if entries.size else np.zeros(1, _IDX)
    return colptr, colrows


def plan_supernodal(A: CSCMatrix, order: int = 1, wmax: int = 128,
                    tau: float = 0.1, small_w: int = 128) -> SupernodalPlan:
    n = A.n
    # ordering composed with postorder so supernodes are contiguous
    p = amd(order, A)
    if p is None:
        p = np.arange(n, dtype=_IDX)
    piv = _pinv(p)
    Cu0 = symperm(A, piv, values=False)
    par0 = etree(Cu0)
    po = post(par0)
    p = p[po]
    piv = _pinv(p)
    Cu = symperm(A, piv, values=False)
    parent = etree(Cu)
    porder = post(parent)
    cnt = counts(Cu, parent, porder)
    colptr, colrows = _column_patterns(Cu, parent, cnt)

    # --- fundamental supernodes --------------------------------------------
    # j, j+1 merge iff parent(j) = j+1 and cnt(j+1) = cnt(j) - 1
    starts = [0]
    for j in range(n - 1):
        if not (parent[j] == j + 1 and cnt[j + 1] == cnt[j] - 1):
            starts.append(j + 1)
    starts.append(n)
    # --- relaxed amalgamation ------------------------------------------------
    # greedily merge CONSECUTIVE supernodes while the merged panel stays
    # dense enough (merging is always correct — it only adds padding
    # zeros whose L values are structurally zero; classic relaxed
    # supernodes a la CHOLMOD). Defaults are AGGRESSIVE (tau=0.1,
    # small_w=wmax): on accelerators dispatch count dominates, and on
    # the 3D-AMD benchmark this cuts levels 409 -> 87 for +23% issued
    # flops (still 3.6x below the fixed-tile engine).
    groups = []           # (c0, c1, od_rows ndarray, nnz_true)
    for i in range(len(starts) - 1):
        c0, c1 = starts[i], starts[i + 1]
        rows_full = colrows[colptr[c0]:colptr[c0 + 1]]
        od = rows_full[rows_full >= c1]
        nnz_true = int(cnt[c0:c1].sum())
        groups.append([c0, c1, np.asarray(od, _IDX), nnz_true])
    merged = [groups[0]] if groups else []
    for g in groups[1:]:
        a = merged[-1]
        w_m = g[1] - a[0]
        if w_m <= wmax:
            od_m = np.union1d(a[2], g[2])
            od_m = od_m[od_m >= g[1]]
            r_m = w_m + od_m.size
            nnz_m = a[3] + g[3]
            dens = nnz_m / max(r_m * w_m, 1)
            if dens >= tau or w_m <= small_w:
                merged[-1] = [a[0], g[1], od_m, nnz_m]
                continue
        merged.append(g)
    # --- split merged groups to pow2 widths <= wmax --------------------------
    snodes: List[_Snode] = []
    col2sn = np.zeros(n, dtype=_IDX)
    for c0, c1, od_rows, _nnz in merged:
        off = c0
        for w in _split_widths(c1 - c0, wmax):
            # chunk od rows: the group's remaining columns + group od rows
            rest_cols = np.arange(off + w, c1, dtype=_IDX)
            rows = np.concatenate([rest_cols, od_rows])
            sid = len(snodes)
            snodes.append(_Snode(sid=sid, c0=off, w=w,
                                 rows=np.asarray(rows, _IDX)))
            col2sn[off:off + w] = sid
            off += w

    # --- supernode etree levels ------------------------------------------
    # parent supernode = supernode of the first od row (if any)
    sn_parent = np.full(len(snodes), -1, dtype=_IDX)
    for s in snodes:
        if s.rows.size:
            sn_parent[s.sid] = col2sn[s.rows[0]]
    level = np.zeros(len(snodes), dtype=_IDX)
    for sid in range(len(snodes)):              # children come first
        pa = sn_parent[sid]
        if pa != -1:
            level[pa] = max(level[pa], level[sid] + 1)
    # ... but updates can jump levels (d updates non-parent ancestors);
    # enforce level(s) > level(d) for every update pair below
    for s in snodes:
        for r in s.rows:
            t = int(col2sn[r])
            level[t] = max(level[t], level[s.sid] + 1)
    nlevels = int(level.max()) + 1 if snodes else 0
    for s in snodes:
        s.level = int(level[s.sid])

    # --- buckets and slots -------------------------------------------------
    bucket_count: Dict[Tuple[int, int], int] = defaultdict(int)
    for s in snodes:
        r = s.w + s.rows.size
        R = max(-(-r // 8) * 8, 8)               # round rows up to 8
        s.bucket = (R, s.w)
        s.slot = bucket_count[s.bucket]
        bucket_count[s.bucket] += 1
    buckets = sorted(bucket_count)
    pool_init = {b: np.zeros((bucket_count[b], b[0], b[1]), np.float32)
                 for b in buckets}

    # scatter A (lower triangle of the permuted matrix) into panels
    C = permute(A, piv, p, values=True)
    Cp, Ci, Cx = C.indptr, C.indices, C.data
    # local row index within each panel: diagonal cols 0..w-1 then od rows
    rowpos = {}                      # (sid, global row) -> panel row
    for s in snodes:
        for t in range(s.w):
            rowpos[(s.sid, s.c0 + t)] = t
        for q, r in enumerate(s.rows):
            rowpos[(s.sid, int(r))] = s.w + q
    for j in range(n):
        sid = int(col2sn[j])
        s = snodes[sid]
        lc = j - s.c0
        seg = slice(Cp[j], Cp[j + 1])
        for i, x in zip(Ci[seg], Cx[seg]):
            if i < j:
                continue
            pool_init[s.bucket][s.slot, rowpos[(sid, int(i))], lc] = x
    # identity padding on unused diagonal rows (rows r..R-1 are zero rows;
    # the W x W diagonal block is exact, so no diagonal padding needed)

    # --- schedules ----------------------------------------------------------
    level_factor: List[Dict] = [defaultdict(list) for _ in range(nlevels)]
    for s in snodes:
        level_factor[s.level][s.bucket].append(s.slot)
    level_factor = [
        {b: np.asarray(v, np.int32) for b, v in lf.items()}
        for lf in level_factor]

    # update pairs (d -> s): the update block is computed DIRECTLY as
    # L1 @ L0^T from row slab-gathers of the factored descendant panel —
    # no multifrontal U matrices at all.  This is strictly cheaper than
    # SYRK + selection (sum over targets of Rs*Ws <= Rq^2) and avoids
    # element gathers (~16x slower than slab gathers on this backend).
    # Groups keyed (d_bucket, s_bucket) so one reshape serves the batch.
    level_updates: List[Dict] = [
        defaultdict(lambda: ([], [], [], []))
        for _ in range(nlevels)]
    for d in snodes:
        if d.rows.size == 0:
            continue
        tgt = col2sn[d.rows]
        for t in np.unique(tgt):
            s = snodes[int(t)]
            sel = np.flatnonzero(tgt == t)       # positions in d.rows
            drows = d.rows[sel]
            Rs, Ws = s.bucket
            G1 = np.full(Rs, -1, np.int64)       # s-panel-row -> d od-pos
            G0 = np.full(Ws, -1, np.int64)       # s-panel-col -> d od-pos
            incol = drows < s.c0 + s.w
            for pos, r in zip(sel[incol], drows[incol]):
                G0[int(r - s.c0)] = pos
            # target rows: ALL of d's od rows >= s.c0; rows absent from
            # s's panel carry structurally-zero values (relaxed padding)
            ge = np.flatnonzero(d.rows >= s.c0)
            for pos in ge:
                pr = rowpos.get((s.sid, int(d.rows[pos])))
                if pr is not None:
                    G1[pr] = pos
            grp = level_updates[s.level][(d.bucket, s.bucket)]
            grp[0].append(s.slot)
            grp[1].append(G1)
            grp[2].append(G0)
            grp[3].append(d.slot)
    level_updates2 = []
    for lu in level_updates:
        out = {}
        for k, v in lu.items():
            out[k] = (np.asarray(v[0], np.int32),
                      np.stack(v[1]).astype(np.int64),   # G1 (P, Rs)
                      np.stack(v[2]).astype(np.int64),   # G0 (P, Ws)
                      np.asarray(v[3], np.int64))        # dslot (P,)
        level_updates2.append(out)
    level_updates = level_updates2

    # --- flop accounting ----------------------------------------------------
    lnz = int(cnt.sum())
    flops_true = int(np.sum(cnt.astype(np.float64) ** 2))
    fp = 0
    for s in snodes:
        R, W = s.bucket
        fp += W ** 3 // 3 + (R - W) * W * W            # chol + trsm
    for lu in level_updates:
        for (db, sb), (ssl, *_rest) in lu.items():
            # direct update GEMMs: (Rs x Wd) @ (Wd x Ws) per pair
            fp += 2 * len(ssl) * sb[0] * db[1] * sb[1]
    return SupernodalPlan(
        n=n, perm=p, snodes=snodes, col2sn=col2sn, nlevels=nlevels,
        buckets=buckets, pool_init=pool_init, level_factor=level_factor,
        level_updates=level_updates, flops_true=flops_true,
        flops_padded=fp, lnz=lnz)


# ------------------------------------------------------------------ device
def _factor_fn(plan: SupernodalPlan):
    """Jittable factor: bucket-pool pytree -> (factored pools, U mats)."""

    def factor(pools):
        pools = dict(pools)
        for lvl in range(plan.nlevels):
            # 1. updates: row slab-gathers of the factored descendant
            #    panels + one batched GEMM per group — update blocks are
            #    computed DIRECTLY as L1 @ L0^T (no multifrontal U
            #    matrices; element gathers are ~16x slower than slab
            #    gathers on this backend, and dense trace-time constants
            #    overflow the remote compiler, so indices are device-built)
            for (db, sb), (ssl, G1, G0, dsl) in \
                    plan.level_updates[lvl].items():
                Rd, Wd = db
                g1 = jnp.asarray(G1.astype(np.int32))        # -1 pads
                g0 = jnp.asarray(G0.astype(np.int32))
                dslj = jnp.asarray(dsl.astype(np.int32))
                flat = pools[db].reshape(-1, Wd)             # (cnt*Rd, Wd)
                base = dslj[:, None] * Rd + Wd               # od rows start
                L1 = flat[base + jnp.maximum(g1, 0)]         # (P, Rs, Wd)
                L1 = L1 * (g1[:, :, None] >= 0).astype(L1.dtype)
                L0 = flat[base + jnp.maximum(g0, 0)]         # (P, Ws, Wd)
                L0 = L0 * (g0[:, :, None] >= 0).astype(L0.dtype)
                delta = jnp.einsum("piw,pjw->pij", L1, L0,
                                   precision=HIGHEST)
                pools[sb] = pools[sb].at[jnp.asarray(ssl)].add(-delta)
            # 2. batched panel factorization at this level
            for b, slots in plan.level_factor[lvl].items():
                R, W = b
                sl = jnp.asarray(slots)
                P = pools[b][sl]                       # (cnt, R, W)
                low = jnp.tril(P[:, :W, :])            # updates land lower
                top = low + jnp.swapaxes(jnp.tril(P[:, :W, :], -1), 1, 2)
                Lkk = jnp.linalg.cholesky(top)
                if R > W:
                    below = P[:, W:, :]
                    Y = jax.lax.linalg.triangular_solve(
                        Lkk, below, left_side=False, lower=True,
                        transpose_a=True)
                    Pnew = jnp.concatenate([Lkk, Y], axis=1)
                else:
                    Pnew = Lkk
                pools[b] = pools[b].at[sl].set(Pnew)
        return pools

    return factor


def _solve_fn(plan: SupernodalPlan):
    """Jittable L L' solve on factored bucket pools: padded x vector in,
    solved x out (permuted coordinates).

    Forward per level (leaves first): x_cols = Lkk^-1 x_cols, then
    x[od rows] -= L_od @ x_cols, batched per bucket with precomputed
    row-gather indices.  Backward in reverse.
    """
    n = plan.n
    # per (level, bucket): col-index arrays (cnt, W) and od-row index
    # arrays (cnt, R-W) into the padded x vector (pad slot = n)
    fwd_sched = []
    for lvl in range(plan.nlevels):
        per_bucket = {}
        for b, slots in plan.level_factor[lvl].items():
            R, W = b
            sns = [s for s in plan.snodes
                   if s.bucket == b and s.slot in set(slots.tolist())
                   and s.level == lvl]
            sns.sort(key=lambda s: s.slot)
            cols = np.stack([np.arange(s.c0, s.c0 + W) for s in sns])
            odr = np.full((len(sns), R - W), n, np.int64)
            for i, s in enumerate(sns):
                odr[i, :s.rows.size] = s.rows
            per_bucket[b] = (np.asarray([s.slot for s in sns], np.int32),
                             cols.astype(np.int32), odr.astype(np.int32))
        fwd_sched.append(per_bucket)

    def solve(pools, xpad):                       # xpad: (n + 1,)
        for lvl in range(plan.nlevels):
            for b, (slots, cols, odr) in fwd_sched[lvl].items():
                R, W = b
                P = pools[b][jnp.asarray(slots)]
                Lkk = P[:, :W, :]
                xc = xpad[jnp.asarray(cols)]      # (cnt, W)
                yc = jax.lax.linalg.triangular_solve(
                    Lkk, xc[:, :, None], left_side=True, lower=True)[:, :, 0]
                xpad = xpad.at[jnp.asarray(cols)].set(yc)
                if R > W:
                    Lod = P[:, W:, :]
                    delta = jnp.einsum("crw,cw->cr", Lod, yc,
                                       precision=HIGHEST)
                    xpad = xpad.at[jnp.asarray(odr)].add(-delta)
                    xpad = xpad.at[n].set(0.0)
        for lvl in range(plan.nlevels - 1, -1, -1):
            for b, (slots, cols, odr) in fwd_sched[lvl].items():
                R, W = b
                P = pools[b][jnp.asarray(slots)]
                Lkk = P[:, :W, :]
                acc = xpad[jnp.asarray(cols)]
                if R > W:
                    Lod = P[:, W:, :]
                    xod = xpad[jnp.asarray(odr)]
                    acc = acc - jnp.einsum("crw,cr->cw", Lod, xod,
                                           precision=HIGHEST)
                xc = jax.lax.linalg.triangular_solve(
                    Lkk, acc[:, :, None], left_side=True, lower=True,
                    transpose_a=True)[:, :, 0]
                xpad = xpad.at[jnp.asarray(cols)].set(xc)
        return xpad

    return solve


class SupernodalCholesky:
    """Plan + factor + solve driver for the variable-panel supernodal
    engine (same contracts as TpuCholesky)."""

    def __init__(self, A: CSCMatrix, order: int = 1, wmax: int = 128,
                 tau: float = 0.1, small_w: int = 128):
        self.A = A
        self.plan = plan_supernodal(A, order=order, wmax=wmax, tau=tau,
                                    small_w=small_w)
        self._factor = jax.jit(_factor_fn(self.plan))
        self._solve = jax.jit(_solve_fn(self.plan))
        self.pools = None

    def factor(self) -> bool:
        pools = self._factor({b: jnp.asarray(v)
                              for b, v in self.plan.pool_init.items()})
        ok = all(bool(jnp.all(jnp.isfinite(v))) for v in pools.values())
        if ok:
            self.pools = pools
        return ok

    def _solve_f32(self, b: np.ndarray) -> np.ndarray:
        plan = self.plan
        bp = pvec(plan.perm, np.asarray(b, np.float64))
        xpad = np.zeros(plan.n + 1, dtype=np.float32)
        xpad[:plan.n] = bp
        out = self._solve(self.pools, jnp.asarray(xpad))
        xp = np.asarray(out, np.float64)[:plan.n]
        return ipvec(plan.perm, xp)

    def solve(self, b: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        from .refine import refine
        if self.pools is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        return refine(self.A, self._solve_f32, b, iters=refine_iters)

    def solve_many(self, B: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        """Solve A X = B for (n, k) right-hand sides: vmapped device
        solves + batched f64 refinement (factor-once/solve-many)."""
        B = np.asarray(B, dtype=np.float64)
        if B.ndim == 1:
            return self.solve(B, refine_iters)
        if self.pools is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        if getattr(self, "_solve_vmapped", None) is None:
            self._solve_vmapped = jax.jit(jax.vmap(
                _solve_fn(self.plan), in_axes=(None, 0)))
        plan = self.plan
        from ..core.ops import gaxpy, norm1

        def solve_f32_many(Bm):
            k = Bm.shape[1]
            Bp = Bm[plan.perm]
            xpad = np.zeros((k, plan.n + 1), dtype=np.float32)
            xpad[:, :plan.n] = Bp.T
            out = self._solve_vmapped(self.pools, jnp.asarray(xpad))
            Xp = np.asarray(out, np.float64)[:, :plan.n].T
            res = np.zeros_like(Xp)
            res[plan.perm] = Xp
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

    def metrics(self):
        """Structured per-stage metrics (SURVEY.md §5)."""
        from ..utils.profiling import Metrics
        plan = self.plan
        m = Metrics().record_plan("chol", plan)
        m.record(chol_engine="supernodal",
                 chol_supernodes=len(plan.snodes),
                 chol_buckets=len(plan.buckets),
                 chol_levels=plan.nlevels,
                 chol_nnz_predicted=int(plan.lnz))
        return m
