"""Block-tiled right-looking Cholesky on TPU.

The TPU-native redesign of csparse::cs_chol (SURVEY.md §3.1, §7.1 stage 3
and BASELINE.json's north star): symbolic analysis runs once on host and
emits a STATIC block schedule; the numeric factorization is a fixed
sequence of dense-tile ops executed on device under one jit:

  per panel k (block column of width B):
    1. FACTOR   : dense Cholesky of the BxB diagonal tile
    2. TRSM     : batched  L(I,k) <- A(I,k) @ L(k,k)^-T     (MXU batch)
    3. SYRK/GEMM: batched  A(I,J) -= L(I,k) @ L(J,k)^T      (MXU batch)

Tiles live in one (T, B, B) HBM pool; the host planner computes the
block-level fill (symbolic Cholesky on the tile quotient graph), assigns
pool slots, and precomputes every gather/scatter index — the device loop
has NO data-dependent control flow (SURVEY.md §7.0).

Numerically: f32 with Precision.HIGHEST (bf16 default is not enough —
BASELINE.md probe), reference-grade ~1e-16 residuals via host-f64
iterative refinement (tpusparse.device.refine).

Failure contract: like the reference (cs_chol returns None for non-SPD),
``factor`` returns ok=False when a diagonal tile fails (NaN check on
host after the device run).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import permute
from ..core.perm import ipvec, pvec, pinv as _pinv
from ..symbolic.amd import amd
from .config import HIGHEST, default_block, round_up

__all__ = ["CholPlan", "plan_cholesky", "TpuCholesky"]

_IDX = np.int64


# ---------------------------------------------------------------- planning
def _scalar_row_patterns(Cu: CSCMatrix, parent, cnt):
    """Row patterns of L (strictly-lower) — the cs_ereach loop over every
    row, native when built (tpusparse.native.rowpatterns)."""
    n = Cu.n
    total = int(cnt.sum()) - n
    from .. import native
    if native.available():
        return native.rowpatterns(n, Cu.indptr, Cu.indices,
                                  np.asarray(parent, _IDX), total)
    from ..symbolic.etree import ereach
    rowptr = np.zeros(n + 1, dtype=_IDX)
    entries = np.zeros(max(total, 1), dtype=_IDX)
    s = np.zeros(n, dtype=_IDX)
    w = np.zeros(n, dtype=bool)
    q = 0
    for k in range(n):
        rowptr[k] = q
        pat = ereach(Cu, k, parent, s, w)
        entries[q:q + pat.size] = pat
        q += pat.size
    rowptr[n] = q
    return rowptr, entries[:q]


def _tile_pattern(n: int, B: int, rowptr, entries):
    """EXACT tile pattern of L: tiles that contain at least one scalar
    fill entry.  (A block-quotient closure would over-approximate badly —
    updates whose destination tile holds no scalar fill are structurally
    zero, because a nonzero term l(i,k)*l(j,k) forces scalar fill at
    (i,j) by the no-cancellation fill theorem — so they are SKIPPED.)"""
    nb = round_up(n, B) // B
    tilepairs = set()
    for k in range(n):
        I = k // B
        tilepairs.add((I, I))                   # diagonal (incl. L(k,k))
        for j in entries[rowptr[k]:rowptr[k + 1]]:
            tilepairs.add((I, int(j) // B))     # row k, col j < k
    colpat = [set() for _ in range(nb)]
    for I, J in tilepairs:
        colpat[J].add(I)
    return tilepairs, colpat


@dataclass
class CholPlan:
    """Static device schedule for one sparsity pattern."""
    n: int
    B: int
    nb: int
    perm: Optional[np.ndarray]          # fill-reducing permutation p
    pinv: Optional[np.ndarray]
    diag_id: np.ndarray                 # (nb,) pool slot of tile (k,k)
    off_ids: List[np.ndarray]           # per k: pool slots of L(I,k), I>k
    off_rows: List[np.ndarray]          # per k: tile-row I of each off slot
    upd_dst: List[np.ndarray]           # per k: dst pool slots
    upd_a: List[np.ndarray]             # per k: position (in off list) of I
    upd_b: List[np.ndarray]             # per k: position of J
    pool_init: np.ndarray               # (T, B, B) f32 initial tiles
    flops_true: int                     # scalar factorization flops
    flops_padded: int                   # dense-tile flops actually issued
    lnz: int

    @property
    def waste_ratio(self) -> float:
        return 1.0 - self.flops_true / max(self.flops_padded, 1)


def plan_cholesky(A: CSCMatrix, order: int = 1,
                  block: Optional[int] = None) -> CholPlan:
    """Host planning: AMD ordering, block fill, slot assignment, tile
    scatter, op lists (runs once per pattern — SURVEY.md §7.0)."""
    n = A.n
    B = block or min(default_block(), max(8, round_up(n, 8)))
    if order == 4:                        # RCM: band-friendly tiles
        from ..symbolic.rcm import rcm
        p = rcm(A)
    else:
        p = amd(order, A)
    piv = _pinv(p) if p is not None else None
    C = permute(A, piv, p, values=True) if p is not None else A
    nb = round_up(n, B) // B
    # exact scalar fill -> exact tile pattern (see _tile_pattern)
    from ..symbolic.etree import counts, etree, post
    from ..core.ops import symperm
    Cu = symperm(A, piv, values=False)
    par = etree(Cu)
    cnt = counts(Cu, par, post(par))
    rowptr, entries = _scalar_row_patterns(Cu, par, cnt)
    tilepairs, colpat = _tile_pattern(n, B, rowptr, entries)
    # slot assignment: diagonal tiles first, then off-diagonals per column
    diag_id = np.zeros(nb, dtype=_IDX)
    slot_of = {}
    T = 0
    for k in range(nb):
        diag_id[k] = T
        slot_of[(k, k)] = T
        T += 1
    off_rows: List[np.ndarray] = []
    off_ids: List[np.ndarray] = []
    for k in range(nb):
        rows = sorted(i for i in colpat[k] if i > k)
        ids = []
        for i in rows:
            slot_of[(i, k)] = T
            ids.append(T)
            T += 1
        off_rows.append(np.asarray(rows, dtype=_IDX))
        off_ids.append(np.asarray(ids, dtype=_IDX))
    # update ops per panel — only where the destination tile exists in
    # the exact fill pattern (absent dst => structurally zero product)
    upd_dst, upd_a, upd_b = [], [], []
    for k in range(nb):
        rows = off_rows[k]
        dsts, aa, bb = [], [], []
        for bpos, J in enumerate(rows):
            for apos in range(bpos, len(rows)):
                I = rows[apos]
                key = (int(I), int(J))
                if key not in slot_of:
                    continue
                dsts.append(slot_of[key])
                aa.append(apos)
                bb.append(bpos)
        upd_dst.append(np.asarray(dsts, dtype=_IDX))
        upd_a.append(np.asarray(aa, dtype=_IDX))
        upd_b.append(np.asarray(bb, dtype=_IDX))
    # scatter C into the pool; padded diagonal gets 1.0 so the dense tile
    # Cholesky stays nonsingular
    pool = np.zeros((T, B, B), dtype=np.float32)
    cols = np.repeat(np.arange(n, dtype=_IDX), np.diff(C.indptr))
    ti = C.indices // B
    tj = cols // B
    keep = ti >= tj                      # lower triangle drives the factor
    for pos in np.flatnonzero(keep):
        i = int(C.indices[pos])
        j = int(cols[pos])
        s = slot_of[(i // B, j // B)]
        pool[s, i - (i // B) * B, j - (j // B) * B] = C.data[pos]
    for d in range(n, nb * B):           # padded diagonal
        k = d // B
        pool[diag_id[k], d - k * B, d - k * B] = 1.0
    # flop accounting (cnt computed above)
    lnz = int(cnt.sum())
    flops_true = int(np.sum(cnt.astype(np.float64) ** 2))
    fp = 0
    for k in range(nb):
        r = len(off_rows[k])
        fp += B ** 3 // 3 + r * B ** 3 + len(upd_dst[k]) * 2 * B ** 3
    return CholPlan(n=n, B=B, nb=nb, perm=p, pinv=piv, diag_id=diag_id,
                    off_ids=off_ids, off_rows=off_rows, upd_dst=upd_dst,
                    upd_a=upd_a, upd_b=upd_b, pool_init=pool,
                    flops_true=flops_true, flops_padded=fp, lnz=lnz)


# ---------------------------------------------------------------- device
def _pad_schedule(plan: CholPlan):
    """Uniform per-panel schedule arrays for the scan-based kernels.

    Padded slots point at a DUMP tile appended to the pool: padded TRSM
    results and padded GEMM updates land there and are never read back
    (the dump is not a diagonal tile, so the NaN failure check ignores
    it).  This turns the variable per-panel op lists into fixed (nb, R)
    and (nb, U) arrays that one lax.scan body can consume.
    """
    nb = plan.nb
    T = plan.pool_init.shape[0]                   # dump slot id
    R = max((x.size for x in plan.off_ids), default=0)
    U = max((x.size for x in plan.upd_dst), default=0)
    R = max(R, 1)
    U = max(U, 1)
    off_ids = np.full((nb, R), T, dtype=np.int32)
    off_rows = np.zeros((nb, R), dtype=np.int32)  # gather-only; 0 is safe
    off_mask = np.zeros((nb, R), dtype=np.float32)
    upd_dst = np.full((nb, U), T, dtype=np.int32)
    upd_a = np.zeros((nb, U), dtype=np.int32)
    upd_b = np.zeros((nb, U), dtype=np.int32)
    for k in range(nb):
        r = plan.off_ids[k].size
        off_ids[k, :r] = plan.off_ids[k]
        off_rows[k, :r] = plan.off_rows[k]
        off_mask[k, :r] = 1.0
        u = plan.upd_dst[k].size
        upd_dst[k, :u] = plan.upd_dst[k]
        upd_a[k, :u] = plan.upd_a[k]
        upd_b[k, :u] = plan.upd_b[k]
    return dict(diag_id=np.asarray(plan.diag_id, np.int32),
                off_ids=off_ids, off_rows=off_rows, off_mask=off_mask,
                upd_dst=upd_dst, upd_a=upd_a, upd_b=upd_b, dump=T)


_SCAN_CACHE: dict = {}


def _pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _scan_factor_generic():
    """The shape-generic scan factorization: the schedule arrives as
    RUNTIME arrays, so one compiled program serves every matrix whose
    bucketed shape signature (T, B, nb, R, U) matches — each distinct
    compile costs ~90 s on axon, so reuse is the lever.

    Convention: pool carries two extra trailing tiles appended by the
    caller — pool[T] = dump (padding scatter target), pool[T+1] =
    identity (diag of padded no-op panels, cholesky(I) = I)."""

    import os
    use_pallas = bool(os.environ.get("TPUSPARSE_PALLAS_CHOL"))
    use_pallas_trsm = bool(os.environ.get("TPUSPARSE_PALLAS_TRSM"))

    def factor(pool, diag_id, off_ids, upd_dst, upd_a, upd_b):
        def body(pool, xs):
            dk, oids, ud, ua, ub = xs
            if use_pallas:
                from .kernels import chol_tiles
                Lkk = chol_tiles(pool[dk][None])[0]
            else:
                Lkk = jnp.linalg.cholesky(pool[dk])
            pool = pool.at[dk].set(Lkk)
            X = pool[oids]                               # (R, B, B)
            if use_pallas_trsm:
                from .kernels import trsm_tiles
                Y = trsm_tiles(Lkk, X)
            else:
                Y = jax.lax.linalg.triangular_solve(
                    jnp.broadcast_to(Lkk, X.shape), X,
                    left_side=False, lower=True, transpose_a=True)
            pool = pool.at[oids].set(Y)
            La = Y[ua]
            Lb = Y[ub]
            delta = jnp.einsum("uij,ukj->uik", La, Lb, precision=HIGHEST)
            pool = pool.at[ud].add(-delta)
            return pool, None

        pool, _ = jax.lax.scan(
            body, pool, (diag_id, off_ids, upd_dst, upd_a, upd_b))
        return pool

    return factor


def _factor_fn_scan(plan: CholPlan):
    """Scan-based factorization: one compiled panel body, O(1) program
    size in nb (vs the unrolled _factor_fn), with the schedule passed as
    bucketed runtime arrays so compiled programs are REUSED across
    matrices (axon: ~90 s per distinct jit)."""
    sched = _pad_schedule(plan)
    T = plan.pool_init.shape[0]
    nbp = _pow2(plan.nb)
    R = _pow2(sched["off_ids"].shape[1])
    U = _pow2(sched["upd_dst"].shape[1])
    dump, ident = T, T + 1
    diag_id = np.full(nbp, ident, np.int32)
    diag_id[:plan.nb] = sched["diag_id"]
    off_ids = np.full((nbp, R), dump, np.int32)
    off_ids[:plan.nb, :sched["off_ids"].shape[1]] = sched["off_ids"]
    upd_dst = np.full((nbp, U), dump, np.int32)
    upd_dst[:plan.nb, :sched["upd_dst"].shape[1]] = sched["upd_dst"]
    upd_a = np.zeros((nbp, U), np.int32)
    upd_a[:plan.nb, :sched["upd_a"].shape[1]] = sched["upd_a"]
    upd_b = np.zeros((nbp, U), np.int32)
    upd_b[:plan.nb, :sched["upd_b"].shape[1]] = sched["upd_b"]
    args = tuple(jnp.asarray(x) for x in
                 (diag_id, off_ids, upd_dst, upd_a, upd_b))
    key = "factor"
    if key not in _SCAN_CACHE:
        _SCAN_CACHE[key] = jax.jit(_scan_factor_generic())
    jitted = _SCAN_CACHE[key]
    B = plan.B

    def factor(pool):
        extra = jnp.concatenate(
            [jnp.zeros((1, B, B), pool.dtype),
             jnp.eye(B, dtype=pool.dtype)[None]], axis=0)
        pool = jnp.concatenate([pool, extra], axis=0)
        pool = jitted(pool, *args)
        return pool[:-2]

    return factor


def _scan_solve_generic():
    """Shape-generic forward/backward block substitution (see
    _scan_factor_generic for the caching rationale).  bt carries one
    extra dump row; padded panels point k at the dump row and diag at
    the identity tile."""

    def solve(pool, bt, ks, diag_id, off_ids, off_rows, off_mask):
        def fwd(bt, xs):
            k, dk, oids, orows, omask = xs
            Lkk = pool[dk]
            xk = jax.lax.linalg.triangular_solve(
                Lkk, bt[k][:, None], left_side=True, lower=True)[:, 0]
            bt = bt.at[k].set(xk)
            blocks = pool[oids]
            delta = jnp.einsum("rij,j->ri", blocks, xk, precision=HIGHEST)
            delta = delta * omask[:, None]
            dump_row = bt.shape[0] - 1
            tgt = jnp.where(omask > 0, orows, dump_row)
            bt = bt.at[tgt].add(-delta)
            return bt, None

        bt, _ = jax.lax.scan(fwd, bt,
                             (ks, diag_id, off_ids, off_rows, off_mask))

        def bwd(bt, xs):
            k, dk, oids, orows, omask = xs
            blocks = pool[oids]
            xs_rows = bt[orows] * omask[:, None]
            acc = bt[k] - jnp.einsum("rij,ri->j", blocks, xs_rows,
                                     precision=HIGHEST)
            Lkk = pool[dk]
            xk = jax.lax.linalg.triangular_solve(
                Lkk, acc[:, None], left_side=True, lower=True,
                transpose_a=True)[:, 0]
            bt = bt.at[k].set(xk)
            return bt, None

        bt, _ = jax.lax.scan(bwd, bt,
                             (ks, diag_id, off_ids, off_rows, off_mask),
                             reverse=True)
        return bt

    return solve


def _solve_fn_scan(plan: CholPlan):
    """Scan-based L L' solve with bucketed runtime schedule (compiled
    program shared across matrices with the same shape signature)."""
    sched = _pad_schedule(plan)
    T = plan.pool_init.shape[0]
    nbp = _pow2(plan.nb)
    R = _pow2(sched["off_ids"].shape[1])
    dump, ident = T, T + 1
    r0 = sched["off_ids"].shape[1]
    diag_id = np.full(nbp, ident, np.int32)
    diag_id[:plan.nb] = sched["diag_id"]
    off_ids = np.full((nbp, R), dump, np.int32)
    off_ids[:plan.nb, :r0] = sched["off_ids"]
    off_rows = np.zeros((nbp, R), np.int32)
    off_rows[:plan.nb, :r0] = sched["off_rows"]
    off_mask = np.zeros((nbp, R), np.float32)
    off_mask[:plan.nb, :r0] = sched["off_mask"]
    ks = np.full(nbp, nbp, np.int32)             # padded -> dump row
    ks[:plan.nb] = np.arange(plan.nb, dtype=np.int32)
    args = tuple(jnp.asarray(x) for x in
                 (ks, diag_id, off_ids, off_rows, off_mask))
    key = "solve"
    if key not in _SCAN_CACHE:
        _SCAN_CACHE[key] = jax.jit(_scan_solve_generic())
    jitted = _SCAN_CACHE[key]
    B = plan.B
    nb = plan.nb

    def solve(pool, bt):
        extra = jnp.concatenate(
            [jnp.zeros((1, B, B), pool.dtype),
             jnp.eye(B, dtype=pool.dtype)[None]], axis=0)
        poolx = jnp.concatenate([pool, extra], axis=0)
        # pad bt to nbp panels + 1 dump row
        btx = jnp.zeros((nbp + 1, B), bt.dtype).at[:nb].set(bt)
        btx = jitted(poolx, btx, *args)
        return btx[:nb]

    return solve


def _factor_fn(plan: CholPlan):
    """Build the jittable factorization: pool -> L pool."""
    nb = plan.nb
    diag_id = [int(i) for i in plan.diag_id]
    off_ids = [jnp.asarray(x, jnp.int32) for x in plan.off_ids]
    upd_dst = [jnp.asarray(x, jnp.int32) for x in plan.upd_dst]
    upd_a = [jnp.asarray(x, jnp.int32) for x in plan.upd_a]
    upd_b = [jnp.asarray(x, jnp.int32) for x in plan.upd_b]

    def factor(pool):
        for k in range(nb):
            dk = pool[diag_id[k]]
            Lkk = jnp.linalg.cholesky(dk)
            pool = pool.at[diag_id[k]].set(Lkk)
            if plan.off_ids[k].size:
                X = pool[off_ids[k]]                     # (r, B, B)
                Lb_ = jnp.broadcast_to(Lkk, X.shape)
                Y = jax.lax.linalg.triangular_solve(
                    Lb_, X, left_side=False, lower=True, transpose_a=True)
                pool = pool.at[off_ids[k]].set(Y)
                if plan.upd_dst[k].size:
                    La = Y[upd_a[k]]                     # (u, B, B)
                    Lb = Y[upd_b[k]]
                    delta = jnp.einsum("uij,ukj->uik", La, Lb,
                                       precision=HIGHEST)
                    pool = pool.at[upd_dst[k]].add(-delta)
        return pool

    return factor


def _solve_fn(plan: CholPlan):
    """Build the jittable L L' solve on the factored pool:
    (pool, b_tiles) -> x_tiles, forward then backward block substitution."""
    nb, B = plan.nb, plan.B
    diag_id = [int(i) for i in plan.diag_id]
    off_ids = [jnp.asarray(x, jnp.int32) for x in plan.off_ids]
    off_rows = [jnp.asarray(x, jnp.int32) for x in plan.off_rows]

    def solve(pool, bt):                                  # bt: (nb, B)
        # forward: L y = b
        for k in range(nb):
            Lkk = pool[diag_id[k]]
            xk = jax.lax.linalg.triangular_solve(
                Lkk, bt[k][:, None], left_side=True, lower=True)[:, 0]
            bt = bt.at[k].set(xk)
            if plan.off_ids[k].size:
                blocks = pool[off_ids[k]]                 # (r, B, B)
                delta = jnp.einsum("rij,j->ri", blocks, xk,
                                   precision=HIGHEST)
                bt = bt.at[off_rows[k]].add(-delta)
        # backward: L' x = y
        for k in range(nb - 1, -1, -1):
            acc = bt[k]
            if plan.off_ids[k].size:
                blocks = pool[off_ids[k]]
                xs = bt[off_rows[k]]                      # (r, B)
                acc = acc - jnp.einsum("rij,ri->j", blocks, xs,
                                       precision=HIGHEST)
            Lkk = pool[diag_id[k]]
            xk = jax.lax.linalg.triangular_solve(
                Lkk, acc[:, None], left_side=True, lower=True,
                transpose_a=True)[:, 0]
            bt = bt.at[k].set(xk)
        return bt

    return solve


class TpuCholesky:
    """Plan + factor + solve driver for the device Cholesky.

    Usage:
        F = TpuCholesky(A, order=1)      # host planning + jit
        ok = F.factor()                   # device factorization (f32)
        x = F.solve(b)                    # device solves + f64 refinement
    """

    # above this many panels, use the lax.scan kernels: O(1) program size
    # instead of O(nb) unrolled panels (axon compiles cost ~90 s per jit)
    SCAN_THRESHOLD = 24

    def __init__(self, A: CSCMatrix, order: int = 1,
                 block: Optional[int] = None, use_scan: Optional[bool] = None):
        self.A = A
        self.plan = plan_cholesky(A, order=order, block=block)
        if use_scan is None:
            use_scan = self.plan.nb >= self.SCAN_THRESHOLD
        self.use_scan = use_scan
        if use_scan:
            self._factor = jax.jit(_factor_fn_scan(self.plan))
            self._solve = jax.jit(_solve_fn_scan(self.plan))
        else:
            self._factor = jax.jit(_factor_fn(self.plan))
            self._solve = jax.jit(_solve_fn(self.plan))
        self._solve_vmapped = None
        self.pool = None

    def factor(self) -> bool:
        pool = self._factor(jnp.asarray(self.plan.pool_init))
        # failure detection: non-SPD -> NaN in a diagonal tile
        diag = pool[jnp.asarray(self.plan.diag_id.astype(np.int32))]
        ok = bool(jnp.all(jnp.isfinite(diag)))
        if ok:
            self.pool = pool
        return ok

    def _solve_f32(self, b: np.ndarray) -> np.ndarray:
        plan = self.plan
        nb, B, n = plan.nb, plan.B, plan.n
        bp = pvec(plan.perm, np.asarray(b, np.float64)) \
            if plan.perm is not None else np.asarray(b, np.float64)
        bt = np.zeros((nb, B), dtype=np.float32)
        bt.reshape(-1)[:n] = bp
        xt = self._solve(self.pool, jnp.asarray(bt))
        xp = np.asarray(xt, dtype=np.float64).reshape(-1)[:n]
        # x = P' x_perm  (undo the fill-reducing row/col permutation)
        return ipvec(plan.perm, xp) if plan.perm is not None else xp

    def solve(self, b: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        """Solve A x = b: f32 device solves + f64 host iterative
        refinement to reference-grade residuals (BASELINE.md probe #3)."""
        from .refine import refine
        if self.pool is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        return refine(self.A, self._solve_f32, b, iters=refine_iters)

    def _solve_f32_many(self, Bm: np.ndarray) -> np.ndarray:
        """Batched f32 device solve for (n, k) right-hand sides — the
        solve scan vmapped over the RHS axis (one device dispatch)."""
        plan = self.plan
        nb, Bsz, n = plan.nb, plan.B, plan.n
        k = Bm.shape[1]
        if self._solve_vmapped is None:
            self._solve_vmapped = jax.jit(jax.vmap(
                (_solve_fn_scan(plan) if self.use_scan
                 else _solve_fn(plan)), in_axes=(None, 0)))
        Bp = (Bm[plan.perm] if plan.perm is not None else Bm)
        bt = np.zeros((k, nb, Bsz), dtype=np.float32)
        bt.reshape(k, -1)[:, :n] = Bp.T
        xt = self._solve_vmapped(self.pool, jnp.asarray(bt))
        Xp = np.asarray(xt, np.float64).reshape(k, -1)[:, :n].T
        if plan.perm is not None:
            out = np.zeros_like(Xp)
            out[plan.perm] = Xp
            return out
        return Xp

    def metrics(self):
        """Structured per-stage metrics (SURVEY.md §5): predicted vs
        stored nnz, true vs issued flops, padding waste."""
        from ..utils.profiling import Metrics
        plan = self.plan
        m = Metrics().record_plan("chol", plan)
        m.record(chol_engine="tiled_scan" if self.use_scan else "tiled",
                 chol_block=plan.B, chol_panels=plan.nb,
                 chol_tiles=int(plan.pool_init.shape[0]),
                 chol_nnz_predicted=int(plan.lnz),
                 chol_nnz_stored=int(plan.pool_init.shape[0]
                                     * plan.B * plan.B))
        return m

    def solve_many(self, B: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        """Solve A X = B for multiple right-hand sides (n, k) with the
        factor-once/solve-many pattern (SURVEY.md §5): batched device
        solves (vmapped scan) + batched f64 refinement."""
        B = np.asarray(B, dtype=np.float64)
        if B.ndim == 1:
            return self.solve(B, refine_iters)
        if self.pool is None and not self.factor():
            raise ValueError("matrix is not positive definite")
        from ..core.ops import gaxpy, norm1
        X = self._solve_f32_many(B)
        nrmA = norm1(self.A)
        for _ in range(refine_iters):
            R = np.stack([B[:, j] - gaxpy(self.A, X[:, j],
                                          np.zeros(self.A.m))
                          for j in range(B.shape[1])], axis=1)
            denom = nrmA * np.abs(X).max() + np.abs(B).max()
            if denom == 0 or np.abs(R).max() / denom < 1e-14:
                break
            X = X + self._solve_f32_many(R)
        return X

    # ------------------------------------------------------------ updown
    def _extract_L(self):
        """Reconstruct the factor as host CSC (permuted coordinates,
        diagonal-first columns, INCLUDING stored padding zeros so the
        tile pattern round-trips) plus the entry -> tile-slot map."""
        plan = self.plan
        nb, B, n = plan.nb, plan.B, plan.n
        pool = np.asarray(self.pool, dtype=np.float64)
        cols_entries = [[] for _ in range(n)]     # (row, val, slot, r, c)
        for k in range(nb):
            dt = pool[plan.diag_id[k]]
            base = k * B
            for c in range(min(B, n - base)):
                j = base + c
                for r in range(c, min(B, n - base)):
                    cols_entries[j].append(
                        (base + r, dt[r, c], int(plan.diag_id[k]), r, c))
            for I, sid in zip(plan.off_rows[k], plan.off_ids[k]):
                ot = pool[sid]
                rbase = int(I) * B
                for c in range(min(B, n - base)):
                    j = base + c
                    for r in range(min(B, n - rbase)):
                        cols_entries[j].append(
                            (rbase + r, ot[r, c], int(sid), r, c))
        indptr = np.zeros(n + 1, dtype=np.int64)
        rows, vals, slots = [], [], []
        for j in range(n):
            ent = sorted(cols_entries[j])          # diag first (row order)
            indptr[j + 1] = indptr[j] + len(ent)
            for row, v, sid, r, c in ent:
                rows.append(row)
                vals.append(v)
                slots.append((sid, r, c))
        L = CSCMatrix(n, n, indptr, np.asarray(rows, np.int64),
                      np.asarray(vals))
        return L, slots

    def _updown_sched(self):
        """Static per-column schedule for the DEVICE-RESIDENT updown
        scan: for every column j (all n of them — the recurrence is an
        exact no-op where w is zero, so the scan shape never depends on
        the update vector), the flat pool indices of its stored entries
        and their global rows.  Built once per plan, cached."""
        if getattr(self, "_ud_sched", None) is not None:
            return self._ud_sched
        plan = self.plan
        n, B, nb = plan.n, plan.B, plan.nb
        T = plan.pool_init.shape[0]
        maxoff = max((x.size for x in plan.off_ids), default=0)
        H = (B - 1) + maxoff * B
        H = max(H, 1)
        dump_flat = T * B * B                     # one appended slot
        dflat = np.zeros(n, np.int32)
        colidx = np.full((n, H), dump_flat, np.int32)
        rowid = np.full((n, H), n, np.int32)
        for jb in range(nb):
            dslot = int(plan.diag_id[jb])
            offs = plan.off_ids[jb]
            rows = plan.off_rows[jb]
            for c in range(min(B, n - jb * B)):
                j = jb * B + c
                dflat[j] = (dslot * B + c) * B + c
                r = np.arange(c + 1, B)
                colidx[j, :r.size] = (dslot * B + r) * B + c
                rowid[j, :r.size] = np.minimum(jb * B + r, n)
                q = r.size
                for I, slot in zip(rows, offs):
                    rr = np.arange(B)
                    colidx[j, q:q + B] = (int(slot) * B + rr) * B + c
                    rowid[j, q:q + B] = np.minimum(int(I) * B + rr, n)
                    q += B
        self._ud_sched = dict(
            dflat=jnp.asarray(dflat), colidx=jnp.asarray(colidx),
            rowid=jnp.asarray(rowid), H=H)
        return self._ud_sched

    @staticmethod
    def _updown_scan(sigma: int):
        """Jittable scan over columns: carry = (flat pool + dump slot,
        w padded with a dump entry kept at 0, beta, ok)."""

        def run(poolf, w, dflat, colidx, rowid):
            n = w.shape[0] - 1

            def body2(carry, x):
                poolf, w, beta, okf = carry
                df, ci, ri, jc = x
                Ljj = poolf[df]
                wj = w[jc]
                alpha = wj / Ljj
                beta2sq = beta * beta + sigma * alpha * alpha
                bad = beta2sq <= 0.0
                okf = jnp.logical_and(okf, jnp.logical_not(bad))
                beta2 = jnp.sqrt(jnp.maximum(beta2sq, 1e-30))
                if sigma > 0:
                    delta = beta / beta2
                else:
                    delta = beta2 / beta
                gamma = sigma * alpha / (beta2 * beta)
                if sigma > 0:
                    poolf = poolf.at[df].set(delta * Ljj + gamma * wj)
                else:
                    poolf = poolf.at[df].set(delta * Ljj)
                Lcol = poolf[ci]
                w1 = w[ri]
                w2 = w1 - alpha * Lcol
                w = w.at[ri].set(w2)
                w = w.at[n].set(0.0)            # keep the dump slot clean
                Lnew = delta * Lcol + gamma * (w1 if sigma > 0 else w2)
                poolf = poolf.at[ci].set(Lnew)
                return (poolf, w, beta2, okf), None

            jcols = jnp.arange(n, dtype=jnp.int32)
            (poolf, w, beta, okf), _ = jax.lax.scan(
                body2, (poolf, w, jnp.float32(1.0), jnp.bool_(True)),
                (dflat, colidx, rowid, jcols))
            return poolf, okf

        return run

    _UD_JIT: dict = {}

    def updown(self, sigma: int, w: np.ndarray) -> bool:
        """Rank-1 update/downdate of the FACTORED pool in place:
        A <- A + sigma*w*w' and L updated along the etree path
        (reference: csparse::cs_updown; SURVEY.md §2.2).

        w is in ORIGINAL coordinates; its pattern must be contained in an
        existing column pattern of L (the reference demo3 contract).
        DEVICE-RESIDENT (VERDICT r1 item 5): the alpha/beta/gamma path
        recurrence runs as one lax.scan over the tile pool — the factor
        is never downloaded; on a failed downdate (non-PD) the old pool
        is kept, matching the ok=False contract.
        """
        from ..core.matrix import csc_from_dense
        from ..core.ops import add, multiply, transpose
        if self.pool is None:
            raise ValueError("factor() first")
        plan = self.plan
        n = plan.n
        w = np.asarray(w, dtype=np.float64)
        wp = w[plan.perm] if plan.perm is not None else w.copy()
        sched = self._updown_sched()
        key = (sigma, n, sched["H"], plan.pool_init.shape[0], plan.B)
        if key not in TpuCholesky._UD_JIT:
            TpuCholesky._UD_JIT[key] = jax.jit(
                self._updown_scan(1 if sigma > 0 else -1))
        poolf = jnp.concatenate(
            [self.pool.reshape(-1), jnp.zeros(1, self.pool.dtype)])
        wpad = jnp.asarray(
            np.concatenate([wp, [0.0]]).astype(np.float32))
        poolf, okf = TpuCholesky._UD_JIT[key](
            poolf, wpad, sched["dflat"], sched["colidx"],
            sched["rowid"])
        ok = bool(okf)
        if not ok:
            return False
        T, B = plan.pool_init.shape[0], plan.B
        self.pool = poolf[:-1].reshape(T, B, B)
        W = csc_from_dense(w.reshape(-1, 1))
        ww = multiply(W, transpose(W))
        self.A = add(self.A, ww, 1.0, float(sigma))
        return True
