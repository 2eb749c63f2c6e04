"""Sparse supernodal LU on the superscan machinery — large unsymmetric
blocks factor WITHOUT densifying (VERDICT r1 item 3; reference:
csparse::cs_lu, SURVEY.md §3.2 / §7.1 stage 4).

TPU-first pivoting strategy (the static-shape answer to cs_lu's dynamic
row exchanges, SURVEY.md §7.4(1)): STATIC pivoting a la SuperLU_DIST —
factor on the Cholesky fill pattern of the symmetrized pattern
pat(A + A' + I) with NO row exchanges, replacing tiny diagonal pivots by
+-eps*||A||_max (recorded), and recover accuracy with host-f64 iterative
refinement.  This is the production approach for distributed-memory LU
for exactly the reason it fits XLA: dynamic pivoting cannot be compiled
into a static schedule.  The host engine (tpusparse.numeric.lu) keeps
the reference's full threshold partial pivoting for parity; the BTF
driver (device.lu_tpu) uses dense in-block partial pivoting below the
size threshold and this engine above it.

Structure: with a symmetric pattern, U's row pattern mirrors L's column
pattern, so L column-panels and U row-panels live in MIRRORED pools with
identical layout, and ONE superscan schedule (plan_superscan with
lu_extras=True) drives both sides:

  update (d -> s):  delta_L = L1 @ U0^T   into  Lpool[tgt]
                    delta_U = U1 @ L0^T   into  Upool[tgtu]   (tgtu masks
                    the diagonal block, which delta_L already covers)
  panel:            packed no-pivot LU of the WxW diagonal block
                    (recursive blocked, batched),
  trsm:             L od rows <- X U_D^{-1};   U od rows <- X L_D^{-T}.

Solves run on host f64 against the extracted L/U (the BTF driver's
coupling is host-side anyway), wrapped in iterative refinement.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import add, permute, transpose
from ..core.perm import ipvec, pvec, pinv as _pinv
from .config import HIGHEST
from .superscan import plan_superscan, _IDX

__all__ = ["SuperscanLU"]


# ------------------------------------------------------------- dense kernel
def _lu_nopiv(D: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """Batched packed no-pivot LU of (..., m, m) with tiny-pivot
    perturbation: pivots with |d| < eps are replaced by sign(d)*eps
    (SuperLU_DIST's s_pivotGrowth trick).  Returns L\\U packed (unit
    diagonal of L implied)."""
    m = D.shape[-1]
    if m <= 8:
        r = jnp.arange(m)
        for k in range(m):
            d = D[..., k, k]
            d = jnp.where(jnp.abs(d) < eps,
                          jnp.where(d < 0, -eps, eps), d)
            D = D.at[..., k, k].set(d)
            lcol = jnp.where(r > k, D[..., :, k] / d[..., None], 0.0)
            D = D.at[..., :, k].set(
                jnp.where(r > k, lcol, D[..., :, k]))
            urow = jnp.where(r > k, D[..., k, :], 0.0)
            # rank-1 update touches only rows > k (lcol zeroed) and
            # cols > k (urow zeroed)
            D = D - lcol[..., :, None] * urow[..., None, :]
        return D
    h = m // 2
    A11 = D[..., :h, :h]
    A12 = D[..., :h, h:]
    A21 = D[..., h:, :h]
    A22 = D[..., h:, h:]
    F11 = _lu_nopiv(A11, eps)
    U12 = jax.lax.linalg.triangular_solve(
        F11, A12, left_side=True, lower=True, unit_diagonal=True)
    L21 = jax.lax.linalg.triangular_solve(
        F11, A21, left_side=False, lower=False)
    S = A22 - jnp.einsum("...ik,...kj->...ij", L21, U12,
                         precision=HIGHEST)
    F22 = _lu_nopiv(S, eps)
    top = jnp.concatenate([F11, U12], axis=-1)
    bot = jnp.concatenate([L21, F22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ------------------------------------------------------------------ device
_JIT_CACHE: Dict = {}


def _segment_factor_lu(seg_keys: Tuple) -> callable:
    """LU variant of superscan._segment_factor: two pools (L, U) driven
    by one schedule; ``eps`` is the pivot-perturbation threshold."""

    def run(pools: Dict, xs: Dict, eps: jnp.ndarray):
        def body(pools, x):
            pools = dict(pools)

            def gat(pool, idx, Wd):
                sl = jax.lax.slice_in_dim(pool, 0, Wd, axis=1)
                return jnp.where((idx >= 0)[..., None],
                                 sl[jnp.maximum(idx, 0)], 0.0)

            for key in seg_keys:                    # 1. update phases
                if key[0] not in ("upd", "upds"):
                    continue
                kind, pd, ps, H, Wd, Ws = key
                a = x[key]
                l1 = gat(pools[("L", pd)], a["src"], Wd)
                u0 = gat(pools[("U", pd)], a["l0"], Wd)
                u1 = gat(pools[("U", pd)], a["src"], Wd)
                l0 = gat(pools[("L", pd)], a["l0"], Wd)
                dL = jnp.einsum("uhw,usw->uhs", l1, u0,
                                precision=HIGHEST)
                dU = jnp.einsum("uhw,usw->uhs", u1, l0,
                                precision=HIGHEST)
                dU = jnp.where((a["tgtu"] >= 0)[..., None], dU, 0.0)
                if kind == "upds":
                    rowL = jnp.maximum(a["tgt"], 0)[:, :, None]
                    rowU = jnp.maximum(a["tgtu"], 0)[:, :, None]
                    coli = a["cmap"][:, None, :]
                    bl = jnp.broadcast_to
                    pools[("L", ps)] = pools[("L", ps)].at[
                        bl(rowL, dL.shape), bl(coli, dL.shape)].add(-dL)
                    pools[("U", ps)] = pools[("U", ps)].at[
                        bl(rowU, dU.shape), bl(coli, dU.shape)].add(-dU)
                else:
                    pw = pools[("L", ps)].shape[1]
                    if Ws < pw:
                        pad = ((0, 0), (0, 0), (0, pw - Ws))
                        dL = jnp.pad(dL, pad)
                        dU = jnp.pad(dU, pad)
                    tl = jnp.maximum(a["tgt"], 0).reshape(-1)
                    tu = jnp.maximum(a["tgtu"], 0).reshape(-1)
                    pools[("L", ps)] = pools[("L", ps)].at[tl].add(
                        -dL.reshape(-1, pw))
                    pools[("U", ps)] = pools[("U", ps)].at[tu].add(
                        -dU.reshape(-1, pw))
            for key in seg_keys:                    # 2. diag LU phases
                if key[0] != "chol":
                    continue
                _, pw, W = key
                dbase = x[key]["dbase"]
                idx = dbase[:, None] + jnp.arange(W)[None, :]
                P = jax.lax.slice_in_dim(pools[("L", pw)], 0, W,
                                         axis=1)[idx]
                F = _lu_nopiv(P, eps)
                full = pools[("L", pw)].shape[1]
                if W < full:
                    F = jnp.pad(F, ((0, 0), (0, 0), (0, full - W)))
                pools[("L", pw)] = pools[("L", pw)].at[
                    idx.reshape(-1)].set(F.reshape(-1, full))
            for key in seg_keys:                    # 3. trsm phases
                if key[0] != "trsm":
                    continue
                _, pw, H, W = key
                a = x[key]
                rows, dbs = a["rows"], a["dbase"]
                didx = dbs[:, None] + jnp.arange(W)[None, :]
                slL = jax.lax.slice_in_dim(pools[("L", pw)], 0, W, axis=1)
                slU = jax.lax.slice_in_dim(pools[("U", pw)], 0, W, axis=1)
                Dk = slL[didx]                           # packed L\U
                XL = slL[rows]
                YL = jax.lax.linalg.triangular_solve(
                    Dk, XL, left_side=False, lower=False)   # X U^{-1}
                XU = slU[rows]
                YU = jax.lax.linalg.triangular_solve(
                    Dk, XU, left_side=False, lower=True,
                    transpose_a=True, unit_diagonal=True)   # X L^{-T}
                full = pools[("L", pw)].shape[1]
                if W < full:
                    YL = jnp.pad(YL, ((0, 0), (0, 0), (0, full - W)))
                    YU = jnp.pad(YU, ((0, 0), (0, 0), (0, full - W)))
                pools[("L", pw)] = pools[("L", pw)].at[
                    rows.reshape(-1)].set(YL.reshape(-1, full))
                pools[("U", pw)] = pools[("U", pw)].at[
                    rows.reshape(-1)].set(YU.reshape(-1, full))
            return pools, None

        pools, _ = jax.lax.scan(body, pools, xs)
        return pools

    return run


class SuperscanLU:
    """Static-pivot sparse LU: A(p,p) = L U on the symmetrized-pattern
    Cholesky fill, f32 on device + f64 refined host solves.

    factor() returns False only on a non-finite factor; tiny pivots are
    perturbed (count in .perturbed) and healed by refinement — callers
    should treat a non-converging refinement as singular (lu_tpu does).
    """

    def __init__(self, A: CSCMatrix, order: int = 1, wmax: int = None,
                 tau: float = 0.9, small_w: int = 8,
                 max_segments: int = 10):
        if A.m != A.n:
            raise ValueError("square matrix required")
        self.A = A
        n = A.n
        # symmetrized pattern with guaranteed diagonal
        absA = CSCMatrix(n, n, A.indptr, A.indices, np.abs(A.data))
        S = add(absA, transpose(absA, values=True), 1.0, 1.0)
        eye = CSCMatrix(n, n, np.arange(n + 1, dtype=_IDX),
                        np.arange(n, dtype=_IDX), np.ones(n))
        S = add(S, eye, 1.0, 1.0)
        self.plan = plan_superscan(S, order=order, wmax=wmax, tau=tau,
                                   small_w=small_w,
                                   max_segments=max_segments,
                                   lu_extras=True)
        self._scatter_values()
        self.pools = None
        self.perturbed = 0
        self._LU_host = None

    # ---------------------------------------------------------- planning
    def _scatter_values(self):
        """Scatter the (symmetrically) permuted A into mirrored L/U
        pools: lower+diag-block entries into Lpool, strict-upper od
        entries transposed into Upool."""
        plan = self.plan
        n = plan.n
        piv = _pinv(plan.perm)
        C = permute(self.A, piv, plan.perm, values=True)
        panels = plan.panels
        col2p = np.zeros(n, dtype=_IDX)
        for pl in panels:
            col2p[pl.c0:pl.c0 + pl.w] = pl.pid
        Lp = {pw: np.zeros_like(v) for pw, v in plan.pool_init.items()}
        Up = {pw: np.zeros_like(v) for pw, v in plan.pool_init.items()}
        for pw, v in plan.pool_init.items():
            # identity rows live beyond the real rows; panel width pads
            # are re-created below
            Lp[pw][plan.pool_rows[pw]:] = v[plan.pool_rows[pw]:]
        for pl in panels:                        # width-pad identities
            for t in range(pl.w, pl.W):
                Lp[pl.pool][pl.rbase + t, t] = 1.0
        Cp, Ci, Cx = C.indptr, C.indices, C.data
        cols_of = np.repeat(np.arange(n, dtype=_IDX), np.diff(Cp))
        for lower in (True, False):
            if lower:
                keep = Ci >= cols_of              # into Lpool via col panel
                pidx = col2p[cols_of[keep]]
            else:
                keep = Ci < cols_of               # into D-upper or Upool
                pidx = col2p[Ci[keep]]            # via ROW panel
            ei, ej, ex = Ci[keep], cols_of[keep], Cx[keep]
            o = np.argsort(pidx, kind="stable")
            ei, ej, ex, pidx = ei[o], ej[o], ex[o], pidx[o]
            bounds = np.searchsorted(pidx, np.arange(len(panels) + 1))
            for pl in panels:
                lo, hi = bounds[pl.pid], bounds[pl.pid + 1]
                if lo == hi:
                    continue
                ii, jj, xx = ei[lo:hi], ej[lo:hi], ex[lo:hi]
                if lower:
                    q = np.where(ii < pl.c0 + pl.w, ii - pl.c0,
                                 pl.W + np.searchsorted(pl.rows, ii))
                    Lp[pl.pool][pl.rbase + q, jj - pl.c0] = xx
                else:
                    ind = jj < pl.c0 + pl.w       # D upper part
                    Lp[pl.pool][pl.rbase + (ii[ind] - pl.c0),
                                jj[ind] - pl.c0] = xx[ind]
                    od = ~ind
                    q = pl.W + np.searchsorted(pl.rows, jj[od])
                    Up[pl.pool][pl.rbase + q, ii[od] - pl.c0] = xx[od]
        self._Lp0, self._Up0 = Lp, Up
        self._maxabs = float(np.abs(self.A.data).max()) if \
            self.A.nnz else 1.0

    # ------------------------------------------------------------ factor
    def factor(self) -> bool:
        plan = self.plan
        pools = {}
        for pw in plan.pool_init:
            pools[("L", pw)] = jnp.asarray(self._Lp0[pw])
            pools[("U", pw)] = jnp.asarray(self._Up0[pw])
        eps = jnp.float32(1e-8 * self._maxabs)
        for seg in plan.segments:
            if not seg.xs:
                continue
            keys = tuple(sorted(seg.xs))
            sig = ("lufactor",) + tuple(
                (k,) + tuple(a.shape) for k in keys
                for a in seg.xs[k].values())
            if sig not in _JIT_CACHE:
                _JIT_CACHE[sig] = jax.jit(_segment_factor_lu(keys))
            xs = {k: {nm: jnp.asarray(a) for nm, a in seg.xs[k].items()}
                  for k in keys}
            pools = _JIT_CACHE[sig](pools, xs, eps)
        ok = all(bool(jnp.all(jnp.isfinite(
            v[:plan.pool_rows[pw]])))
            for (_, pw), v in pools.items())
        if ok:
            self.pools = pools
        return ok

    # ------------------------------------------------------------- solve
    def extract_LU(self) -> Tuple[CSCMatrix, CSCMatrix]:
        """Host CSC L (unit diagonal explicit, diag first) and U (diag
        last per column), permuted coordinates."""
        if self.pools is None:
            raise ValueError("factor() first")
        plan = self.plan
        n = plan.n
        from ..core.matrix import COOMatrix
        from .superscan import SuperscanCholesky
        hostL = {pw: SuperscanCholesky._fetch(self.pools[("L", pw)])
                 for pw in plan.pool_init}
        hostU = {pw: SuperscanCholesky._fetch(self.pools[("U", pw)])
                 for pw in plan.pool_init}
        li, lj, lx = [], [], []               # L: unit diag + lower
        ui, uj, ux = [], [], []               # U: upper incl diag
        for pl in plan.panels:
            bL = hostL[pl.pool]
            bU = hostU[pl.pool]
            w = pl.w
            D = bL[pl.rbase:pl.rbase + w, :w]
            # strict-lower of packed D -> L; upper incl diag -> U
            r_lo, c_lo = np.tril_indices(w, -1)
            li.append(pl.c0 + r_lo); lj.append(pl.c0 + c_lo)
            lx.append(D[r_lo, c_lo])
            li.append(pl.c0 + np.arange(w)); lj.append(pl.c0 + np.arange(w))
            lx.append(np.ones(w))
            r_up, c_up = np.triu_indices(w)
            ui.append(pl.c0 + r_up); uj.append(pl.c0 + c_up)
            ux.append(D[r_up, c_up])
            if pl.rows.size:
                od = bL[pl.rbase + pl.W:pl.rbase + pl.W + pl.rows.size, :w]
                rr = np.repeat(pl.rows, w)
                cc = np.tile(pl.c0 + np.arange(w), pl.rows.size)
                li.append(rr); lj.append(cc); lx.append(od.reshape(-1))
                odU = bU[pl.rbase + pl.W:pl.rbase + pl.W + pl.rows.size,
                         :w]
                # Upanel[q, t] = U[c0+t, rows[q]]
                ui.append(np.tile(pl.c0 + np.arange(w), pl.rows.size))
                uj.append(rr); ux.append(odU.reshape(-1))
        L = COOMatrix(n, n, np.concatenate(li), np.concatenate(lj),
                      np.concatenate(lx)).tocsc()
        U = COOMatrix(n, n, np.concatenate(ui), np.concatenate(uj),
                      np.concatenate(ux)).tocsc()
        return L, U

    def _solve_f32(self, b: np.ndarray) -> np.ndarray:
        from ..numeric.trisolve import lsolve, usolve
        if self._LU_host is None:
            self._LU_host = self.extract_LU()
        L, U = self._LU_host
        xp = lsolve(L, pvec(self.plan.perm, np.asarray(b, np.float64)))
        xp = usolve(U, xp)
        if xp is None:
            raise FloatingPointError("singular U")
        return ipvec(self.plan.perm, xp)

    def solve(self, b: np.ndarray, refine_iters: int = 3) -> np.ndarray:
        from .refine import refine
        if self.pools is None and not self.factor():
            raise ValueError("matrix is singular")
        return refine(self.A, self._solve_f32, b, iters=refine_iters)

    def metrics(self):
        from ..utils.profiling import Metrics
        plan = self.plan
        m = Metrics()
        # LU on a symmetric pattern issues ~2x the chol schedule's flops
        m.record(lu_engine="superscan_lu",
                 lu_flops_true=2 * int(plan.flops_true),
                 lu_flops_padded=2 * int(plan.flops_padded),
                 lu_waste_ratio=float(plan.waste_ratio),
                 lu_panels=len(plan.panels),
                 lu_segments=len(plan.segments),
                 lu_levels=int(plan.nlevels),
                 lu_lnz=int(plan.lnz))
        return m
