"""Multi-chip sharded kernels: SpMV, tile-pool Cholesky, and a
distributed CG — jax.sharding/NamedSharding + shard_map over a Mesh, the
TPU-native replacement for the reference's (nonexistent) distributed
backend (SURVEY.md §2.4, §5).

Sharding layout:
- SpMV: ELL row slabs sharded over the mesh axis, x replicated, y
  sharded -> all-gathered.  Row-parallel SpMV needs NO communication for
  the multiply itself; the only collective is the output all-gather.
- Cholesky tile pool: the (T, B, B) pool is replicated and the batched
  TRSM/GEMM op batches are sharded over the mesh axis (each device owns
  a slice of every update batch); XLA inserts the all-reduce-style
  scatter-adds.  This is the "shard the trailing update GEMMs" plan of
  SURVEY.md §7.1 stage 7.
- CG: vectors sharded, dot products via psum over the axis (shard_map).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.matrix import CSCMatrix
from ..device.config import DTYPE, HIGHEST, round_up
from ..device.formats import to_ell

__all__ = ["ShardedSpmv", "sharded_chol_factor",
           "sharded_supernodal_factor", "sharded_supernodal_solve",
           "sharded_superscan_factor", "sharded_superscan_solve",
           "sharded_superscan_lu_factor", "sharded_superscan_lu_solve",
           "sharded_mfqr_factor", "sharded_mfqr_solve",
           "superscan_comm_metrics", "supernodal_comm_metrics",
           "mfqr_comm_metrics", "sharded_cg"]


class ShardedSpmv:
    """Row-sharded SpMV over a 1-D mesh.

    mode='dia' (auto-picked for compact diagonal structure): bands are
    row-sharded, x replicated — zero communication in the multiply, the
    TPU-friendly gather-free path.  mode='ell' otherwise.
    """

    def __init__(self, A: CSCMatrix, mesh: Mesh, axis: str = "d",
                 mode: str = "auto"):
        from ..device.formats import dia_offsets, to_dia

        nd = mesh.devices.size
        self.m, self.n = A.m, A.n
        self.mesh, self.axis = mesh, axis
        row_sh = NamedSharding(mesh, P(axis, None))
        if mode == "auto":
            offs = dia_offsets(A)
            mode = ("dia" if offs.size <= 64
                    and A.nnz / max(offs.size * A.m, 1) > 0.2 else "ell")
        self.mode = mode
        if mode == "dia":
            D = to_dia(A)
            mp = round_up(max(D.m, 1), nd)
            bands = np.zeros((D.offsets.size, mp), dtype=np.float32)
            bands[:, :D.m] = D.bands
            offs = [int(o) for o in D.offsets]
            lo = max(0, -min(offs)) if offs else 0
            hi = max(0, max(offs) + mp - A.n) if offs else 0
            # bands sharded along rows; padded x replicated
            self.bands = jax.device_put(
                jnp.asarray(bands), NamedSharding(mesh, P(None, axis)))
            self.flops = D.flops
            self.bytes_min = D.bytes_min
            m_, n_ = mp, A.n

            @functools.partial(jax.jit,
                               out_shardings=NamedSharding(mesh, P(axis)))
            def _apply(bands, x):
                xp = jnp.pad(x, (lo, hi))
                y = jnp.zeros((m_,), DTYPE)
                for d, off in enumerate(offs):
                    y = y + bands[d] * jax.lax.dynamic_slice(
                        xp, (lo + off,), (m_,))
                return y

            self._apply = _apply
            self._bufs = (self.bands,)
            return
        E = to_ell(A)
        mp = round_up(max(E.m, 1), nd)
        vals = np.zeros((mp, E.K), dtype=np.float32)
        cols = np.zeros((mp, E.K), dtype=np.int32)
        vals[:E.m] = E.vals
        cols[:E.m] = E.cols
        self.vals = jax.device_put(jnp.asarray(vals), row_sh)
        self.cols = jax.device_put(jnp.asarray(cols), row_sh)
        self.flops = E.flops
        self.bytes_min = E.bytes_min

        @functools.partial(jax.jit,
                           out_shardings=NamedSharding(mesh, P(axis)))
        def _apply(vals, cols, x):
            return jnp.sum(vals * x[cols], axis=1)

        self._apply = _apply
        self._bufs = (self.vals, self.cols)

    def apply(self, x) -> jnp.ndarray:
        xr = jax.device_put(jnp.asarray(x, DTYPE),
                            NamedSharding(self.mesh, P()))
        y = self._apply(*self._bufs, xr)
        return y[:self.m]


def sharded_chol_factor(plan, mesh: Mesh, axis: str = "d") -> Callable:
    """Build the tile-pool Cholesky factor with the update batches
    sharded over the mesh (see tpusparse.device.chol_tpu for the
    single-chip version — the schedule is identical, only the batched
    einsum inputs carry shardings so GSPMD partitions the MXU work)."""
    nb = plan.nb
    diag_id = [int(i) for i in plan.diag_id]
    batch_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def pad_batch(x, nd):
        """Pad a batch index list so it divides the mesh; padded entries
        redo the last op into a scratch slot (slot 0 write is masked by
        using a dedicated dump slot at the END of the pool)."""
        if x.size == 0:
            return x
        pad = (-x.size) % nd
        return np.concatenate([x, np.repeat(x[-1:], pad)])

    nd = mesh.devices.size
    off_ids, upd_dst, upd_a, upd_b, upd_w = [], [], [], [], []
    for k in range(nb):
        off_ids.append(jnp.asarray(plan.off_ids[k], jnp.int32))
        d = plan.upd_dst[k]
        a = plan.upd_a[k]
        b = plan.upd_b[k]
        w = np.ones(d.size, np.float32)
        upd_dst.append(jnp.asarray(pad_batch(d, nd), jnp.int32))
        upd_a.append(jnp.asarray(pad_batch(a, nd), jnp.int32))
        upd_b.append(jnp.asarray(pad_batch(b, nd), jnp.int32))
        wpad = np.zeros(upd_dst[-1].shape[0], np.float32)
        wpad[:d.size] = w
        upd_w.append(jnp.asarray(wpad))          # masks duplicate padding

    def factor(pool):
        for k in range(nb):
            dk = pool[diag_id[k]]
            Lkk = jnp.linalg.cholesky(dk)
            pool = pool.at[diag_id[k]].set(Lkk)
            if plan.off_ids[k].size:
                X = pool[off_ids[k]]
                Y = jax.lax.linalg.triangular_solve(
                    jnp.broadcast_to(Lkk, X.shape), X,
                    left_side=False, lower=True, transpose_a=True)
                pool = pool.at[off_ids[k]].set(Y)
                if plan.upd_dst[k].size:
                    La = jax.lax.with_sharding_constraint(
                        Y[upd_a[k]], batch_sh)
                    Lb = jax.lax.with_sharding_constraint(
                        Y[upd_b[k]], batch_sh)
                    delta = jnp.einsum("uij,ukj->uik", La, Lb,
                                       precision=HIGHEST)
                    delta = delta * upd_w[k][:, None, None]
                    pool = pool.at[upd_dst[k]].add(-delta)
        return pool

    return factor


def sharded_supernodal_factor(plan, mesh: Mesh, axis: str = "d") -> Callable:
    """Supernodal factorization with the per-level update batches sharded
    over the mesh: each device computes a slice of every level's direct
    L1 @ L0^T update GEMMs (the dominant MXU work); panel factors stay
    replicated (small).  Same schedule as
    tpusparse.device.supernodal._factor_fn."""
    import jax.numpy as jnp

    from ..device.config import HIGHEST

    batch_sh = NamedSharding(mesh, P(axis))

    def factor(pools):
        pools = dict(pools)
        for lvl in range(plan.nlevels):
            for (db, sb), (ssl, G1, G0, dsl) in \
                    plan.level_updates[lvl].items():
                Rd, Wd = db
                g1 = jnp.asarray(G1.astype(np.int32))
                g0 = jnp.asarray(G0.astype(np.int32))
                dslj = jnp.asarray(dsl.astype(np.int32))
                flat = pools[db].reshape(-1, Wd)
                base = dslj[:, None] * Rd + Wd
                L1 = flat[base + jnp.maximum(g1, 0)]
                L1 = L1 * (g1[:, :, None] >= 0).astype(L1.dtype)
                L0 = flat[base + jnp.maximum(g0, 0)]
                L0 = L0 * (g0[:, :, None] >= 0).astype(L0.dtype)
                if G1.shape[0] >= mesh.devices.size:
                    L1 = jax.lax.with_sharding_constraint(L1, batch_sh)
                    L0 = jax.lax.with_sharding_constraint(L0, batch_sh)
                delta = jnp.einsum("piw,pjw->pij", L1, L0,
                                   precision=HIGHEST)
                pools[sb] = pools[sb].at[jnp.asarray(ssl)].add(-delta)
            for b, slots in plan.level_factor[lvl].items():
                R, W = b
                sl = jnp.asarray(slots)
                Pn = pools[b][sl]
                low = jnp.tril(Pn[:, :W, :])
                top = low + jnp.swapaxes(jnp.tril(Pn[:, :W, :], -1), 1, 2)
                Lkk = jnp.linalg.cholesky(top)
                if R > W:
                    below = Pn[:, W:, :]
                    Y = jax.lax.linalg.triangular_solve(
                        Lkk, below, left_side=False, lower=True,
                        transpose_a=True)
                    Pnew = jnp.concatenate([Lkk, Y], axis=1)
                else:
                    Pnew = Lkk
                pools[b] = pools[b].at[sl].set(Pnew)
        return pools

    return factor


def sharded_supernodal_solve(plan, mesh: Mesh, axis: str = "d") -> Callable:
    """Supernodal L L' solve with the per-level batches sharded over the
    mesh (VERDICT r1 item 7 — the factor was sharded, the solve ran
    replicated).  Layout: xpad replicated; each level's per-bucket panel
    batch (cnt, R, W) and its gathered RHS slices carry a batch-axis
    sharding, so GSPMD splits the batched TRSMs/od-GEMMs across devices
    and all-reduces the scatter-add deltas into the replicated xpad.
    Schedule identical to tpusparse.device.supernodal._solve_fn."""
    n = plan.n
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))
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

    def shard(x, cnt):
        return (jax.lax.with_sharding_constraint(x, batch_sh)
                if cnt >= nd and cnt % nd == 0 else x)

    def solve(pools, xpad):
        for lvl in range(plan.nlevels):
            for b, (slots, cols, odr) in fwd_sched[lvl].items():
                R, W = b
                cnt = slots.size
                Pn = shard(pools[b][jnp.asarray(slots)], cnt)
                Lkk = Pn[:, :W, :]
                xc = shard(xpad[jnp.asarray(cols)], cnt)
                yc = jax.lax.linalg.triangular_solve(
                    Lkk, xc[:, :, None], left_side=True,
                    lower=True)[:, :, 0]
                xpad = xpad.at[jnp.asarray(cols)].set(yc)
                if R > W:
                    delta = jnp.einsum("crw,cw->cr", Pn[:, W:, :], yc,
                                       precision=HIGHEST)
                    xpad = xpad.at[jnp.asarray(odr)].add(-delta)
                    xpad = xpad.at[n].set(0.0)
        for lvl in range(plan.nlevels - 1, -1, -1):
            for b, (slots, cols, odr) in fwd_sched[lvl].items():
                R, W = b
                cnt = slots.size
                Pn = shard(pools[b][jnp.asarray(slots)], cnt)
                Lkk = Pn[:, :W, :]
                acc = shard(xpad[jnp.asarray(cols)], cnt)
                if R > W:
                    xod = shard(xpad[jnp.asarray(odr)], cnt)
                    acc = acc - jnp.einsum("crw,cr->cw", Pn[:, W:, :],
                                           xod, precision=HIGHEST)
                xc = jax.lax.linalg.triangular_solve(
                    Lkk, acc[:, :, None], left_side=True, lower=True,
                    transpose_a=True)[:, :, 0]
                xpad = xpad.at[jnp.asarray(cols)].set(xc)
        return xpad

    return solve


def sharded_superscan_factor(plan, mesh: Mesh, axis: str = "d"):
    """Multi-chip factorization for the scan-ified supernodal engine
    (the flagship): every segment's per-step update-unit batches are
    sharded over the mesh on the unit axis (padded to the mesh size
    with dump units), panels replicated.  Returns factor(pools)."""
    from ..device.superscan import _JIT_CACHE, _segment_factor
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard_fn(xv):
        if xv.shape[0] % nd == 0 and xv.shape[0] >= nd:
            return jax.lax.with_sharding_constraint(xv, batch_sh)
        return xv

    seg_xs = []
    for seg in plan.segments:
        xs = {}
        for k, d in seg.xs.items():
            if k[0] in ("upd", "upds", "updg", "upda"):
                first = next(iter(d.values()))
                U = first.shape[1]
                padu = (-U) % nd
                xs[k] = {
                    nm: np.pad(a, ((0, 0), (0, padu), (0, 0)),
                               constant_values=(0 if nm == "cmap"
                                                else -1))
                    for nm, a in d.items()}
            else:
                xs[k] = d
        seg_xs.append(xs)

    def factor(pools):
        import jax.numpy as jnp2
        for seg, xs in zip(plan.segments, seg_xs):
            if not xs:
                continue
            keys = tuple(sorted(xs))
            sig = ("shfactor", nd, mesh.axis_names,
                   seg.scratch_rows) + tuple(
                (k,) + tuple(a.shape) for k in keys
                for a in xs[k].values())
            if sig not in _JIT_CACHE:
                _JIT_CACHE[sig] = jax.jit(
                    _segment_factor(keys, shard_fn=shard_fn,
                                    scratch_rows=seg.scratch_rows))
            xsd = {k: {nm: jnp2.asarray(a) for nm, a in xs[k].items()}
                   for k in keys}
            pools = _JIT_CACHE[sig](pools, xsd)
        return pools

    return factor


def sharded_superscan_solve(F, mesh: Mesh, axis: str = "d") -> Callable:
    """Device-resident superscan L L' solve with the per-step trsm
    batches sharded over the mesh (VERDICT r2 item 4 — the factor was
    sharded, the solve ran single-chip).  ``F`` is a factored
    SuperscanCholesky; returns solve_f32(b) -> x (one f32 pass, same
    contract as F._solve_f32 — wrap in device.refine for f64 grade).

    Layout: pools and xpad replicated; each trsm phase's (U, H, W) row
    gather carries a batch-axis sharding, so GSPMD splits the od-GEMMs
    across devices and all-reduces the xpad scatter-add deltas over
    ICI.  Diag solves stay replicated (tiny)."""
    from ..core.perm import ipvec, pvec
    from ..device.superscan import (_JIT_CACHE, _pools_sig,
                                    _segment_solve, _solve_xs)
    plan = F.plan
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard_fn(Y):
        if Y.shape[0] % nd == 0 and Y.shape[0] >= nd:
            return jax.lax.with_sharding_constraint(Y, batch_sh)
        return Y

    n = plan.n
    sched = _solve_xs(plan)
    seg_dev = []
    for seg in sched:
        xs = {}
        for k, d in seg.items():
            if k[0] == "trsm":
                U = d["rows"].shape[1]
                padu = (-U) % nd
                # pad slots gather pool row 0 but carry tgt/cols = n,
                # so their contribution is masked to zero
                xs[k] = {
                    "rows": np.pad(d["rows"], ((0, 0), (0, padu),
                                               (0, 0))),
                    "cols": np.pad(d["cols"], ((0, 0), (0, padu),
                                               (0, 0)),
                                   constant_values=n),
                    "tgt": np.pad(d["tgt"], ((0, 0), (0, padu),
                                             (0, 0)),
                                  constant_values=n)}
            else:
                xs[k] = d
        seg_dev.append({k: {nm: jnp.asarray(a)
                            for nm, a in xs[k].items()}
                        for k in sorted(xs)})

    def run(xpad):
        for direction in ("shsolvef", "shsolveb"):
            back = direction == "shsolveb"
            order = (range(len(seg_dev)) if not back
                     else range(len(seg_dev) - 1, -1, -1))
            for si in order:
                keys = tuple(sorted(seg_dev[si]))
                if not keys:
                    continue
                sig = (direction, nd, mesh.axis_names,
                       _pools_sig(F.pools), xpad.shape) + tuple(
                    (k,) + tuple(a.shape) for k in keys
                    for a in seg_dev[si][k].values())
                if sig not in _JIT_CACHE:
                    _JIT_CACHE[sig] = jax.jit(_segment_solve(
                        keys, back, shard_fn=shard_fn))
                xpad = _JIT_CACHE[sig](F.pools, xpad, seg_dev[si])
        return xpad

    def solve_f32(b):
        bp = pvec(plan.perm, np.asarray(b, np.float64))
        xpad = np.zeros(n + 1, dtype=np.float32)
        xpad[:n] = bp
        out = run(jnp.asarray(xpad))
        return ipvec(plan.perm, np.asarray(out, np.float64)[:n])

    return solve_f32


def sharded_superscan_lu_factor(F, mesh: Mesh, axis: str = "d") -> Callable:
    """Multi-chip factorization for the sparse LU engine (superscan_lu):
    every segment's update-unit batches sharded over the mesh on the
    unit axis — BOTH the L-side and U-side GEMMs of each unit split
    (the schedule drives mirrored pools).  Returns factor() -> pools;
    assign to F.pools and use F's device-resident solves as usual."""
    import jax.numpy as jnp2

    from ..device.superscan_lu import _JIT_CACHE, _segment_factor_lu
    from ..device.superscan import _pools_sig
    plan = F.plan
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard_fn(xv):
        if xv.shape[0] % nd == 0 and xv.shape[0] >= nd:
            return jax.lax.with_sharding_constraint(xv, batch_sh)
        return xv

    seg_xs = []
    for seg in plan.segments:
        xs = {}
        for k, d in seg.xs.items():
            if k[0] in ("upd", "upds"):
                first = next(iter(d.values()))
                padu = (-first.shape[1]) % nd
                xs[k] = {nm: np.pad(a, ((0, 0), (0, padu), (0, 0)),
                                    constant_values=(0 if nm == "cmap"
                                                     else -1))
                         for nm, a in d.items()}
            else:
                xs[k] = d
        seg_xs.append(xs)

    def factor():
        pools = {}
        for pw in plan.pool_init:
            pools[("L", pw)] = jnp2.asarray(F._Lp0[pw])
            pools[("U", pw)] = jnp2.asarray(F._Up0[pw])
        eps = jnp2.float32(1e-8 * F._maxabs)
        for xs in seg_xs:
            if not xs:
                continue
            keys = tuple(sorted(xs))
            sig = ("shlufactor", nd, mesh.axis_names, F.tol,
                   _pools_sig(pools)) + tuple(
                (k,) + tuple(a.shape) for k in keys
                for a in xs[k].values())
            if sig not in _JIT_CACHE:
                _JIT_CACHE[sig] = jax.jit(_segment_factor_lu(
                    keys, F.tol, shard_fn=shard_fn))
            xsd = {k: {nm: jnp2.asarray(a) for nm, a in xs[k].items()}
                   for k in keys}
            pools = _JIT_CACHE[sig](pools, xsd, eps)
        return pools

    return factor


def sharded_superscan_lu_solve(F, mesh: Mesh, axis: str = "d") -> Callable:
    """Device-resident LU forward/backward solve with the per-step trsm
    batches sharded over the mesh — the LU twin of
    sharded_superscan_solve (reference contract: cs_lusol.c
    factor-once/solve-many).  ``F`` is a factored SuperscanLU; returns
    solve_f32(b) -> x (one f32 pass — wrap in device.refine for f64
    grade)."""
    from ..core.perm import ipvec, pvec
    from ..device.superscan import _pools_sig, _solve_xs
    from ..device.superscan_lu import _JIT_CACHE, _segment_solve_lu
    plan = F.plan
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard_fn(Y):
        if Y.shape[0] % nd == 0 and Y.shape[0] >= nd:
            return jax.lax.with_sharding_constraint(Y, batch_sh)
        return Y

    n = plan.n
    sched = _solve_xs(plan)
    seg_dev = []
    for seg in sched:
        xs = {}
        for k, d in seg.items():
            if k[0] == "trsm":
                U = d["rows"].shape[1]
                padu = (-U) % nd
                # pad slots gather pool row 0 but carry tgt/cols = n,
                # so their contribution is masked to zero
                xs[k] = {
                    "rows": np.pad(d["rows"], ((0, 0), (0, padu),
                                               (0, 0))),
                    "cols": np.pad(d["cols"], ((0, 0), (0, padu),
                                               (0, 0)),
                                   constant_values=n),
                    "tgt": np.pad(d["tgt"], ((0, 0), (0, padu),
                                             (0, 0)),
                                  constant_values=n)}
            else:
                xs[k] = d
        seg_dev.append({k: {nm: jnp.asarray(a)
                            for nm, a in xs[k].items()}
                        for k in sorted(xs)})

    def run(xpad):
        for direction in ("shlusolvef", "shlusolveb"):
            back = direction == "shlusolveb"
            order = (range(len(seg_dev)) if not back
                     else range(len(seg_dev) - 1, -1, -1))
            for si in order:
                keys = tuple(sorted(seg_dev[si]))
                if not keys:
                    continue
                sig = (direction, nd, mesh.axis_names,
                       _pools_sig(F.pools), xpad.shape) + tuple(
                    (k,) + tuple(a.shape) for k in keys
                    for a in seg_dev[si][k].values())
                if sig not in _JIT_CACHE:
                    _JIT_CACHE[sig] = jax.jit(_segment_solve_lu(
                        keys, back, shard_fn=shard_fn))
                xpad = _JIT_CACHE[sig](F.pools, xpad, seg_dev[si])
        return xpad

    def solve_f32(b):
        b = np.asarray(b, np.float64)
        if F._match_p is not None:
            b = b[F._match_p]
        bp = pvec(plan.perm, b)
        xpad = np.zeros(n + 1, dtype=np.float32)
        xpad[:n] = bp
        out = run(jnp.asarray(xpad))
        return ipvec(plan.perm, np.asarray(out, np.float64)[:n])

    return solve_f32


def superscan_comm_metrics(plan, n_devices: int, lu: bool = False) -> dict:
    """Structural ICI model for the sharded superscan factor AND solve:
    phases whose batches shard (U >= mesh after padding) all-reduce
    their scatter-add deltas — factor bytes = 4 * steps * U * H *
    pool_width per update phase (x2 for lu=True: the dL and dU deltas
    of the mirrored pools each all-reduce); solve bytes = 4 * steps *
    U * (H + W) per trsm phase (forward od-delta + backward
    col-delta, same volume for chol and LU)."""
    nd = max(int(n_devices), 1)
    comm_f = 0
    comm_s = 0
    flops = int(plan.flops_padded)
    for seg in plan.segments:
        steps = seg.hi - seg.lo
        for k, d in seg.xs.items():
            if k[0] in ("upd", "upds"):
                U = d["src"].shape[1]
                H = d["src"].shape[2]
                pw = k[2]
                if U + ((-U) % nd) >= nd and U >= 1:
                    comm_f += (2 if lu else 1) * \
                        4 * steps * (U + ((-U) % nd)) * H * pw
            elif k[0] == "trsm":
                _, pw, H, W = k
                U = d["rows"].shape[1]
                Upad = U + ((-U) % nd)
                if Upad >= nd and U >= 1:
                    comm_s += 4 * steps * Upad * (H + W)
    comm = comm_f + comm_s
    return {"mesh_devices": nd,
            "comm_bytes_factor": int(comm_f),
            "comm_bytes_solve": int(comm_s),
            "comm_bytes_total": int(comm),
            "compute_flops_issued": flops,
            "comm_bytes_per_flop": comm / max(flops, 1),
            "segments": len(plan.segments)}


def sharded_mfqr_factor(F, mesh: Mesh, axis: str = "d") -> Callable:
    """Multifrontal Householder QR factor on the mesh (reference
    semantics: cs_qr on a multi-chip mesh): per-level front batches of
    the vmapped blocked QR and the contribution-assembly gathers carry
    a batch-axis sharding; pools stay replicated, so GSPMD all-reduces
    the scatter-add deltas.  Returns factor(pools, taus) -> (pools,
    taus), jit-able as one program."""
    from ..device.mfqr import _front_qr
    sched, plan = F._sched, F.plan
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard(x, cnt):
        return (jax.lax.with_sharding_constraint(x, batch_sh)
                if cnt >= nd and cnt % nd == 0 else x)

    def factor(pools, taus):
        pools = dict(pools)
        taus = dict(taus)
        ai = fi = 0
        for lvl in range(plan.nlevels):
            while (ai < len(sched.assemble)
                   and sched.assemble[ai][0] == lvl):
                _, cb, pb, psl, csl, RM, CM = sched.assemble[ai]
                ai += 1
                Pn = int(psl.shape[0])
                Rhc, Chc = cb
                Rhp, Chp = pb
                flat = pools[cb].reshape(-1, Chc)
                rows = flat[csl[:, None] * Rhc + jnp.maximum(RM, 0)]
                rows = shard(rows, Pn)
                cmb = jnp.broadcast_to(jnp.maximum(CM, 0)[:, None, :],
                                       (Pn, Rhp, Chp))
                vals = jnp.take_along_axis(rows, cmb, axis=2)
                mask = ((RM >= 0)[:, :, None] & (CM >= 0)[:, None, :]
                        & (jnp.maximum(CM, 0)[:, None, :]
                           >= jnp.maximum(RM, 0)[:, :, None]))
                pools[pb] = pools[pb].at[psl].add(
                    vals * mask.astype(vals.dtype))
            while fi < len(sched.factor) and sched.factor[fi][0] == lvl:
                _, b, kelim, sl = sched.factor[fi]
                fi += 1
                cnt = int(sl.shape[0])
                Mb = shard(pools[b][sl], cnt)
                Tb = shard(taus[b][sl], cnt)
                fn = jax.vmap(
                    lambda Mx, tx, ke=kelim: _front_qr(Mx, tx, ke))
                Mb, Tb = fn(Mb, Tb)
                pools[b] = pools[b].at[sl].set(Mb)
                taus[b] = taus[b].at[sl].set(Tb)
        return pools, taus

    return factor


def sharded_mfqr_solve(F, mesh: Mesh, axis: str = "d") -> Callable:
    """One jitted sharded LS pass x_q = R^{-1} (Q'b)[:n]: the Q'
    traversal's batched WY applications and the R back-substitution
    batches carry the mesh sharding (cs_qrsol's solve phase on the
    mesh).  Returns a host-callable f32 solve for QR refinement."""
    from ..device.mfqr import _front_qt
    sched, plan = F._sched, F.plan
    nd = mesh.devices.size
    batch_sh = NamedSharding(mesh, P(axis))

    def shard(x, cnt):
        return (jax.lax.with_sharding_constraint(x, batch_sh)
                if cnt >= nd and cnt % nd == 0 else x)

    io_by_lvl: dict = {}
    for item in sched.io:
        io_by_lvl.setdefault(item[0], []).append(item)
    asm_by_lvl: dict = {}
    for item in sched.assemble:
        asm_by_lvl.setdefault(item[0], []).append(item)

    def run(bpad, pools, taus):
        ypad = jnp.zeros(plan.ysize + 1, jnp.float32)
        if sched.pass_rows is not None:
            ypad = ypad.at[sched.pass_slots].set(bpad[sched.pass_rows])
        z = {b: jnp.zeros((plan.bucket_count[b], b[0]), jnp.float32)
             for b in plan.buckets}
        from ..device.mfqr import _gather1d
        for lvl in range(plan.nlevels):
            for _, b, kelim, sl, bi, om in io_by_lvl.get(lvl, []):
                vals = _gather1d(
                    bpad, jnp.minimum(jnp.maximum(bi, 0), plan.m))
                vals = vals * (bi >= 0).astype(vals.dtype)
                z[b] = z[b].at[sl].set(vals)
            for _, cb, pb, psl, csl, RM, _CM in asm_by_lvl.get(lvl, []):
                rows = z[cb][csl]
                # one-hot GEMM (see device.mfqr._k_qt_contrib: lane
                # gathers crash the axon TPU fusion emitter here)
                oh = (jnp.maximum(RM, 0)[:, :, None]
                      == jnp.arange(rows.shape[1])[None, None, :]
                      ).astype(rows.dtype)
                vals = jnp.einsum("prc,pc->pr", oh, rows,
                                  precision=HIGHEST)
                vals = vals * (RM >= 0).astype(vals.dtype)
                z[pb] = z[pb].at[psl].add(vals)
            for _, b, kelim, sl, bi, om in io_by_lvl.get(lvl, []):
                cnt = int(sl.shape[0])
                zb = _front_qt(shard(pools[b][sl], cnt),
                               shard(taus[b][sl], cnt),
                               shard(z[b][sl], cnt), kelim)
                z[b] = z[b].at[sl].set(zb)
                ypad = ypad.at[om].set(zb)
        y = ypad[:plan.n]
        xpad = jnp.zeros(plan.n + 1, jnp.float32)
        for lvl, b, sl, cj, od, wv in reversed(sched.rsolve):
            cnt = int(sl.shape[0])
            Pm = shard(pools[b][sl], cnt)
            WB = cj.shape[1]
            piv = jnp.arange(WB)[None, :] < wv[:, None]
            RJJ = jnp.triu(Pm[:, :WB, :WB])
            RJJ = jnp.where(piv[:, :, None], RJJ,
                            jnp.eye(WB, dtype=Pm.dtype)[None])
            rhs = y[jnp.minimum(cj, plan.n - 1)]
            if Pm.shape[2] > WB:
                from ..device.mfqr import _gather1d as _g1
                xod = _g1(xpad, od)
                rhs = rhs - jnp.einsum("pwc,pc->pw", Pm[:, :WB, WB:],
                                       xod, precision=HIGHEST)
            rhs = jnp.where(piv, rhs, xpad[cj])
            xJ = jax.lax.linalg.triangular_solve(
                RJJ, rhs[:, :, None], left_side=True,
                lower=False)[:, :, 0]
            xpad = xpad.at[cj].set(xJ)
        return xpad[:plan.n]

    runj = jax.jit(run)

    def solve_f32(b):
        bpad = np.zeros(plan.m + 1, np.float32)
        bpad[:plan.m] = b
        xq = np.asarray(runj(jnp.asarray(bpad), F.pools, F.taus),
                        np.float64)
        x = np.zeros(plan.n)
        x[plan.q] = xq
        return x

    return solve_f32


def mfqr_comm_metrics(plan, n_devices: int) -> dict:
    """STRUCTURAL ICI accounting for the sharded multifrontal QR
    (same model as supernodal_comm_metrics): dispatch batches that are
    sharded (padded count >= mesh and divisible) scatter-add into
    replicated buffers — all-reduced bytes = 4 * written elements."""
    from ..device.mfqr import _gbatch
    nd = max(int(n_devices), 1)
    fb = sb = 0
    for lvl in range(plan.nlevels):
        for (cb, pb), (psl, *_r) in plan.level_assemble[lvl].items():
            Pn = _gbatch(len(psl))
            if Pn >= nd and Pn % nd == 0:
                fb += 4 * Pn * pb[0] * pb[1]    # assembled front deltas
        for b, slots in plan.level_factor[lvl].items():
            cnt = _gbatch(len(slots))
            if cnt >= nd and cnt % nd == 0:
                fb += 4 * cnt * b[0] * b[1]     # factored panel writeback
                sb += 4 * cnt * b[0]            # Q'z writeback
        for b, items in plan.level_rsolve[lvl].items():
            cnt = _gbatch(len(items[0]))
            if cnt >= nd and cnt % nd == 0:
                sb += 4 * cnt * items[1].shape[1]   # xJ writes
    return {
        "mesh_devices": nd,
        "comm_bytes_factor": int(fb),
        "comm_bytes_solve": int(sb),
        "comm_bytes_total": int(fb + sb),
        "compute_flops_issued": int(plan.flops_padded),
        "comm_bytes_per_flop": (fb + sb) / max(plan.flops_padded, 1),
        "levels": plan.nlevels,
    }


def supernodal_comm_metrics(plan, n_devices: int) -> dict:
    """STRUCTURAL communication accounting for the sharded supernodal
    factor+solve (no wall-clock: axon timing is non-physical — this is
    the bytes-on-ICI model the VERDICT asked for).

    Model: batches with cnt >= n_devices are sharded on the batch axis;
    their scatter-add deltas into replicated buffers are all-reduced —
    comm bytes = 4 * delta elements.  Batches smaller than the mesh are
    computed replicated (no comm).  Returns totals, per-level volumes,
    and the comm-bytes / compute-flop ratio."""
    nd = max(int(n_devices), 1)
    per_level_factor = []
    per_level_solve = []
    for lvl in range(plan.nlevels):
        fb = 0
        for (db, sb), (ssl, G1, G0, dsl) in plan.level_updates[lvl].items():
            Pn = len(ssl)
            Rs, Ws = sb
            if Pn >= nd:
                fb += 4 * Pn * Rs * Ws          # all-reduced update deltas
        sb_ = 0
        for b, slots in plan.level_factor[lvl].items():
            R, W = b
            cnt = slots.size
            if cnt >= nd:
                sb_ += 4 * cnt * (R - W)        # fwd od-delta all-reduce
                sb_ += 4 * cnt * W              # bwd col writes
        per_level_factor.append(int(fb))
        per_level_solve.append(int(sb_))
    comm = int(sum(per_level_factor) + sum(per_level_solve))
    flops = int(plan.flops_padded)
    return {
        "mesh_devices": nd,
        "comm_bytes_factor": int(sum(per_level_factor)),
        "comm_bytes_solve": int(sum(per_level_solve)),
        "comm_bytes_total": comm,
        "compute_flops_issued": flops,
        "comm_bytes_per_flop": comm / max(flops, 1),
        "comm_bytes_per_level_max": int(max(
            (f + s_ for f, s_ in zip(per_level_factor,
                                     per_level_solve)), default=0)),
        "levels": plan.nlevels,
    }


def sharded_cg(A: CSCMatrix, mesh: Mesh, axis: str = "d",
               tol: float = 1e-6, maxiter: int = 200):
    """Distributed conjugate gradient for SPD A: vectors sharded over the
    mesh, reductions via jax.lax.psum inside shard_map — the collective
    pattern (psum over ICI) the reference never needed but a multi-chip
    solver does.

    Returns solve(b) -> (x, iters, relres).
    """
    nd = mesh.devices.size
    E = to_ell(A)
    n = A.n
    npad = round_up(max(n, 1), nd)
    vals = np.zeros((npad, E.K), dtype=np.float32)
    cols = np.zeros((npad, E.K), dtype=np.int32)
    vals[:E.m] = E.vals
    cols[:E.m] = E.cols
    vals_d = jax.device_put(jnp.asarray(vals),
                            NamedSharding(mesh, P(axis, None)))
    cols_d = jax.device_put(jnp.asarray(cols),
                            NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis), P(), P()),
        check_vma=False)
    def _cg(vals_l, cols_l, b_l):
        # local shard of the matrix rows + local shard of b
        def matvec(p_full):
            return jnp.sum(vals_l * p_full[cols_l], axis=1)

        def allgather(v_l):
            return jax.lax.all_gather(v_l, axis).reshape(-1)

        x_l = jnp.zeros_like(b_l)
        r_l = b_l
        p_l = r_l
        rs = jax.lax.psum(jnp.vdot(r_l, r_l), axis)
        b2 = jax.lax.psum(jnp.vdot(b_l, b_l), axis)

        def body(state):
            x_l, r_l, p_l, rs, it = state
            p_full = allgather(p_l)
            Ap_l = matvec(p_full)
            pAp = jax.lax.psum(jnp.vdot(p_l, Ap_l), axis)
            alpha = rs / pAp
            x_l = x_l + alpha * p_l
            r_l = r_l - alpha * Ap_l
            rs_new = jax.lax.psum(jnp.vdot(r_l, r_l), axis)
            p_l = r_l + (rs_new / rs) * p_l
            return x_l, r_l, p_l, rs_new, it + 1

        def cond(state):
            _, _, _, rs, it = state
            return jnp.logical_and(rs > tol * tol * b2, it < maxiter)

        x_l, r_l, _, rs, it = jax.lax.while_loop(
            cond, body, (x_l, r_l, p_l, rs, jnp.int32(0)))
        relres = jnp.sqrt(rs / jnp.maximum(b2, 1e-30))
        return x_l, it, relres

    _cg_jit = jax.jit(_cg)

    def solve(b):
        bp = np.zeros(npad, dtype=np.float32)
        bp[:n] = np.asarray(b, np.float64)
        b_d = jax.device_put(jnp.asarray(bp), NamedSharding(mesh, P(axis)))
        x, it, relres = _cg_jit(vals_d, cols_d, b_d)
        return np.asarray(x, np.float64)[:n], int(it), float(relres)

    return solve
