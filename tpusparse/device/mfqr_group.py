"""Grouped runtime-schedule dispatch for the multifrontal QR.

The bucket-keyed dispatch in ``device.mfqr`` compiles one program per
(kernel family, bucket shape, batch size) — and the contribution
assembly one per (child bucket, parent bucket, batch) PAIR.  Measured
at LS n=16,384 that is 2,135 programs for 6,073 dispatches (235
distinct shape pairs); at n=65,536 the unclustered menu compiled 3,637
programs and a 19-minute prewarm wall (VERDICT r3 item 1).  This module
is the superscan-style redesign: the compiled-program count is ONE per
(kernel family, bucket shape), independent of etree levels, batch
sizes, and child/parent shape pairs.

Two ideas, mirroring ``device.superscan``'s runtime-array schedules
(reference semantics unchanged: cs_qr.c / cs_happly.c / cs_qrsol.c):

1. **Flat transport buffers kill the shape-pair axis.**  Child
   contribution blocks are never assembled pool-to-pool.  The factor
   kernel extracts each front's contribution trapezoid (rows w..kstar
   of its dense R) into a flat f32 buffer ``cbuf``, with the slab laid
   out in the PARENT's column coordinates (slab row length = parent's
   padded Ch, columns placed by a host-precomputed child-col ->
   parent-col-position map).  The parent's factor kernel then gathers
   its contribution rows as ``cbuf[rowbase[r] + c]`` — an index map
   linear in c, so the program never sees the child's shape.  The Q'/Q
   passes route vector contributions through a flat ``zvbuf`` the same
   way (one cell per contribution row).

2. **Stacked schedules + runtime spans kill the batch axis.**  Per
   bucket shape, every (level, batch) dispatch is split into fixed-size
   groups of G fronts (G chosen per shape to bound issue padding) and
   all groups are stacked into single device-resident schedule arrays.
   A launch passes runtime int32 (base, nsteps) and the kernel
   ``lax.fori_loop``s over its span, dynamic-slicing one group per
   step.  The program signature depends only on the stacked array
   shapes — every level of a shape reuses one compiled program.

Axon TPU fusion-emitter constraints honoured throughout (root-caused on
hardware, see device.mfqr): 1-D-operand gathers chunked to <= 64 minor
lanes; row gathers via flat-2D row indexing; no element scatters into
pools (scatters go to flat 1-D buffers, the proven ypad/outmap class).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .mfqr import (MfqrPlan, _front_q, _front_qr, _front_qt, _gather1d,
                   _gbatch)
from .config import HIGHEST

__all__ = ["GroupSched", "build_group_sched"]

_I32 = np.int32


def _pick_group(batches: List[int]) -> int:
    """Group size for one shape: the largest _gbatch ladder value whose
    total issued slots stay within 15% of the no-padding optimum
    (bigger groups = fewer while-loop steps = less dispatch latency;
    the cap bounds the padding the fixed group width injects)."""
    if not batches:
        return 1
    floor = sum(batches)
    best = 1
    g = 1
    while g <= max(batches):
        g = _gbatch(g)
        issued = sum(-(-b // g) * g for b in batches)
        if issued <= 1.15 * floor:
            best = g
        g += 1
    return best


def _gather_span(vec, base2d, C: int):
    """vec[base2d[:, :, None] + arange(C)] with the minor axis chunked
    to <= 64 lanes (axon kSublaneGather guard).  Caller masks validity;
    indices are clipped here."""
    hi = vec.shape[0] - 1
    parts = []
    for k in range(0, C, 64):
        w = min(64, C - k)
        idx = base2d[:, :, None] + (k + jnp.arange(w, dtype=jnp.int32))
        parts.append(vec[jnp.clip(idx, 0, hi)])
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]


@dataclass
class _ShapeSched:
    """Stacked grouped schedules for one bucket shape."""
    b: Tuple[int, int]
    G: int
    # factor: (S,G) slots / (S,G,Rh) rowsrc / (S,G) sbase,stride,cr,w /
    # (S,G,Ch) cmpos
    slots: np.ndarray = None
    rowsrc: np.ndarray = None
    sbase: np.ndarray = None
    stride: np.ndarray = None
    crv: np.ndarray = None
    wv: np.ndarray = None
    cmpos: np.ndarray = None
    # qt/q: (S,G,Rh) each
    bidx: np.ndarray = None
    zrow: np.ndarray = None      # my rows -> children's zvbuf slab cells
    zself: np.ndarray = None     # my rows w..w+cr -> my zvbuf slab cells
    outmap: np.ndarray = None
    # rsolve: (S,G,WB) cj / (S,G,Ch-WB) od / (S,G) rwv / (S,G) rslots
    rslots: np.ndarray = None
    cj: np.ndarray = None
    od: np.ndarray = None
    rwv: np.ndarray = None
    spans: Dict[int, Tuple[int, int]] = field(default_factory=dict)
    dev: Dict[str, jnp.ndarray] = field(default_factory=dict)


class GroupSched:
    """Grouped dispatch schedule for an MfqrPlan: per-shape stacked
    arrays + per-(level, shape) spans, plus flat-buffer sizes."""

    def __init__(self, plan: MfqrPlan):
        self.plan = plan
        self.shapes: Dict[Tuple[int, int], _ShapeSched] = {}
        self.cbuf_size = 0
        self.zbuf_size = 0
        self.flops_issued = 0
        self._build()

    # ------------------------------------------------------------ build
    def _build(self):
        plan = self.plan
        fronts = plan.fronts
        n = plan.n

        # flat slab allocation: fronts with cr > 0 get a matrix slab of
        # cr x Chp (parent's padded col width) in cbuf and cr cells in
        # zvbuf.  Layout order: front sid (topological).
        sbase = np.full(len(fronts), -1, np.int64)
        zbase = np.full(len(fronts), -1, np.int64)
        coff = zoff = 0
        parent_of = np.full(len(fronts), -1, np.int64)
        for f in fronts:
            if f.cr > 0 and f.od.size:
                pf = int(plan.col2sn[f.od[0]])
                parent_of[f.sid] = pf
                chp = fronts[pf].bucket[1]
                sbase[f.sid] = coff
                zbase[f.sid] = zoff
                coff += f.cr * chp
                zoff += f.cr
        self.cbuf_size = int(coff)
        self.zbuf_size = int(zoff)

        # group structure shared by all families: per (shape, level)
        by_shape: Dict[Tuple[int, int], Dict[int, List]] = {}
        for f in fronts:
            by_shape.setdefault(f.bucket, {}).setdefault(
                f.level, []).append(f)

        issued = 0
        for b, by_lvl in sorted(by_shape.items()):
            Rh, Ch = b
            KE = min(Rh, Ch)
            WB = min(Rh, Ch, 64)
            # match the bucket engine's R-solve block width (>= max w)
            wmaxb = max(f.w for fl in by_lvl.values() for f in fl)
            WB = min(Rh, Ch, max(64, wmaxb))
            G = _pick_group([len(v) for v in by_lvl.values()])
            ss = _ShapeSched(b=b, G=G)
            groups: List[List] = []       # each: list of fronts, <= G
            for lvl in sorted(by_lvl):
                fl = by_lvl[lvl]
                base = len(groups)
                for k in range(0, len(fl), G):
                    groups.append(fl[k:k + G])
                ss.spans[lvl] = (base, len(groups) - base)
            S = len(groups)
            issued += S * G * (4.0 * (KE * Rh * Ch
                                      - (Rh + Ch) * KE * (KE - 1) / 2.0
                                      + (KE - 1) * KE * (2 * KE - 1) / 6))
            slots = np.zeros((S, G), _I32)
            rowsrc = np.full((S, G, Rh), self.cbuf_size + 1, _I32)
            sb = np.zeros((S, G), _I32)
            st = np.zeros((S, G), _I32)
            crv = np.zeros((S, G), _I32)
            wv = np.zeros((S, G), _I32)
            cmpos = np.full((S, G, Ch), -1, _I32)   # -1 = not a real
            #     child column (pivot cols and col padding): masked out
            bidx = np.full((S, G, Rh), -1, _I32)
            zrow = np.full((S, G, Rh), self.zbuf_size + 1, _I32)
            zself = np.full((S, G, Rh), self.zbuf_size + 1, _I32)
            outmap = np.full((S, G, Rh), plan.ysize, _I32)
            rslots = np.zeros((S, G), _I32)
            cj = np.full((S, G, WB), n, _I32)
            odx = np.full((S, G, max(Ch - WB, 0)), n, _I32)
            rwv = np.zeros((S, G), _I32)
            for gi, grp in enumerate(groups):
                for p in range(G):
                    f = grp[min(p, len(grp) - 1)]   # repeat-pad (.set
                    #                      of identical values is safe)
                    slots[gi, p] = f.slot
                    crv[gi, p] = f.cr
                    wv[gi, p] = f.w
                    # --- factor: contribution gathers from children
                    for c in f.children:
                        fc = fronts[c]
                        if fc.cr <= 0:
                            continue
                        r0 = f.child_base[c]
                        rowsrc[gi, p, r0:r0 + fc.cr] = (
                            sbase[c] + np.arange(fc.cr) * Ch)
                        zrow[gi, p, r0:r0 + fc.cr] = (
                            zbase[c] + np.arange(fc.cr))
                    # --- factor: own slab extract (child side)
                    if sbase[f.sid] >= 0:
                        pf = fronts[parent_of[f.sid]]
                        sb[gi, p] = sbase[f.sid]
                        st[gi, p] = pf.bucket[1]
                        # child col j (w..ncol) -> parent col position
                        gcols = f.od
                        pos = np.full(gcols.size, -1, np.int64)
                        piv = ((gcols >= pf.c0)
                               & (gcols < pf.c0 + pf.w))
                        pos[piv] = gcols[piv] - pf.c0
                        loc = np.searchsorted(pf.od, gcols[~piv])
                        pos[~piv] = pf.w + loc
                        cmpos[gi, p, f.w:f.w + gcols.size] = pos
                        zself[gi, p, f.w:f.w + f.cr] = (
                            zbase[f.sid] + np.arange(f.cr))
                    # --- io maps (same content as the bucket engine)
                    bidx[gi, p, :len(f.rows_a)] = f.rows_a
                    om = np.full(Rh, plan.ysize, np.int64)
                    om[:f.w] = np.arange(f.c0, f.c0 + f.w)
                    ncm = f.nrow_real - f.kstar
                    if ncm > 0:
                        om[f.kstar:f.nrow_real] = (
                            f.comp_off + np.arange(ncm))
                    outmap[gi, p] = om
                    # --- R/R' solve maps (dump-pad: repeated fronts
                    # would double .add od updates in the R' solve, so
                    # pads point at the trash column instead)
                    if p < len(grp):
                        rslots[gi, p] = f.slot
                        rwv[gi, p] = f.w
                        cj[gi, p, :f.w] = np.arange(f.c0, f.c0 + f.w)
                        lead = min(WB - f.w, f.od.size)
                        cj[gi, p, f.w:f.w + lead] = f.od[:lead]
                        rest = (f.od[WB - f.w:]
                                if f.od.size > WB - f.w else f.od[:0])
                        odx[gi, p, :rest.size] = rest
            ss.slots, ss.rowsrc, ss.sbase, ss.stride = slots, rowsrc, sb, st
            ss.crv, ss.wv, ss.cmpos = crv, wv, cmpos
            ss.bidx, ss.zrow, ss.zself, ss.outmap = bidx, zrow, zself, outmap
            ss.rslots, ss.cj, ss.od, ss.rwv = rslots, cj, odx, rwv
            self.shapes[b] = ss
        self.flops_issued = int(issued)

    # ---------------------------------------------------------- device
    def upload(self):
        """Move every stacked schedule to the device once."""
        for ss in self.shapes.values():
            if ss.dev:
                continue
            for name in ("slots", "rowsrc", "sbase", "stride", "crv",
                         "wv", "cmpos", "bidx", "zrow", "zself",
                         "outmap", "rslots", "cj", "od", "rwv"):
                ss.dev[name] = jnp.asarray(getattr(ss, name))

    def levels_of(self, b) -> List[int]:
        return sorted(self.shapes[b].spans)


# ----------------------------------------------------------- kernels
# One jitted program per (family, shape): all arrays below are the
# full stacked schedules; (base, nsteps) are runtime int32 scalars.

def gk_factor(pool, taus, cbuf, slots, rowsrc, sbase, stride, crv, wv,
              cmpos, base, nsteps, kelim):
    G, Rh, Ch = slots.shape[1], pool.shape[1], pool.shape[2]
    KE = min(Rh, Ch)
    CB = cbuf.shape[0] - 1

    def body(s, carry):
        pool, taus, cbuf = carry
        k = base + s
        sl = lax.dynamic_index_in_dim(slots, k, 0, False)
        rs_ = lax.dynamic_index_in_dim(rowsrc, k, 0, False)
        sb = lax.dynamic_index_in_dim(sbase, k, 0, False)
        st = lax.dynamic_index_in_dim(stride, k, 0, False)
        cr = lax.dynamic_index_in_dim(crv, k, 0, False)
        w = lax.dynamic_index_in_dim(wv, k, 0, False)
        cp = lax.dynamic_index_in_dim(cmpos, k, 0, False)
        M = pool[sl]
        ok = (rs_ <= CB)[:, :, None]
        contrib = _gather_span(cbuf, jnp.minimum(rs_, CB), Ch)
        M = M + contrib * ok.astype(M.dtype)
        Mb, tb = jax.vmap(lambda Mx, tx: _front_qr(Mx, tx, kelim))(
            M, taus[sl])
        pool = pool.at[sl].set(Mb)
        taus = taus.at[sl].set(tb)
        # extract contribution trapezoid into the parent-coord slab
        flat = Mb.reshape(G * Rh, Ch)
        ii = jnp.arange(KE, dtype=jnp.int32)
        ridx = (jnp.arange(G, dtype=jnp.int32)[:, None] * Rh
                + jnp.clip(w[:, None] + ii[None, :], 0, Rh - 1))
        rows = flat[ridx]                                # (G, KE, Ch)
        jj = jnp.arange(Ch, dtype=jnp.int32)
        mask = ((ii[None, :, None] < cr[:, None, None])
                & (jj[None, None, :]
                   >= w[:, None, None] + ii[None, :, None])
                & (cp >= 0)[:, None, :])
        idx = (sb[:, None, None]
               + ii[None, :, None] * st[:, None, None]
               + cp[:, None, :])
        idx = jnp.where(mask, idx, CB)
        cbuf = cbuf.at[idx.reshape(G, KE * Ch)].set(
            (rows * mask.astype(rows.dtype)).reshape(G, KE * Ch))
        return pool, taus, cbuf

    return lax.fori_loop(0, nsteps, body, (pool, taus, cbuf))


def gk_qt(pool, taus, zvbuf, ypad, bpad, slots, bidx, zrow, zself,
          outmap, base, nsteps, kelim):
    ZN = zvbuf.shape[0] - 1
    mhi = bpad.shape[0] - 1

    def body(s, carry):
        zvbuf, ypad = carry
        k = base + s
        sl = lax.dynamic_index_in_dim(slots, k, 0, False)
        bi = lax.dynamic_index_in_dim(bidx, k, 0, False)
        zr = lax.dynamic_index_in_dim(zrow, k, 0, False)
        zs = lax.dynamic_index_in_dim(zself, k, 0, False)
        om = lax.dynamic_index_in_dim(outmap, k, 0, False)
        zb = (_gather1d(bpad, jnp.clip(bi, 0, mhi))
              * (bi >= 0).astype(bpad.dtype))
        zb = zb + (_gather1d(zvbuf, jnp.minimum(zr, ZN))
                   * (zr <= ZN).astype(zvbuf.dtype))
        zb = _front_qt(pool[sl], taus[sl], zb, kelim)   # batched kernel
        ypad = ypad.at[om].set(zb)
        zvbuf = zvbuf.at[jnp.minimum(zs, ZN)].set(
            jnp.where(zs <= ZN, zb, 0.0))
        return zvbuf, ypad

    return lax.fori_loop(0, nsteps, body, (zvbuf, ypad))


def gk_q(pool, taus, zvbuf, bvec, ypad, slots, bidx, zrow, zself,
         outmap, base, nsteps, kelim):
    ZN = zvbuf.shape[0] - 1
    yhi = ypad.shape[0] - 1
    mhi = bvec.shape[0] - 1

    def body(s, carry):
        zvbuf, bvec = carry
        k = base + s
        sl = lax.dynamic_index_in_dim(slots, k, 0, False)
        bi = lax.dynamic_index_in_dim(bidx, k, 0, False)
        zr = lax.dynamic_index_in_dim(zrow, k, 0, False)
        zs = lax.dynamic_index_in_dim(zself, k, 0, False)
        om = lax.dynamic_index_in_dim(outmap, k, 0, False)
        zb = (_gather1d(ypad, jnp.minimum(om, yhi))
              * (om < yhi).astype(ypad.dtype))
        zb = zb + (_gather1d(zvbuf, jnp.minimum(zs, ZN))
                   * (zs <= ZN).astype(zvbuf.dtype))
        ab = _front_q(pool[sl], taus[sl], zb, kelim)    # batched kernel
        bvec = bvec.at[jnp.where(bi >= 0, bi, mhi)].set(
            jnp.where(bi >= 0, ab, 0.0))
        zvbuf = zvbuf.at[jnp.minimum(zr, ZN)].set(
            jnp.where(zr <= ZN, ab, 0.0))
        return zvbuf, bvec

    return lax.fori_loop(0, nsteps, body, (zvbuf, bvec))


def gk_rsolve(pool, xpad, y, rslots, cj, od, rwv, base, nsteps):
    WB = cj.shape[2]
    nhi = y.shape[0] - 1

    def body(s, xpad):
        k = base + s
        sl = lax.dynamic_index_in_dim(rslots, k, 0, False)
        cjk = lax.dynamic_index_in_dim(cj, k, 0, False)
        odk = lax.dynamic_index_in_dim(od, k, 0, False)
        wk = lax.dynamic_index_in_dim(rwv, k, 0, False)
        P = pool[sl]
        piv = jnp.arange(WB)[None, :] < wk[:, None]
        RJJ = jnp.triu(P[:, :WB, :WB])
        RJJ = jnp.where(piv[:, :, None], RJJ,
                        jnp.eye(WB, dtype=P.dtype)[None])
        rhs = _gather1d(y, jnp.minimum(cjk, nhi))
        if P.shape[2] > WB:
            xod = _gather1d(xpad, odk)
            rhs = rhs - jnp.einsum("pwc,pc->pw", P[:, :WB, WB:], xod,
                                   precision=HIGHEST)
        rhs = jnp.where(piv, rhs, _gather1d(xpad, cjk))
        xJ = lax.linalg.triangular_solve(
            RJJ, rhs[:, :, None], left_side=True, lower=False)[:, :, 0]
        return xpad.at[cjk].set(xJ)

    return lax.fori_loop(0, nsteps, body, xpad)


def gk_rtsolve(pool, ypad, rslots, cj, od, rwv, base, nsteps):
    WB = cj.shape[2]
    n = ypad.shape[0] - 1

    def body(s, ypad):
        k = base + s
        sl = lax.dynamic_index_in_dim(rslots, k, 0, False)
        cjk = lax.dynamic_index_in_dim(cj, k, 0, False)
        odk = lax.dynamic_index_in_dim(od, k, 0, False)
        wk = lax.dynamic_index_in_dim(rwv, k, 0, False)
        P = pool[sl]
        piv = jnp.arange(WB)[None, :] < wk[:, None]
        RJJ = jnp.triu(P[:, :WB, :WB])
        RJJ = jnp.where(piv[:, :, None], RJJ,
                        jnp.eye(WB, dtype=P.dtype)[None])
        rhs = _gather1d(ypad, cjk)
        z = lax.linalg.triangular_solve(
            RJJ, rhs[:, :, None], left_side=True, lower=False,
            transpose_a=True)[:, :, 0]
        ypad = ypad.at[jnp.where(piv, cjk, n)].set(
            jnp.where(piv, z, 0.0))
        ypad = ypad.at[jnp.where(piv, n, cjk)].add(
            jnp.where(piv, 0.0, z - rhs))
        if P.shape[2] > WB:
            delta = jnp.einsum("pwc,pw->pc", P[:, :WB, WB:],
                               z * piv.astype(z.dtype),
                               precision=HIGHEST)
            ypad = ypad.at[odk].add(-delta)
        return ypad.at[n].set(0.0)

    return lax.fori_loop(0, nsteps, body, ypad)


def build_group_sched(plan: MfqrPlan) -> GroupSched:
    return GroupSched(plan)
