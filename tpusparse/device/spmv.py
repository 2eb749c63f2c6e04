"""Device SpMV / gaxpy (reference: csparse::cs_gaxpy — SURVEY.md §2.2).

Two TPU paths, chosen per matrix:

- ``ell``: scalar ELL slab, y = sum_k vals[:,k] * x[cols[:,k]] — an XLA
  gather+fma chain, memory-bound, low padding waste.  The production path
  for unstructured sparsity; targets the >=80%-of-STREAM goal
  (BASELINE.json north star) since its traffic is ~ the CSR minimum when
  row lengths are even.
- ``bell``: 128x128 dense-tile block-ELL driven by a Pallas kernel — the
  MXU path for block-structured matrices (supernodal factors, BTF
  blocks); runs compiled on TPU and interpret=True elsewhere.

Both are planned once per sparsity pattern on host and jitted once per
shape (SURVEY.md §7.0).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.matrix import CSCMatrix
from .config import DTYPE, HIGHEST, pallas_interpret, round_up
from .formats import (BellMatrix, DiaMatrix, dia_offsets, to_bell,
                      to_dia, to_ell)

__all__ = ["SpmvPlan", "spmv_plan", "gaxpy_device"]

try:  # Pallas import kept optional so the XLA path never depends on it
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@functools.partial(jax.jit, donate_argnums=())
def _ell_spmv(vals, cols, x):
    """y = A @ x on the ELL slab (gather + fma, VPU/HBM bound)."""
    return jnp.sum(vals * x[cols], axis=1)


def _build_dia_fn(D: DiaMatrix):
    """Gather-free DIA SpMV: y = sum_d bands[d] * x[i + off_d] with the
    shifts realized as STATIC slices of a padded x — no gathers at all,
    so the kernel streams at HBM speed on TPU.  With
    TPUSPARSE_PALLAS_DIA=1 (and x fitting VMEM) the single-pass Pallas
    band-streaming kernel is used instead."""
    import os

    offs = [int(o) for o in D.offsets]
    m, n = D.m, D.n
    lo = max(0, -min(offs)) if offs else 0
    hi = max(0, max(offs) + m - n) if offs else 0
    if os.environ.get("TPUSPARSE_PALLAS_DIA"):
        from .kernels.dia_spmv import dia_spmv_pallas, dia_supported
        if dia_supported(lo + n + hi):
            offsets = tuple(offs)

            @jax.jit
            def fn_pallas(bands, x):
                return dia_spmv_pallas(bands, offsets, x, m, n)

            return fn_pallas

    @jax.jit
    def fn(bands, x):
        xp = jnp.pad(x, (lo, hi))
        y = jnp.zeros((m,), DTYPE)
        for d, off in enumerate(offs):
            y = y + bands[d] * jax.lax.dynamic_slice(xp, (lo + off,), (m,))
        return y

    return fn


def _bell_kernel(tile_cols_ref, vals_ref, x_ref, o_ref, *, K: int, bm: int,
                 bk: int):
    """One grid step = one tile row: y_i = sum_s vals[i,s] @ x[cols[i,s]]."""
    i = pl.program_id(0)

    def body(s, acc):
        c = tile_cols_ref[i, s]
        xs = x_ref[c, :]                           # (bk,) dynamic tile of x
        a = vals_ref[0, s]                         # (bm, bk)
        return acc + jnp.dot(a, xs, precision=HIGHEST,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, K, body, jnp.zeros((bm,), jnp.float32))
    o_ref[i, :] = acc


def _build_bell_fn(B: BellMatrix) -> Callable:
    nbr = B.vals.shape[0]
    nbc = round_up(B.n, B.bk) // B.bk
    K, bm, bk = B.K, B.bm, B.bk
    kernel = functools.partial(_bell_kernel, K=K, bm=bm, bk=bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, K, bm, bk), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x: full (nbc, bk)
        ],
        # full-array output: Mosaic requires block rows divisible by 8,
        # so the kernel writes row i of the (nbr, bm) output directly
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbr, bm), jnp.float32),
        grid_spec=grid_spec,
        interpret=pallas_interpret(),
    )

    @jax.jit
    def fn(vals, tile_cols, x):
        xp = jnp.zeros((nbc * bk,), DTYPE).at[:x.size].set(x)
        y = call(tile_cols, vals, xp.reshape(nbc, bk))
        return y.reshape(-1)

    return fn


@dataclass
class SpmvPlan:
    """Once-per-pattern SpMV plan: device buffers + jitted apply."""
    m: int
    n: int
    mode: str
    flops: int
    bytes_min: int
    bytes_padded: int
    waste_ratio: float
    spill: int = 0                  # entries handled by the COO pass
    _apply: Callable = None
    _bufs: tuple = None
    _apply_many: Callable = None
    _kernel: Callable = None        # sell: permuted-space matvec
    perm: np.ndarray = None         # sell: RCM row/col permutation

    def apply(self, x) -> jnp.ndarray:
        """y = A @ x (device)."""
        x = jnp.asarray(x, DTYPE)
        y = self._apply(*self._bufs, x)
        return y[:self.m]

    def apply_permuted(self, xp) -> jnp.ndarray:
        """y_perm = (P A P') @ x_perm for the SELL plan: the slab kernel
        + COO spill WITHOUT the two n-sized permutation gathers, which
        cost ~3x the kernel itself on hardware (BASELINE.md round-3
        attribution: 911us vs 2738us at n=131k).  Iterative consumers
        (CG & friends) permute once with ``perm`` and stay in permuted
        space; symmetric A keeps A_perm symmetric."""
        if self._kernel is None:
            raise ValueError("apply_permuted is only for mode='sell'")
        sr, sc, sv, _pv, _pi, *flat = self._bufs
        xp = jnp.asarray(xp, DTYPE)
        return self._kernel(sr, sc, sv, *flat, xp)[:self.m]

    def gaxpy(self, x, y) -> jnp.ndarray:
        """y + A @ x — the reference cs_gaxpy contract, functional."""
        return jnp.asarray(y, DTYPE).at[:self.m].add(self.apply(x))

    def apply_many(self, X) -> jnp.ndarray:
        """Y = A @ X for (n, k) multi-vectors (SpMM): vmapped over the
        RHS axis — one device dispatch for block-Krylov / multi-RHS."""
        X = jnp.asarray(X, DTYPE)
        if X.ndim == 1:
            return self.apply(X)
        if self._apply_many is None:
            import jax as _jax
            self._apply_many = _jax.jit(_jax.vmap(
                self._apply, in_axes=(None,) * len(self._bufs) + (1,),
                out_axes=1))
        return self._apply_many(*self._bufs, X)[:self.m]


def _build_sell(A: CSCMatrix, max_s: int = None, max_tw: int = 4):
    """Plan the SELL-128 windowed-gather layout (see
    kernels.sell_spmv): RCM permutation, rows->lanes slabs, per-block
    multi-tile window selection, out-of-window/overflow spill to a COO
    pass.  TPUSPARSE_SELL_KERNEL selects the kernel (1 default:
    broadcast-row decomposition, measured best on hardware; 2:
    sublane-aligned packing, one gather per window tile per sub-step —
    measured tie on time at 2.5x the slab memory).  The whole packing
    is vectorized (the round-2 per-row loop took 10 s at n=131k).
    Returns None when the kernel stack is unavailable."""
    import os
    from .kernels.sell_spmv import TILE, build_sell_call, sell_supported
    if not sell_supported() or A.m != A.n or A.nnz == 0:
        return None
    # v1 measured best on hardware: v2's 8x fewer gather ops tie on
    # time (relay-floor bound) while its sublane-aligned slabs carry
    # ~2.5x the memory (kernel+spill 911us vs 1045us at n=131k; see
    # BASELINE.md round-3 SpMV attribution)
    version = int(os.environ.get("TPUSPARSE_SELL_KERNEL", "1"))
    if max_s is None:
        max_s = 8 if version == 2 else 4
    n = A.n
    from ..symbolic.rcm import rcm
    from ..core.ops import permute
    from ..core.perm import pinv as _pinv
    NB = round_up(n, 128) // 128
    ntiles = max(-(-n // TILE), 1)

    def _pack(C):
        """Window selection + slab packing for one candidate ordering;
        returns every array the slab builder needs plus the spill
        count, so orderings can be compared before committing."""
        # CSR-style entries grouped by row (candidate coordinates)
        cols_of = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(C.indptr))
        rows_e, cols_e, vals_e = C.indices, cols_of, C.data
        order = np.argsort(rows_e, kind="stable")
        rows_e = rows_e[order]
        cols_e = cols_e[order]
        vals_e = vals_e[order]
        rptr = np.zeros(n + 2, np.int64)
        np.add.at(rptr, rows_e + 1, 1)
        rptr = np.cumsum(rptr)
        # window slots: each block gets TW INDEPENDENT x tiles (its
        # top-TW tiles by entry count), not a consecutive run — on
        # kNN-class graphs the far neighbours of a 128-row block
        # cluster in one or two remote tiles, so 3 slots cover ~100%
        # where consecutive windows spilled 1-2% to the
        # (latency-dominated) XLA COO pass.  TW = smallest count
        # covering >=99.5% of entries, capped.
        tile_e = cols_e // TILE
        blk = rows_e // 128
        win = np.zeros((NB, max_tw), np.int64)
        topcnt = np.zeros((NB, max_tw), np.int64)
        for b in range(NB):
            lo, hi = rptr[b * 128], rptr[min((b + 1) * 128, n)]
            te = tile_e[lo:hi]
            if te.size == 0:
                continue
            vals_u, cnts = np.unique(te, return_counts=True)
            o = np.argsort(cnts)[::-1][:max_tw]
            win[b, :o.size] = vals_u[o]
            topcnt[b, :o.size] = cnts[o]
        tot = max(rows_e.size, 1)
        cum = np.cumsum(topcnt.sum(axis=0))
        TW = (int(np.argmax(cum >= tot * 0.995)) + 1 if rows_e.size
              else 1)
        TW = min(max(TW, 1), max_tw)
        win = np.ascontiguousarray(win[:, :TW])
        slot_e = np.full(rows_e.size, -1, np.int64)
        for j in range(TW):
            m = (tile_e == win[blk, j]) & (slot_e < 0)
            slot_e[m] = j
        pos = slot_e * TILE + (cols_e % TILE)
        ok = slot_e >= 0
        lane = rows_e % 128
        idx_in = np.where(ok)[0]
        if version == 2:
            q_of = (pos[idx_in] >> 7) & 7
            grp = rows_e[idx_in] * 8 + q_of
        else:
            grp = rows_e[idx_in]
        o2 = np.argsort(grp, kind="stable")
        gs = grp[o2]
        cc = np.zeros(gs.size, np.int64)
        if gs.size:
            newg = np.concatenate([[True], gs[1:] != gs[:-1]])
            gstart = np.where(newg)[0]
            glen = np.diff(np.concatenate([gstart, [gs.size]]))
            cc0 = np.arange(gs.size) - np.repeat(gstart, glen)
            cc[o2] = cc0
        if version == 2:
            s_of = cc
        else:
            s_of, q_of = cc // 8, cc % 8
        keep = s_of < max_s
        kept = idx_in[keep]
        # spill: out-of-window entries + per-slot overflow
        spm = np.ones(rows_e.size, bool)
        spm[kept] = False
        return dict(rows_e=rows_e, cols_e=cols_e, vals_e=vals_e,
                    win=win, TW=TW, blk=blk, lane=lane, pos=pos,
                    kept=kept, s_k=s_of[keep], q_k=q_of[keep],
                    sr=rows_e[spm], sc=cols_e[spm], sv=vals_e[spm])

    # identity-first ordering (VERDICT r4 item 7): a matrix that is
    # ALREADY low-bandwidth (mesh-ordered FEM, banded, prior-RCM input)
    # covers its windows without any permutation, and the one-shot
    # apply then needs ZERO n-sized permutation transports — the
    # transports are the dominant one-shot cost on the relay (~3x the
    # kernel, BASELINE.md round-3/4 studies).  RCM is engaged only when
    # the identity packing spills more than TPUSPARSE_SELL_ID_SPILL_MAX
    # (default 1%) of the entries to the latency-dominated COO pass.
    id_tol = float(os.environ.get("TPUSPARSE_SELL_ID_SPILL_MAX",
                                  "0.01"))
    pk = _pack(A)
    if pk["sr"].size <= id_tol * max(A.nnz, 1):
        p = np.arange(n, dtype=np.int64)
        piv = p
        identity = True
    else:
        p = rcm(A)
        piv = _pinv(p)
        pk = _pack(permute(A, piv, p, values=True))
        identity = False
    rows_e, cols_e, vals_e = pk["rows_e"], pk["cols_e"], pk["vals_e"]
    win, TW, blk, lane, pos = (pk["win"], pk["TW"], pk["blk"],
                               pk["lane"], pk["pos"])
    kept, s_k, q_k = pk["kept"], pk["s_k"], pk["q_k"]
    sr, sc, sv = pk["sr"], pk["sc"], pk["sv"]
    nsp = sr.size
    # per-block S class from the max used sub-step
    smax_blk = np.zeros(NB, np.int64)
    if kept.size:
        np.maximum.at(smax_blk, blk[kept], s_k + 1)
    Sb_arr = np.maximum(2 ** np.ceil(np.log2(
        np.maximum(smax_blk, 1))).astype(np.int64), 1)
    Sb_arr = np.minimum(Sb_arr, max_s)
    classes = sorted(set(Sb_arr.tolist()))
    calls = []           # (call, S, bids, winsel, pos, vals)
    slab_nnz = int(kept.size)
    bytes_padded = nsp * 16 + (2 * n) * 4 + n * 8
    slab_slots = 0
    for S in classes:
        bsel = np.where(Sb_arr == S)[0]
        NBc = bsel.size
        imap = np.full(NB, -1, np.int64)
        imap[bsel] = np.arange(NBc)
        pos_s = np.zeros((NBc, S, 8, 128), np.int32)
        vals_s = np.zeros((NBc, S, 8, 128), np.float32)
        msk = imap[blk[kept]] >= 0
        e, es, eq = kept[msk], s_k[msk], q_k[msk]
        pos_s[imap[blk[e]], es, eq, lane[e]] = pos[e]
        vals_s[imap[blk[e]], es, eq, lane[e]] = vals_e[e]
        calls.append((build_sell_call(NBc, S, ntiles, TW,
                                      version=version), S,
                      jnp.asarray(bsel.astype(np.int32)),
                      jnp.asarray(win[bsel].astype(np.int32)),
                      jnp.asarray(pos_s), jnp.asarray(vals_s)))
        bytes_padded += pos_s.size * 8
        slab_slots += pos_s.size
    npad = ntiles * TILE

    def kernel_fn(sr_d, sc_d, sv_d, *bufs_and_xp):
        """y_perm = C @ x_perm — slabs + spill in RCM coordinates; the
        steady-state op for iterative consumers (the two n-sized
        permutation gathers cost ~3x the kernel on hardware)."""
        *flat, xp = bufs_and_xp
        xpad = jnp.zeros(npad, DTYPE).at[:xp.size].set(xp)
        xtiles = xpad.reshape(ntiles, 8, 128)
        yb = jnp.zeros((NB, 128), DTYPE)
        for ci, (call, S, *_rest) in enumerate(calls):
            bids_d, winsel_d, pos_d, vals_d = flat[4 * ci:4 * ci + 4]
            out = call(winsel_d, pos_d, vals_d, xtiles)
            yb = yb.at[bids_d].set(out.reshape(-1, 128))
        y = yb.reshape(-1)[:xp.size]
        if sr_d.size:
            y = y.at[sr_d].add(sv_d * xp[sc_d])
        return y

    # one-shot permutation transport (VERDICT r3 item 6): a serialized
    # arbitrary n-gather runs at ~11 ns/element on the axon relay
    # (1481 us at n=131k inside a fori_loop) while lax.sort_key_val
    # with the inverse permutation as keys applies the SAME permutation
    # in 654 us — measured /tmp permutation study, round 4; chunked-2D
    # gathers, scatters, take_along_axis (1550 us/stage) and a 3-stage
    # Hall decomposition all measured worse.  Sort is O(n log n) work,
    # so it only wins on the relay — gather mode kept for CPU.
    perm_mode = os.environ.get("TPUSPARSE_SELL_PERMUTE") or \
        ("sort" if jax.default_backend() != "cpu" else "gather")

    def apply_fn(sr_d, sc_d, sv_d, pvec_d, piv_d, *bufs_and_x):
        *flat, x = bufs_and_x
        if identity:
            # zero-transport one-shot: windows cover in the input's own
            # ordering, so y = kernel(x) directly
            return kernel_fn(sr_d, sc_d, sv_d, *flat, x)
        if perm_mode == "sort":
            # xp[i] = x[p[i]]  <=>  values of x sorted by keys pinv
            _, xp = jax.lax.sort_key_val(piv_d, x)
            yp = kernel_fn(sr_d, sc_d, sv_d, *flat, xp)
            _, y = jax.lax.sort_key_val(pvec_d, yp)
            return y
        xp = x[pvec_d]
        return kernel_fn(sr_d, sc_d, sv_d, *flat, xp)[piv_d]

    flat_bufs = []
    for (_call, _S, bids_d, winsel_d, pos_d, vals_d) in calls:
        flat_bufs += [bids_d, winsel_d, pos_d, vals_d]
    bufs = (jnp.asarray(sr.astype(np.int32)),
            jnp.asarray(sc.astype(np.int32)), jnp.asarray(sv, DTYPE),
            jnp.asarray(p.astype(np.int32)),
            jnp.asarray(piv.astype(np.int32)), *flat_bufs)
    return dict(apply=jax.jit(apply_fn), kernel=jax.jit(kernel_fn),
                perm=p, bufs=bufs, NB=NB,
                S=max(classes), TW=TW, spill=int(nsp),
                slab_nnz=slab_nnz, slab_slots=slab_slots,
                bytes_padded=bytes_padded)


def _build_seg(A: CSCMatrix, cap: int = 32):
    """Segmented-sum SpMV for POWER-LAW row-degree distributions
    (VERDICT r2 item 6): the SELL packing sizes every block's slab by
    its max row sub-steps, so one hub row inflates the whole block (or
    overflows to the latency-dominated COO spill).  Here rows are SPLIT
    into virtual rows of <= ``cap`` entries, each virtual row lands in
    the power-of-two width class of its true length (4/8/16/32 —
    bounded ELL padding per class), the per-class slabs run the plain
    gather+fma ELL kernel, and one scatter-add segment-reduces the
    virtual partial sums into y.  Spill is ZERO by construction; padded
    bytes are bounded by 2x nnz regardless of the tail."""
    m, n = A.m, A.n
    if A.nnz == 0:
        return None
    cols_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    rows_e, cols_e, vals_e = A.indices, cols_of, A.data
    order = np.argsort(rows_e, kind="stable")
    rows_e, cols_e, vals_e = (rows_e[order], cols_e[order],
                              vals_e[order])
    deg = np.bincount(rows_e, minlength=m)
    # virtual rows: ceil(deg/cap) chunks per row
    nck = -(-deg // cap)
    nck0 = np.maximum(nck, 0)
    V = int(nck0.sum())
    v_row = np.repeat(np.arange(m, dtype=np.int64), nck0)
    starts = np.cumsum(deg) - deg
    v_idx = np.arange(V, dtype=np.int64)
    v_first = np.zeros(V, np.int64)
    if V:
        rstart = np.cumsum(nck0) - nck0
        v_first = starts[v_row] + (v_idx - rstart[v_row]) * cap
    v_len = np.minimum(deg[v_row] - (v_first - starts[v_row]), cap)
    # class = pow2 ceil of the virtual length, min 4
    cls = np.maximum(1 << np.ceil(np.log2(np.maximum(v_len, 1))
                                  ).astype(np.int64), 4)
    cls = np.minimum(cls, cap)
    classes = sorted(set(cls.tolist()))
    slabs = []
    slots = 0
    for c in classes:
        sel = np.where(cls == c)[0]
        Vc = sel.size
        vals_s = np.zeros((Vc, c), np.float32)
        cols_s = np.zeros((Vc, c), np.int32)
        ii = np.repeat(np.arange(Vc, dtype=np.int64), v_len[sel])
        jj = np.concatenate([np.arange(L) for L in v_len[sel]]) \
            if Vc else np.zeros(0, np.int64)
        epos = np.repeat(v_first[sel], v_len[sel]) + jj
        vals_s[ii, jj] = vals_e[epos]
        cols_s[ii, jj] = cols_e[epos]
        slabs.append((jnp.asarray(vals_s), jnp.asarray(cols_s),
                      jnp.asarray(v_row[sel].astype(np.int32))))
        slots += Vc * c

    def apply_fn(*bufs_and_x):
        *flat, x = bufs_and_x
        y = jnp.zeros(m, DTYPE)
        for ci in range(len(slabs)):
            vals_d, cols_d, rid = flat[3 * ci:3 * ci + 3]
            part = jnp.sum(vals_d * x[cols_d], axis=1)
            y = y.at[rid].add(part)
        return y

    flat = [b for slab in slabs for b in slab]
    return dict(apply=jax.jit(apply_fn), bufs=tuple(flat),
                slots=slots, nnz=int(A.nnz),
                bytes_padded=slots * 8 + (m + n) * 4)


def _heavy_tail(A: CSCMatrix) -> bool:
    """Degree-distribution probe at plan time: a power-law tail makes
    both ELL (K = max degree) and SELL (max-substep slabs / COO spill)
    pay for the hubs; the segmented path caps padding per class."""
    if A.nnz == 0 or A.m == 0:
        return False
    deg = np.bincount(A.indices, minlength=A.m)
    med = max(float(np.median(deg[deg > 0])), 1.0)
    return float(deg.max()) >= 8.0 * med


def spmv_plan(A: CSCMatrix, mode: str = "auto") -> SpmvPlan:
    """Plan a device SpMV for the pattern of A.

    mode: 'ell' (XLA gather path), 'bell' (Pallas MXU tile path),
    'dia' (gather-free banded), 'sell' (RCM + windowed-gather Pallas,
    the general-pattern path), 'seg' (row-split segmented-sum for
    power-law degree tails), or 'auto'.
    """
    if mode == "auto":
        mode = "ell"
        if A.nnz > 0:
            # DIA when the diagonal structure is compact: gather-free
            offs = dia_offsets(A)
            if (offs.size <= 64
                    and A.nnz / max(offs.size * A.m, 1) > 0.2):
                mode = "dia"
        if mode == "ell" and _HAS_PALLAS and A.nnz > 0:
            # quick occupancy probe on the 128x128 tiling
            nbc = round_up(A.n, 128) // 128
            cols_of = np.repeat(np.arange(A.n), np.diff(A.indptr))
            keys = (A.indices // 128) * nbc + cols_of // 128
            ntiles = np.unique(keys).size
            occ = A.nnz / max(ntiles * 128 * 128, 1)
            if occ > 0.25:
                mode = "bell"
        if mode == "ell" and A.nnz > 0 and _heavy_tail(A):
            mode = "seg"           # power-law degree tail
        elif (mode == "ell" and _HAS_PALLAS and A.m == A.n
                and A.nnz > 0 and A.nnz / A.n <= 32):
            mode = "sell"          # general irregular pattern
    if mode == "seg":
        plan = _build_seg(A)
        if plan is None:
            mode = "ell"
        else:
            nnz = A.nnz
            return SpmvPlan(
                m=A.m, n=A.n, mode="seg", flops=2 * nnz,
                bytes_min=nnz * 8 + (A.m + A.n) * 4,
                bytes_padded=plan["bytes_padded"],
                waste_ratio=1.0 - nnz / max(plan["slots"], 1),
                spill=0,
                _apply=plan["apply"], _bufs=plan["bufs"])
    if mode == "sell":
        plan = _build_sell(A)
        if plan is None:
            mode = "ell"
        else:
            nnz = A.nnz
            return SpmvPlan(
                m=A.m, n=A.n, mode="sell", flops=2 * nnz,
                bytes_min=nnz * 8 + (A.m + A.n) * 4,
                bytes_padded=plan["bytes_padded"],
                waste_ratio=1.0 - plan["slab_nnz"]
                / max(plan["slab_slots"], 1),
                spill=plan["spill"],
                _apply=plan["apply"], _bufs=plan["bufs"],
                _kernel=plan["kernel"], perm=plan["perm"])
    if mode == "dia":
        D = to_dia(A)
        fn = _build_dia_fn(D)
        return SpmvPlan(
            m=A.m, n=A.n, mode="dia", flops=D.flops,
            bytes_min=D.bytes_min, bytes_padded=D.bytes_padded,
            waste_ratio=D.waste_ratio,
            _apply=fn, _bufs=(jnp.asarray(D.bands),),
        )
    if mode == "bell":
        if not _HAS_PALLAS:
            raise RuntimeError("pallas unavailable for bell mode")
        B = to_bell(A, bm=128, bk=128)
        fn = _build_bell_fn(B)
        return SpmvPlan(
            m=A.m, n=A.n, mode="bell", flops=B.flops,
            bytes_min=A.nnz * 8 + (A.m + A.n) * 4,
            bytes_padded=B.vals.size * 4 + B.tile_cols.size * 4
            + (A.m + A.n) * 4,
            waste_ratio=B.waste_ratio,
            _apply=fn,
            _bufs=(jnp.asarray(B.vals), jnp.asarray(B.tile_cols)),
        )
    E = to_ell(A)
    return SpmvPlan(
        m=A.m, n=A.n, mode="ell", flops=E.flops,
        bytes_min=E.bytes_min, bytes_padded=E.bytes_padded,
        waste_ratio=1.0 - A.nnz / max(E.vals.size, 1),
        _apply=_ell_spmv,
        _bufs=(jnp.asarray(E.vals), jnp.asarray(E.cols)),
    )


def gaxpy_device(A: CSCMatrix, x, y) -> np.ndarray:
    """One-shot device gaxpy (plans, runs, returns numpy)."""
    plan = spmv_plan(A)
    return np.asarray(plan.gaxpy(x, y))
