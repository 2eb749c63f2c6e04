"""Dense blocked factorization kernels (jit, static shapes, MXU GEMMs).

These are the device building blocks the sparse drivers compose
(SURVEY.md §7.0: "panel factorize + GEMM update"):

- blocked_lu: right-looking LU with partial pivoting — per panel an
  unblocked fori_loop (argmax pivot + rank-1 update restricted to the
  panel), then TRSM for the U block row and one trailing GEMM.  This is
  the "partial pivoting restricted to within-panel row swaps" scheme of
  the north star generalized: the pivot search spans ALL remaining rows
  (full partial pivoting), only the elimination is panel-blocked.
- blocked_qr: blocked Householder with compact-WY accumulation — per
  panel an unblocked reflector loop, then the T recurrence and two GEMMs
  to update the trailing matrix.  (SURVEY.md §7.1 stage 5: WY instead of
  one-reflection-at-a-time.)

All matmuls run at Precision.HIGHEST (BASELINE.md probe #2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .config import HIGHEST

__all__ = ["blocked_lu", "lu_solve", "blocked_qr", "qr_apply_qt",
           "qr_apply_q", "qr_solve_r", "qr_solve_rt",
           "qr_factor_partial", "qr_qt_mul_batched", "qr_q_mul_batched"]


# -------------------------------------------------------------------- LU
@functools.partial(jax.jit, static_argnums=(1,))
def blocked_lu(M, bs: int):
    """LU with partial pivoting of square padded M (N divisible by bs).

    Returns (LU, perm): LU holds unit-lower L below the diagonal and U on
    and above it; perm is the pivot row permutation (row i of PA is row
    perm[i] of A).
    """
    N = M.shape[0]
    idx = jnp.arange(N)
    perm = idx
    nb = N // bs
    for k in range(nb):
        k0 = k * bs

        def col_step(j, carry, k0=k0):
            M, perm = carry
            c = k0 + j
            col = M[:, c]
            cand = jnp.where(idx >= c, jnp.abs(col), -1.0)
            piv = jnp.argmax(cand)
            rowc, rowp = M[c], M[piv]
            M = M.at[c].set(rowp).at[piv].set(rowc)
            pc, pp = perm[c], perm[piv]
            perm = perm.at[c].set(pp).at[piv].set(pc)
            pivval = M[c, c]
            safe = jnp.where(pivval == 0, 1.0, pivval)
            scale = jnp.where(idx > c, M[:, c] / safe, M[:, c])
            M = M.at[:, c].set(scale)
            l = jnp.where(idx > c, scale, 0.0)
            panel = M[:, k0:k0 + bs]                    # static slice
            urow = panel[c]                             # row c of panel
            colmask = jnp.arange(bs) > j
            upd = jnp.outer(l, jnp.where(colmask, urow, 0.0))
            M = M.at[:, k0:k0 + bs].add(-upd)
            return M, perm

        M, perm = lax.fori_loop(0, bs, lambda j, cy: col_step(j, cy),
                                (M, perm))
        if k0 + bs < N:
            Lkk = M[k0:k0 + bs, k0:k0 + bs]
            rest = M[k0:k0 + bs, k0 + bs:]
            U = lax.linalg.triangular_solve(
                Lkk, rest, left_side=True, lower=True, unit_diagonal=True)
            M = M.at[k0:k0 + bs, k0 + bs:].set(U)
            Lblk = M[k0 + bs:, k0:k0 + bs]
            M = M.at[k0 + bs:, k0 + bs:].add(
                -jnp.matmul(Lblk, U, precision=HIGHEST))
    return M, perm


@jax.jit
def lu_solve(LU, perm, b):
    """Solve A x = b given blocked_lu output."""
    pb = b[perm]
    y = lax.linalg.triangular_solve(LU, pb[:, None], left_side=True,
                                    lower=True, unit_diagonal=True)[:, 0]
    x = lax.linalg.triangular_solve(LU, y[:, None], left_side=True,
                                    lower=False)[:, 0]
    return x


# -------------------------------------------------------------------- QR
@functools.partial(jax.jit, static_argnums=(1,))
def blocked_qr(M, bs: int):
    """Blocked Householder QR of padded M (m x n, n divisible by bs,
    m >= n).  Returns (VR, taus): VR holds the Householder vectors below
    the diagonal (v0 = 1 implicit) and R on/above; taus the coefficients.

    H_k = I - tau_k v_k v_k'; panels applied to the trailing matrix via
    the compact-WY form  Q_panel = I - V T V'.
    """
    m, n = M.shape
    ridx = jnp.arange(m)
    taus = jnp.zeros(n, M.dtype)
    nb = n // bs
    for k in range(nb):
        k0 = k * bs

        def col_step(j, carry, k0=k0):
            M, taus = carry
            c = k0 + j
            col = jnp.where(ridx >= c, M[:, c], 0.0)
            normx = jnp.sqrt(jnp.sum(col * col))
            x0 = M[c, c]
            sgn = jnp.where(x0 >= 0, 1.0, -1.0)
            alpha = -sgn * normx                       # R(c,c)
            denom = x0 - alpha
            safe = jnp.where(denom == 0, 1.0, denom)
            v = jnp.where(ridx > c, col / safe, 0.0)
            v = v.at[c].set(1.0)
            tau = jnp.where(
                normx == 0.0, 0.0, (alpha - x0) / jnp.where(alpha == 0,
                                                            1.0, alpha))
            # tau = (alpha - x0)/alpha is the LAPACK larfg coefficient
            taus = taus.at[c].set(tau)
            # apply H to the remaining panel columns (incl. c)
            panel = M[:, k0:k0 + bs]
            w = jnp.matmul(v[None, :], panel, precision=HIGHEST)[0]
            colmask = jnp.arange(bs) >= j
            upd = jnp.outer(tau * v, jnp.where(colmask, w, 0.0))
            M = M.at[:, k0:k0 + bs].add(-upd)
            # store v below the diagonal of column c
            newcol = jnp.where(ridx > c, v, M[:, c])
            M = M.at[:, c].set(newcol)
            return M, taus

        M, taus = lax.fori_loop(0, bs, lambda j, cy: col_step(j, cy),
                                (M, taus))
        if k0 + bs < n:
            V = _panel_v(M, k0, bs, m)
            T = _form_t(V, taus[k0:k0 + bs])
            rest = M[:, k0 + bs:]
            W = jnp.matmul(V.T, rest, precision=HIGHEST)      # (bs, rest)
            # trailing <- Q_panel' @ trailing = (I - V T' V') @ trailing
            rest = rest - jnp.matmul(
                V, jnp.matmul(T.T, W, precision=HIGHEST), precision=HIGHEST)
            M = M.at[:, k0 + bs:].set(rest)
    return M, taus


def _panel_v(M, k0: int, bs: int, m: int):
    """Extract the (m, bs) V of panel k0 (unit diagonal, zeros above)."""
    ridx = jnp.arange(m)[:, None]
    cidx = k0 + jnp.arange(bs)[None, :]
    panel = M[:, k0:k0 + bs]
    V = jnp.where(ridx > cidx, panel, 0.0)
    V = V + (ridx == cidx).astype(M.dtype)
    return V


def _form_t(V, taus):
    """Compact-WY T: upper triangular with T[j,j] = tau_j and
    T[:j, j] = -tau_j * T[:j,:j] @ (V[:,:j]' v_j)."""
    bs = taus.shape[0]
    VtV = jnp.matmul(V.T, V, precision=HIGHEST)

    def step(j, T):
        col = -taus[j] * jnp.matmul(T, VtV[:, j], precision=HIGHEST)
        col = jnp.where(jnp.arange(bs) < j, col, 0.0)
        col = col.at[j].set(taus[j])
        return T.at[:, j].set(col)

    return lax.fori_loop(0, bs, step, jnp.zeros((bs, bs), V.dtype))


@functools.partial(jax.jit, static_argnums=(3,))
def qr_apply_qt(VR, taus, b, bs: int):
    """b <- Q' b  (apply H_{n-1}...H_0 in forward panel order)."""
    m, n = VR.shape
    for k in range(n // bs):
        k0 = k * bs
        V = _panel_v(VR, k0, bs, m)
        T = _form_t(V, taus[k0:k0 + bs])
        w = jnp.matmul(V.T, b, precision=HIGHEST)
        b = b - jnp.matmul(V, jnp.matmul(T.T, w, precision=HIGHEST),
                           precision=HIGHEST)
    return b


@functools.partial(jax.jit, static_argnums=(3,))
def qr_apply_q(VR, taus, b, bs: int):
    """b <- Q b  (apply H_0...H_{n-1} in reverse panel order)."""
    m, n = VR.shape
    for k in range(n // bs - 1, -1, -1):
        k0 = k * bs
        V = _panel_v(VR, k0, bs, m)
        T = _form_t(V, taus[k0:k0 + bs])
        w = jnp.matmul(V.T, b, precision=HIGHEST)
        b = b - jnp.matmul(V, jnp.matmul(T, w, precision=HIGHEST),
                           precision=HIGHEST)
    return b


# ------------------------------------------------- batched / partial QR
# Building blocks for the multifrontal sparse QR engine
# (tpusparse.device.mfqr): each front is a padded (R, C) matrix and a
# level's fronts of one bucket shape factor as ONE vmapped program.
# ``kelim`` (static, a multiple of bs) is the number of columns
# eliminated — min(R, C) for a full front QR — so wide fronts (R < C)
# never pad rows up to C.  Zero-padded rows/columns produce tau = 0
# reflectors (identity), keeping Q exact on the real subspace.

def _panel_starts(kelim: int, bs: int):
    """(k0, width) pairs covering [0, kelim) — the last panel may be
    narrower than bs (bucket sizes are multiples of 4, not of bs)."""
    out = []
    k0 = 0
    while k0 < kelim:
        out.append((k0, min(bs, kelim - k0)))
        k0 += min(bs, kelim - k0)
    return out


def qr_factor_partial(M, taus, bs: int, kelim: int):
    """Traceable (vmap-friendly) blocked Householder QR of one padded
    front, eliminating the first ``kelim`` columns.  Same storage
    convention as :func:`blocked_qr` (V below the diagonal, R on/above,
    LAPACK larfg taus)."""
    m, n = M.shape
    ridx = jnp.arange(m)
    for k0, pb in _panel_starts(kelim, bs):

        def col_step(j, carry, k0=k0, bs=pb):
            M, taus = carry
            c = k0 + j
            col = jnp.where(ridx >= c, M[:, c], 0.0)
            normx = jnp.sqrt(jnp.sum(col * col))
            x0 = M[c, c]
            sgn = jnp.where(x0 >= 0, 1.0, -1.0)
            alpha = -sgn * normx
            denom = x0 - alpha
            safe = jnp.where(denom == 0, 1.0, denom)
            v = jnp.where(ridx > c, col / safe, 0.0)
            v = v.at[c].set(1.0)
            tau = jnp.where(
                normx == 0.0, 0.0, (alpha - x0) / jnp.where(alpha == 0,
                                                            1.0, alpha))
            taus = taus.at[c].set(tau)
            panel = M[:, k0:k0 + bs]
            w = jnp.matmul(v[None, :], panel, precision=HIGHEST)[0]
            colmask = jnp.arange(bs) >= j
            upd = jnp.outer(tau * v, jnp.where(colmask, w, 0.0))
            M = M.at[:, k0:k0 + bs].add(-upd)
            newcol = jnp.where(ridx > c, v, M[:, c])
            M = M.at[:, c].set(newcol)
            return M, taus

        M, taus = lax.fori_loop(0, pb, lambda j, cy: col_step(j, cy),
                                (M, taus))
        if k0 + pb < n:
            V = _panel_v(M, k0, pb, m)
            T = _form_t(V, taus[k0:k0 + pb])
            rest = M[:, k0 + pb:]
            W = jnp.matmul(V.T, rest, precision=HIGHEST)
            rest = rest - jnp.matmul(
                V, jnp.matmul(T.T, W, precision=HIGHEST), precision=HIGHEST)
            M = M.at[:, k0 + pb:].set(rest)
    return M, taus


def _panel_v_batched(VR, k0: int, bs: int):
    """(P, m, bs) unit-lower V of panel k0 from a batch of factors."""
    m = VR.shape[1]
    ridx = jnp.arange(m)[:, None]
    cidx = k0 + jnp.arange(bs)[None, :]
    panel = VR[:, :, k0:k0 + bs]
    V = jnp.where(ridx > cidx, panel, 0.0)
    return V + (ridx == cidx).astype(VR.dtype)


def _form_t_batched(V, taus):
    """Batched compact-WY T (P, bs, bs) from V (P, m, bs), taus (P, bs)."""
    P, _, bs = V.shape
    VtV = jnp.einsum("pmi,pmj->pij", V, V, precision=HIGHEST)

    def step(j, T):
        col = -taus[:, j][:, None] * jnp.einsum(
            "pij,pj->pi", T, VtV[:, :, j], precision=HIGHEST)
        col = jnp.where(jnp.arange(bs)[None, :] < j, col, 0.0)
        col = col.at[:, j].set(taus[:, j])
        return T.at[:, :, j].set(col)

    return lax.fori_loop(0, bs, step,
                         jnp.zeros((P, bs, bs), V.dtype))


def qr_qt_mul_batched(VR, taus, z, bs: int, kelim: int):
    """z <- Q' z for a batch of factored fronts: VR (P, m, n),
    taus (P, n), z (P, m).  Forward panel order."""
    for k0, pb in _panel_starts(kelim, bs):
        V = _panel_v_batched(VR, k0, pb)
        T = _form_t_batched(V, taus[:, k0:k0 + pb])
        w = jnp.einsum("pmi,pm->pi", V, z, precision=HIGHEST)
        # Q_panel = I - V T V'  =>  Q' needs T'w: einsum ji contracts
        # the first index of T (transpose)
        z = z - jnp.einsum("pmi,pi->pm", V,
                           jnp.einsum("pji,pj->pi", T, w,
                                      precision=HIGHEST),
                           precision=HIGHEST)
    return z


def qr_q_mul_batched(VR, taus, z, bs: int, kelim: int):
    """z <- Q z for a batch of factored fronts (reverse panel order)."""
    for k0, pb in reversed(_panel_starts(kelim, bs)):
        V = _panel_v_batched(VR, k0, pb)
        T = _form_t_batched(V, taus[:, k0:k0 + pb])
        w = jnp.einsum("pmi,pm->pi", V, z, precision=HIGHEST)
        z = z - jnp.einsum("pmi,pi->pm", V,
                           jnp.einsum("pij,pj->pi", T, w,
                                      precision=HIGHEST),
                           precision=HIGHEST)
    return z


# ---------------------------------------------- scan-form front QR
# The unrolled panel loops above trace O(kelim/bs) panel bodies into
# the HLO — fine for one dense matrix, prohibitive when a multifrontal
# plan jits tens of buckets x levels.  The scan forms below roll the
# panel loop into ONE lax.scan body with a dynamic panel start:
# reflector columns beyond kelim get tau = 0 (identity), and the
# trailing WY update applies full-width under a >= k0+bs column mask,
# so partial last panels need no special casing.  ~2x the update flops
# of the triangular-narrowed version, O(1) HLO per bucket.

def _gather_panel(M, k0, bs: int):
    """(m, bs) columns [k0, k0+bs) of M via gather (dynamic k0),
    zero-masked beyond the real width."""
    ncol = M.shape[-1]
    cols = jnp.clip(k0 + jnp.arange(bs), 0, ncol - 1)
    panel = M[:, cols]
    return panel * (k0 + jnp.arange(bs) < ncol)[None, :].astype(M.dtype)


def qr_factor_scan(M, taus, bs: int, kelim: int):
    """Scan-form equivalent of :func:`qr_factor_partial` (same outputs
    bit-for-bit up to float reassociation)."""
    m, n = M.shape
    ridx = jnp.arange(m)
    nb = -(-kelim // bs)

    def panel_step(carry, p):
        M, taus = carry
        k0 = p * bs

        def col_step(j, cy):
            M, taus = cy
            c = k0 + j
            valid = c < kelim
            col = jnp.where(ridx >= c, M[:, c], 0.0)
            normx = jnp.sqrt(jnp.sum(col * col))
            x0 = M[jnp.minimum(c, m - 1), c]
            sgn = jnp.where(x0 >= 0, 1.0, -1.0)
            alpha = -sgn * normx
            denom = x0 - alpha
            safe = jnp.where(denom == 0, 1.0, denom)
            v = jnp.where(ridx > c, col / safe, 0.0)
            v = v.at[jnp.minimum(c, m - 1)].set(
                jnp.where(c < m, 1.0, v[jnp.minimum(c, m - 1)]))
            tau = jnp.where(
                normx == 0.0, 0.0, (alpha - x0) / jnp.where(alpha == 0,
                                                            1.0, alpha))
            tau = jnp.where(valid, tau, 0.0)
            taus = taus.at[c].set(tau)          # OOB scatter dropped
            panel = _gather_panel(M, k0, bs)
            w = jnp.matmul(v[None, :], panel, precision=HIGHEST)[0]
            colmask = jnp.arange(bs) >= j
            upd = jnp.outer(tau * v, jnp.where(colmask, w, 0.0))
            cols = k0 + jnp.arange(bs)
            M = M.at[:, cols].add(-upd, mode="drop")
            newcol = jnp.where(valid & (ridx > c), v, M[:, c])
            M = M.at[:, c].set(newcol, mode="drop")
            return M, taus

        M, taus = lax.fori_loop(0, bs, col_step, (M, taus))
        # trailing WY update, full width, masked to cols >= k0 + bs
        panel = _gather_panel(M, k0, bs)
        cidx = k0 + jnp.arange(bs)[None, :]
        V = jnp.where(ridx[:, None] > cidx, panel, 0.0)
        V = V + ((ridx[:, None] == cidx) & (cidx < kelim)).astype(M.dtype)
        tslice = taus[jnp.clip(cidx[0], 0, n - 1)] * (cidx[0] < n)
        T = _form_t(V, tslice)
        W = jnp.matmul(V.T, M, precision=HIGHEST)
        upd = jnp.matmul(V, jnp.matmul(T.T, W, precision=HIGHEST),
                         precision=HIGHEST)
        mask = (jnp.arange(n)[None, :] >= k0 + bs).astype(M.dtype)
        M = M - upd * mask
        return (M, taus), None

    (M, taus), _ = lax.scan(panel_step, (M, taus), jnp.arange(nb))
    return M, taus


def _scan_panel_vt(VR, taus, k0, bs: int, kelim: int):
    """Batched (P, m, bs) V and (P, bs) tau of the panel at dynamic k0."""
    P, m, n = VR.shape
    ridx = jnp.arange(m)[None, :, None]
    cidx = (k0 + jnp.arange(bs))[None, None, :]
    cols = jnp.clip(k0 + jnp.arange(bs), 0, n - 1)
    panel = VR[:, :, cols] * (k0 + jnp.arange(bs) < n)[None, None, :]
    V = jnp.where(ridx > cidx, panel, 0.0)
    V = V + ((ridx == cidx) & (cidx < kelim)).astype(VR.dtype)
    t = taus[:, cols] * (k0 + jnp.arange(bs) < n)[None, :]
    return V, t


def qr_qt_mul_scan(VR, taus, z, bs: int, kelim: int):
    """Scan-form of :func:`qr_qt_mul_batched`."""
    nb = -(-kelim // bs)

    def step(z, p):
        V, t = _scan_panel_vt(VR, taus, p * bs, bs, kelim)
        T = _form_t_batched(V, t)
        w = jnp.einsum("pmi,pm->pi", V, z, precision=HIGHEST)
        z = z - jnp.einsum("pmi,pi->pm", V,
                           jnp.einsum("pji,pj->pi", T, w,
                                      precision=HIGHEST),
                           precision=HIGHEST)
        return z, None

    z, _ = lax.scan(step, z, jnp.arange(nb))
    return z


def qr_q_mul_scan(VR, taus, z, bs: int, kelim: int):
    """Scan-form of :func:`qr_q_mul_batched` (reverse panel order)."""
    nb = -(-kelim // bs)

    def step(z, p):
        V, t = _scan_panel_vt(VR, taus, p * bs, bs, kelim)
        T = _form_t_batched(V, t)
        w = jnp.einsum("pmi,pm->pi", V, z, precision=HIGHEST)
        z = z - jnp.einsum("pmi,pi->pm", V,
                           jnp.einsum("pij,pj->pi", T, w,
                                      precision=HIGHEST),
                           precision=HIGHEST)
        return z, None

    z, _ = lax.scan(step, z, jnp.arange(nb), reverse=True)
    return z


@jax.jit
def qr_solve_r(VR, y, n: int = None):
    """x = R \\ y[:ncols] on the padded factor."""
    ncols = VR.shape[1]
    R = jnp.triu(VR[:ncols, :])
    return lax.linalg.triangular_solve(R, y[:ncols][:, None],
                                       left_side=True, lower=False)[:, 0]


@jax.jit
def qr_solve_rt(VR, y):
    """x = R' \\ y (for the min-norm path)."""
    ncols = VR.shape[1]
    R = jnp.triu(VR[:ncols, :])
    return lax.linalg.triangular_solve(R, y[:ncols][:, None],
                                       left_side=True, lower=False,
                                       transpose_a=True)[:, 0]
