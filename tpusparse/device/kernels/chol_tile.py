"""Pallas kernel: batched dense Cholesky of BxB tiles.

The panel-factorize primitive of the supernodal schedule (SURVEY.md
§7.1 stage 3, north star "dense Pallas panel-factorize + GEMM-update
kernels").  Right-looking inside VMEM: 8-wide mini-panels (VPU lane
height), each trailing update one BxB MXU matmul.  Replaces
jnp.linalg.cholesky (an XLA while-loop) inside the factorization scan;
select with TPUSPARSE_PALLAS_CHOL=1 or TpuCholesky(pallas_chol=True).

Non-SPD inputs produce NaNs (sqrt of negative), preserving the NaN-based
failure contract of TpuCholesky.factor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import HIGHEST, pallas_interpret

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["chol_tiles"]

_MINI = 8  # mini-panel width = VPU sublane height


def _chol_tile_kernel(a_ref, o_ref, *, B: int):
    M = a_ref[0]                                   # (B, B) in VMEM
    rows = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    cols8 = lax.broadcasted_iota(jnp.int32, (1, _MINI), 1)

    def panel(kb, M):
        k0 = kb * _MINI
        strip = lax.dynamic_slice(M, (0, k0), (B, _MINI))    # (B, 8)

        # factor the 8 columns of the mini-panel (unrolled, j static)
        for j in range(_MINI):
            c = k0 + j
            colv = lax.dynamic_slice(strip, (0, j), (B, 1))  # (B, 1)
            d = jnp.sqrt(lax.dynamic_slice(colv, (c, 0), (1, 1)))
            below = rows > c
            newcol = jnp.where(below, colv / d, colv)
            newcol = jnp.where(rows == c, d, newcol)
            strip = lax.dynamic_update_slice(strip, newcol, (0, j))
            # rank-1 update of the remaining panel columns c2 > c:
            # M[r, c2] -= l(r,c) * l(c2,c); the multiplier per column j2
            # is the new column's value at the column's OWN row k0+j2
            w8 = lax.dynamic_slice(newcol, (k0, 0), (_MINI, 1))
            w8 = jnp.transpose(w8)                           # (1, 8)
            umask = (jnp.arange(_MINI) > j)[None, :]
            upd = jnp.where(below, newcol, 0.0) * jnp.where(umask, w8, 0.0)
            strip = strip - upd

        M = lax.dynamic_update_slice(M, strip, (0, k0))
        # trailing update: one BxB MXU matmul, masked to columns > panel
        colids = k0 + cols8                                   # (1, 8)
        V = jnp.where(rows > colids, strip, 0.0)              # (B, 8)
        U = jnp.dot(V, V.T, precision=HIGHEST,
                    preferred_element_type=jnp.float32)       # (B, B)
        tailmask = (lax.broadcasted_iota(jnp.int32, (1, B), 1)
                    >= k0 + _MINI)
        return M - U * tailmask

    M = lax.fori_loop(0, B // _MINI, panel, M)
    # zero the strictly-upper part (the factor contract: lower triangular)
    colsB = lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rowsB = lax.broadcasted_iota(jnp.int32, (B, B), 0)
    o_ref[0] = jnp.where(rowsB >= colsB, M, 0.0)


@functools.lru_cache(maxsize=8)
def _build(B: int, nt: int):
    kernel = functools.partial(_chol_tile_kernel, B=B)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, B, B), jnp.float32),
        interpret=pallas_interpret(),
    )


def chol_tiles(tiles):
    """Batched lower-Cholesky of (nt, B, B) SPD tiles (Pallas)."""
    if not _HAS_PALLAS:
        return jnp.linalg.cholesky(tiles)
    nt, B, _ = tiles.shape
    if B % _MINI:
        return jnp.linalg.cholesky(tiles)
    return _build(B, nt)(tiles)
