"""Pallas kernel: batched dense Cholesky of BxB tiles.

The panel-factorize primitive of the supernodal schedule (SURVEY.md
§7.1 stage 3, north star "dense Pallas panel-factorize + GEMM-update
kernels").  Right-looking inside VMEM: 8-wide mini-panels (VPU lane
height), each trailing update one BxB MXU matmul.  Replaces
jnp.linalg.cholesky (an XLA while-loop) inside the factorization scan;
select with TPUSPARSE_PALLAS_CHOL=1 or TpuCholesky(pallas_chol=True).

The panel loop is UNROLLED in Python so every slice is static — the
axon Mosaic toolchain does not lower dynamic_slice on values
(NotImplementedError observed on hardware), so traced offsets are out.

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

    for kb in range(B // _MINI):                   # static unroll
        k0 = kb * _MINI
        strip = M[:, k0:k0 + _MINI]                # (B, 8) static slice

        # factor the 8 columns of the mini-panel (all indices static)
        for j in range(_MINI):
            c = k0 + j
            colv = strip[:, j:j + 1]               # (B, 1)
            d = jnp.sqrt(colv[c, 0])
            below = rows > c
            newcol = jnp.where(below, colv / d, colv)
            newcol = jnp.where(rows == c, d, newcol)
            # rank-1 update of the remaining panel columns c2 > c:
            # multiplier per column j2 is newcol[k0 + j2]
            w8 = newcol[k0:k0 + _MINI, 0][None, :]           # (1, 8)
            umask = (jnp.arange(_MINI) > j)[None, :]
            upd = jnp.where(below, newcol, 0.0) * jnp.where(umask, w8,
                                                            0.0)
            parts = (([strip[:, :j]] if j else []) + [newcol]
                     + ([strip[:, j + 1:]] if j + 1 < _MINI else []))
            strip = jnp.concatenate(parts, axis=1) - upd

        mparts = (([M[:, :k0]] if k0 else []) + [strip]
                  + ([M[:, k0 + _MINI:]] if k0 + _MINI < B else []))
        M = jnp.concatenate(mparts, axis=1)
        # trailing update: one BxB MXU matmul, masked to columns > panel
        colids = k0 + jnp.arange(_MINI)[None, :]
        V = jnp.where(rows > colids, strip, 0.0)              # (B, 8)
        U = jnp.dot(V, V.T, precision=HIGHEST,
                    preferred_element_type=jnp.float32)       # (B, B)
        tailmask = (jnp.arange(B)[None, :] >= k0 + _MINI)
        M = M - U * tailmask

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
