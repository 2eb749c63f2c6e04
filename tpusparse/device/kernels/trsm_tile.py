"""Pallas kernel: batched triangular solve  Y = X @ L^-T  (L lower).

The TRSM primitive of the supernodal schedule (SURVEY.md §7.1 stage 3):
right-looking over 8-wide mini-panels inside VMEM, one masked MXU matmul
per panel for the trailing update — the same structure as
kernels.chol_tile.  Batched over the sub-diagonal tiles of one panel
(shared L).  Select with TPUSPARSE_PALLAS_TRSM=1.
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

__all__ = ["trsm_tiles"]

_MINI = 8


def _trsm_kernel(l_ref, x_ref, o_ref, *, R: int, W: int):
    L = l_ref[:]                                   # (W, W) lower
    X = x_ref[0]                                   # (R, W)
    lrows = lax.broadcasted_iota(jnp.int32, (W, 1), 0)

    def panel(kb, X):
        k0 = kb * _MINI
        strip = lax.dynamic_slice(X, (0, k0), (R, _MINI))    # (R, 8)
        Lcols = lax.dynamic_slice(L, (0, k0), (W, _MINI))    # (W, 8)

        # solve the 8 columns against the 8x8 diagonal of L
        for j in range(_MINI):
            c = k0 + j
            dcc = lax.dynamic_slice(Lcols, (c, j), (1, 1))   # L[c, c]
            ycol = lax.dynamic_slice(strip, (0, j), (R, 1)) / dcc
            strip = lax.dynamic_update_slice(strip, ycol, (0, j))
            # strip[:, j2] -= ycol * L[c2, c] for j2 > j (c2 = k0+j2)
            lrow8 = lax.dynamic_slice(Lcols, (k0, j), (_MINI, 1))
            lrow8 = jnp.transpose(lrow8)                     # (1, 8)
            mask = (jnp.arange(_MINI) > j)[None, :]
            strip = strip - ycol * jnp.where(mask, lrow8, 0.0)

        X = lax.dynamic_update_slice(X, strip, (0, k0))
        # trailing update: X[:, c2] -= sum_t strip[:, t] * L[c2, t]
        # for c2 > k0+7 — masked (R,8)@(8,W) MXU matmul
        Lm = jnp.where(lrows > (k0 + _MINI - 1), Lcols, 0.0)  # (W, 8)
        upd = jnp.dot(strip, Lm.T, precision=HIGHEST,
                      preferred_element_type=jnp.float32)     # (R, W)
        return X - upd

    X = lax.fori_loop(0, W // _MINI, panel, X)
    o_ref[0] = X


@functools.lru_cache(maxsize=8)
def _build(R: int, W: int, nt: int):
    kernel = functools.partial(_trsm_kernel, R=R, W=W)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # L shared
            pl.BlockSpec((1, R, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, R, W), jnp.float32),
        interpret=pallas_interpret(),
    )


def trsm_tiles(Lkk, X):
    """Batched Y = X @ Lkk^-T: X (nt, R, W), Lkk (W, W) lower (Pallas)."""
    if not _HAS_PALLAS:
        return jax.lax.linalg.triangular_solve(
            jnp.broadcast_to(Lkk, X.shape[:1] + Lkk.shape), X,
            left_side=False, lower=True, transpose_a=True)
    nt, R, W = X.shape
    if W % _MINI or R % _MINI:
        return jax.lax.linalg.triangular_solve(
            jnp.broadcast_to(Lkk, X.shape[:1] + Lkk.shape), X,
            left_side=False, lower=True, transpose_a=True)
    return _build(R, W, nt)(Lkk, X)
