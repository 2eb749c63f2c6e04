"""Pallas kernel: batched triangular solve  Y = X @ L^-T  (L lower).

The TRSM primitive of the supernodal schedule (SURVEY.md §7.1 stage 3):
right-looking over 8-wide mini-panels inside VMEM, one masked MXU matmul
per panel for the trailing update — the same structure as
kernels.chol_tile.  Two variants: ``trsm_tiles`` batches the X tiles
against ONE shared L (the fixed-tile engine's layout);
``trsm_tiles_batched`` carries a PER-SLOT L (nt, W, W) — the batched-Lkk
form the superscan trsm phases need (VERDICT r2 item 8).  Select with
TPUSPARSE_PALLAS_TRSM=1.

The panel loop is UNROLLED in Python (static slices only): the axon
Mosaic toolchain does not lower dynamic_slice on values.
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

__all__ = ["trsm_tiles", "trsm_tiles_batched"]

_MINI = 8


def _trsm_kernel(l_ref, x_ref, o_ref, *, R: int, W: int):
    o_ref[0] = _trsm_body(l_ref[:], x_ref[0], R=R, W=W)


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


# -------------------------------------------------- per-slot Lkk variant
def _trsm_kernel_b(l_ref, x_ref, o_ref, *, R: int, W: int):
    """Same mini-panel recursion as _trsm_kernel, but L comes from the
    slot's own block (l_ref blocked per grid step) — the batched-Lkk
    TRSM the superscan schedule needs (VERDICT r2 item 8: each trsm
    slot solves against ITS panel's diagonal block)."""
    l_full = l_ref[0]                              # (W, W) this slot's L
    x_full = x_ref[0]                              # (R, W)
    o_ref[0] = _trsm_body(l_full, x_full, R=R, W=W)


def _trsm_body(L, X, *, R: int, W: int):
    lrows = lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    for kb in range(W // _MINI):                   # static unroll
        k0 = kb * _MINI
        strip = X[:, k0:k0 + _MINI]                # (R, 8)
        Lcols = L[:, k0:k0 + _MINI]                # (W, 8)
        for j in range(_MINI):
            c = k0 + j
            ycol = strip[:, j:j + 1] / Lcols[c, j]
            lrow8 = Lcols[k0:k0 + _MINI, j][None, :]          # (1, 8)
            mask = (jnp.arange(_MINI) > j)[None, :]
            parts = (([strip[:, :j]] if j else []) + [ycol]
                     + ([strip[:, j + 1:]] if j + 1 < _MINI else []))
            strip = jnp.concatenate(parts, axis=1) \
                - ycol * jnp.where(mask, lrow8, 0.0)
        xparts = (([X[:, :k0]] if k0 else []) + [strip]
                  + ([X[:, k0 + _MINI:]] if k0 + _MINI < W else []))
        X = jnp.concatenate(xparts, axis=1)
        Lm = jnp.where(lrows > (k0 + _MINI - 1), Lcols, 0.0)  # (W, 8)
        upd = jnp.dot(strip, Lm.T, precision=HIGHEST,
                      preferred_element_type=jnp.float32)     # (R, W)
        X = X - upd
    return X


@functools.lru_cache(maxsize=16)
def _build_batched(R: int, W: int, nt: int):
    kernel = functools.partial(_trsm_kernel_b, R=R, W=W)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, W, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # per-slot L
            pl.BlockSpec((1, R, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, R, W), jnp.float32),
        interpret=pallas_interpret(),
    )


def trsm_tiles_batched(Lkk, X):
    """Batched Y[i] = X[i] @ Lkk[i]^-T: X (nt, R, W), Lkk (nt, W, W)
    lower — the per-slot-Lkk Pallas TRSM serving the superscan trsm
    phases (enable with TPUSPARSE_PALLAS_TRSM=1)."""
    nt, R, W = X.shape
    if (not _HAS_PALLAS) or W % _MINI or R % _MINI:
        return jax.lax.linalg.triangular_solve(
            Lkk, X, left_side=False, lower=True, transpose_a=True)
    return _build_batched(R, W, nt)(Lkk, X)
