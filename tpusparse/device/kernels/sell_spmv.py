"""SELL-128 windowed-gather SpMV kernel — the general-pattern Pallas
path (VERDICT r1 item 6; reference semantics: csparse::cs_gaxpy).

Layout (host-planned once per pattern, after an RCM bandwidth-reducing
permutation):

  * rows map to LANES: block b owns 128 consecutive rows; sub-step s
    holds the s-th group of up to 8 nonzeros per row in SUBLANES —
    slab shapes (S, 8, 128) for values and window positions.  With
    mesh-like rows (~4-30 nnz) the slabs run ~90% full, unlike
    tile-based block formats whose (8,128) tiles hold a few nonzeros.
  * x is consumed through TW INDEPENDENT 1024-entry tile slots per
    block (x stored as (ntiles, 8, 128); win_ref[i, j] = absolute tile
    id of slot j).  RCM clusters a 128-row block's columns into a few
    tiles — on kNN-class graphs 3 slots cover ~100% of entries, where
    consecutive windows spilled 1-2% to the latency-dominated XLA COO
    pass (the round-3 attribution's largest permuted-space cost).
  * the Mosaic gather primitive only gathers WITHIN 128 lanes with
    idx.shape == operand.shape (measured on this toolchain), so the
    window gather decomposes into 8*TW masked lane-gathers, one per
    window sublane.

Per step: 8*TW take_along_axis + masks + fma for up to 1024 nonzeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from ..config import pallas_interpret

__all__ = ["sell_supported", "build_sell_call", "TILE"]

TILE = 1024         # one (8, 128) VMEM tile of x per window slot


def sell_supported() -> bool:
    return _HAS_PALLAS


def _kernel_v2(win_ref, pos_ref, vals_ref, x_ref, o_ref, *, S: int,
               TW: int):
    """Sublane-aligned variant: the planner places every entry at the
    slab SUBLANE equal to its x-position's sublane ((pos>>7)&7), so one
    take_along_axis per window tile gathers all 8 sublanes at once —
    TW gathers + TW selects per sub-step instead of 8*TW (the v1
    broadcast-row decomposition).  pos packs lane (bits 0-6) and the
    window SLOT (bits 10+); the sublane bits are implicit in the slot.
    Window slots are INDEPENDENT tiles (win_ref[i, j]), not a
    consecutive run — kNN-class graphs then cover ~100% of entries
    with 3 slots where consecutive windows spilled 1-2%."""
    i = pl.program_id(0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for s in range(S):
        pos = pos_ref[0, s]                     # (8, 128)
        vals = vals_ref[0, s]
        lane = pos & 127
        tl = pos >> 10
        g = jnp.zeros((8, 128), jnp.float32)
        for j in range(TW):
            gj = jnp.take_along_axis(x_ref[win_ref[i, j]], lane,
                                     axis=1)
            g = jnp.where(tl == j, gj, g)
        acc = acc + vals * g
    o_ref[0] = jnp.sum(acc, axis=0, keepdims=True)


def _kernel(win_ref, pos_ref, vals_ref, x_ref, o_ref, *, S: int, TW: int):
    i = pl.program_id(0)
    acc = jnp.zeros((8, 128), jnp.float32)
    subrows = []
    for j in range(TW):
        tile = x_ref[win_ref[i, j]]             # (8, 128), slot j
        for q in range(8):
            subrows.append(jnp.broadcast_to(
                tile[q].reshape(1, 128), (8, 128)))
    for s in range(S):
        pos = pos_ref[0, s]                     # (8, 128) in [0, TW*1024)
        vals = vals_ref[0, s]
        lane = pos & 127
        sub = pos >> 7
        g = jnp.zeros((8, 128), jnp.float32)
        for q in range(8 * TW):
            gq = jnp.take_along_axis(subrows[q], lane, axis=1)
            g = jnp.where(sub == q, gq, g)
        acc = acc + vals * g
    o_ref[0] = jnp.sum(acc, axis=0, keepdims=True)


def build_sell_call(NB: int, S: int, ntiles: int, TW: int,
                    version: int = 2):
    """pallas_call computing (NB, 1, 128) row sums from slabs + the
    tiled x (ntiles, 8, 128).  version 2 = sublane-aligned packing
    (default), 1 = broadcast-row decomposition."""
    kern = functools.partial(_kernel_v2 if version == 2 else _kernel,
                             S=S, TW=TW)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, S, 8, 128), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 8, 128), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NB, 1, 128), jnp.float32),
        grid_spec=gs,
        interpret=pallas_interpret())
