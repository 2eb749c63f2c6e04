"""Pallas kernel: DIA SpMV  y = sum_d bands[d] * shift(x, off_d).

Single pass over the bands with x resident in VMEM: each grid step
computes one row block, reading the shifted x windows via REF-level
dynamic slices (supported by the axon Mosaic toolchain, unlike
value-level dynamic_slice — see memory axon-mosaic-pallas).  The XLA
fallback re-reads x once per diagonal; this kernel reads bands once and
x ~once, the true STREAM shape for the >=80%-of-HBM north star.

Select with TPUSPARSE_PALLAS_DIA=1 (off by default: x must fit VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, pallas_interpret

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["dia_spmv_pallas", "dia_supported"]

_RB = 512                      # row block (lanes, multiple of 128)


def dia_supported(npad: int) -> bool:
    """x (padded) must fit comfortably in VMEM alongside the band block."""
    return _HAS_PALLAS and npad * 4 <= 8 * 1024 * 1024


def _kernel(x_ref, bands_ref, o_ref, *, offs, lo):
    # Mosaic only lowers VMEM loads whose lane start is provably a
    # multiple of 128; DIA's unit shifts are inherently misaligned, so
    # load an ALIGNED widened window and realize the residual shift with
    # a static in-register roll.
    i = pl.program_id(0)
    base = i * _RB                              # multiple of 512
    acc = jnp.zeros((1, _RB), jnp.float32)
    for d, off in enumerate(offs):             # static unroll, ndiag small
        s = (lo + off) % 128                   # static residual shift
        start = base + (lo + off - s)          # provably 128-aligned
        xs_wide = x_ref[:, pl.ds(pl.multiple_of(start, 128), _RB + 128)]
        # left-shift by s == non-negative circular roll by width - s
        xs = (pltpu.roll(xs_wide, _RB + 128 - s, axis=1)[:, :_RB]
              if s else xs_wide[:, :_RB])
        acc = acc + bands_ref[d:d + 1, :] * xs
    o_ref[:] = acc


@functools.lru_cache(maxsize=16)
def _build(mp: int, npad: int, offs: tuple, lo: int):
    kernel = functools.partial(_kernel, offs=offs, lo=lo)
    ndiag = len(offs)
    grid = (mp // _RB,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # x: full
            pl.BlockSpec((ndiag, _RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # band block
        ],
        out_specs=pl.BlockSpec((1, _RB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.float32),
        interpret=pallas_interpret(),
    )


def dia_spmv_pallas(bands, offsets, x, m: int, n: int):
    """y = A @ x from DIA storage via the Pallas kernel.

    bands: (ndiag, m) f32; offsets: python ints; x: (n,) f32.
    """
    offs = tuple(int(o) for o in offsets)
    mp = -(-m // _RB) * _RB
    lo = max(0, -min(offs)) if offs else 0
    # widened aligned loads read RB + 128 lanes past every start
    hi = max(0, (max(offs) if offs else 0) + mp - n) + 256
    npad = -(-(lo + n + hi) // 128) * 128
    # pad x and bands on host-side jnp ops (cheap, fused)
    xp = jnp.zeros((1, npad), DTYPE).at[0, lo:lo + n].set(x)
    bp = jnp.zeros((bands.shape[0], mp), DTYPE).at[:, :m].set(bands)
    y = _build(mp, npad, offs, lo)(xp, bp)
    return y[0, :m]
