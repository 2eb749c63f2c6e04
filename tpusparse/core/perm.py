"""Permutation vectors and gathers/scatters.

Reference: csparse::cs_pinv / cs_pinv.c, cs_pvec.c, cs_ipvec.c,
cs_randperm.c (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

__all__ = ["pinv", "pvec", "ipvec", "randperm"]

_IDX = np.int64


def pinv(p: np.ndarray) -> np.ndarray:
    """Invert a permutation vector (reference: csparse::cs_pinv)."""
    p = np.asarray(p, dtype=_IDX)
    out = np.empty_like(p)
    out[p] = np.arange(p.size, dtype=_IDX)
    return out


def pvec(p, b: np.ndarray) -> np.ndarray:
    """x = b(p) gather (reference: csparse::cs_pvec). p=None is identity."""
    b = np.asarray(b)
    if p is None:
        return b.copy()
    return b[np.asarray(p, dtype=_IDX)]


def ipvec(p, b: np.ndarray) -> np.ndarray:
    """x(p) = b scatter (reference: csparse::cs_ipvec). p=None is identity."""
    b = np.asarray(b)
    if p is None:
        return b.copy()
    out = np.empty_like(b)
    out[np.asarray(p, dtype=_IDX)] = b
    return out


def randperm(n: int, seed: int = 0):
    """Pseudo-random permutation.

    Reference: csparse::cs_randperm / cs_randperm.c — seed=0 returns None
    (natural order), seed=-1 the reverse permutation, anything else a
    Fisher–Yates shuffle seeded by ``seed``.  Used by dmperm to randomize
    matching tie-breaks.
    """
    if seed == 0:
        return None
    if seed == -1:
        return np.arange(n - 1, -1, -1, dtype=_IDX)
    rng = np.random.default_rng(abs(int(seed)))
    return rng.permutation(n).astype(_IDX)
