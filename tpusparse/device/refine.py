"""Iterative refinement: f32 device factorization -> f64 residuals.

The axon backend hangs under jax_enable_x64 (BASELINE.md probe #3), so
the device factors and solves in f32 (with Precision.HIGHEST) and this
module recovers reference-grade (~1e-16) residuals by computing the
residual r = b - A x in f64 on HOST and re-solving for the correction on
device.  Classic Wilkinson iterative refinement; 2-3 iterations suffice
when kappa(A) << 1/eps_f32.

This is the framework's bridge between the reference's all-f64 contract
(demo residuals ~1e-14, SURVEY.md §4) and the TPU's f32 compute.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..core.matrix import CSCMatrix
from ..core.ops import gaxpy, norm1

__all__ = ["refine"]


def refine(A: CSCMatrix, solve_f32: Callable[[np.ndarray], np.ndarray],
           b: np.ndarray, iters: int = 3, rtol: float = 1e-14) -> np.ndarray:
    """x = refined solve of A x = b.

    solve_f32: callable returning an approximate f64 solution computed at
    f32 precision (a device solve).  Residuals are evaluated in f64 on
    host via the exact sparse gaxpy.
    """
    b = np.asarray(b, dtype=np.float64)
    x = solve_f32(b)
    nrmA = norm1(A)
    for _ in range(iters):
        r = b - gaxpy(A, x, np.zeros_like(b))        # f64 residual
        denom = nrmA * np.abs(x).max() + np.abs(b).max()
        if denom == 0 or np.abs(r).max() / denom < rtol:
            break
        x = x + solve_f32(r)
    return x
