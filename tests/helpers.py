"""Shared test utilities: random matrix generators with scipy oracles."""

import numpy as np
import scipy.sparse as sp

from tpusparse.core import CSCMatrix


def random_csc(rng, m, n, density=0.2, values=True):
    S = sp.random(m, n, density=density, random_state=np.random.RandomState(
        rng.integers(2**31)), format="csc")
    S.sort_indices()
    A = CSCMatrix(m, n, S.indptr, S.indices, S.data if values else None)
    return A, S


def random_spd(rng, n, density=0.3):
    """Random sparse SPD matrix (B'B + n*I)."""
    S = sp.random(n, n, density=density, random_state=np.random.RandomState(
        rng.integers(2**31)), format="csc")
    M = (S.T @ S + n * sp.eye(n)).tocsc()
    M.sort_indices()
    return CSCMatrix(n, n, M.indptr, M.indices, M.data), M


def resid(A_dense, x, b):
    """Reference acceptance metric: ||Ax-b||_inf / (||A||_1 ||x||_inf + ||b||_inf)."""
    r = A_dense @ x - b
    denom = (np.abs(A_dense).sum(axis=0).max() * np.abs(x).max()
             + np.abs(b).max())
    return np.abs(r).max() / denom if denom else np.abs(r).max()
