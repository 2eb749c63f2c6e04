"""Checkpoint / resume: serialize symbolic plans and numeric factors.

The reference has no checkpointing (SURVEY.md §5); its closest analog is
that css/csn objects ARE reusable artifacts (factor once, solve many).
Here those artifacts — the host Symbolic plan, host Numeric factors, the
device CholPlan and factored tile pool — are plain arrays, so they
round-trip through one .npz file and a factorization can be resumed in a
fresh process without re-running symbolic analysis or numeric factors.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..core.matrix import CSCMatrix
from ..numeric.chol import Numeric
from ..symbolic.plan import Symbolic

__all__ = ["save_symbolic", "load_symbolic", "save_numeric", "load_numeric",
           "save_chol_factor", "load_chol_factor",
           "save_superscan_factor", "load_superscan_factor",
           "save_superscan_lu_factor", "load_superscan_lu_factor",
           "save_sparse_qr_factor", "load_sparse_qr_factor",
           "save_mfqr_factor", "load_mfqr_factor"]

_OPT_FIELDS = ("pinv", "q", "parent", "cp", "leftmost")


def _csc_to_dict(prefix: str, A: Optional[CSCMatrix]) -> dict:
    if A is None:
        return {}
    d = {f"{prefix}_indptr": A.indptr, f"{prefix}_indices": A.indices,
         f"{prefix}_shape": np.array([A.m, A.n])}
    if A.data is not None:
        d[f"{prefix}_data"] = A.data
    return d


def _csc_from_dict(prefix: str, z) -> Optional[CSCMatrix]:
    if f"{prefix}_indptr" not in z:
        return None
    m, n = z[f"{prefix}_shape"]
    return CSCMatrix(int(m), int(n), z[f"{prefix}_indptr"],
                     z[f"{prefix}_indices"],
                     z[f"{prefix}_data"] if f"{prefix}_data" in z else None)


def save_symbolic(path: str, S: Symbolic) -> None:
    d = {"m2": np.array([S.m2]), "lnz": np.array([S.lnz]),
         "unz": np.array([S.unz])}
    for f in _OPT_FIELDS:
        v = getattr(S, f)
        if v is not None:
            d[f] = np.asarray(v)
    np.savez_compressed(path, **d)


def load_symbolic(path: str) -> Symbolic:
    z = np.load(path)
    S = Symbolic(m2=int(z["m2"][0]), lnz=int(z["lnz"][0]),
                 unz=int(z["unz"][0]))
    for f in _OPT_FIELDS:
        if f in z:
            setattr(S, f, z[f])
    return S


def save_numeric(path: str, N: Numeric) -> None:
    d = {}
    d.update(_csc_to_dict("L", N.L))
    d.update(_csc_to_dict("U", N.U))
    if N.pinv is not None:
        d["pinv"] = np.asarray(N.pinv)
    if N.B is not None:
        d["B"] = np.asarray(N.B)
    np.savez_compressed(path, **d)


def load_numeric(path: str) -> Numeric:
    z = np.load(path)
    return Numeric(L=_csc_from_dict("L", z), U=_csc_from_dict("U", z),
                   pinv=z["pinv"] if "pinv" in z else None,
                   B=z["B"] if "B" in z else None)


def save_chol_factor(path: str, F) -> None:
    """Persist a factored TpuCholesky: plan arrays + device tile pool."""
    plan = F.plan
    if F.pool is None:
        raise ValueError("factor() first")
    d = {
        "n": np.array([plan.n]), "B": np.array([plan.B]),
        "nb": np.array([plan.nb]),
        "diag_id": plan.diag_id,
        "pool": np.asarray(F.pool),
        "flops_true": np.array([plan.flops_true]),
        "flops_padded": np.array([plan.flops_padded]),
        "lnz": np.array([plan.lnz]),
        "meta": np.frombuffer(json.dumps({
            "off_rows": [x.tolist() for x in plan.off_rows],
            "off_ids": [x.tolist() for x in plan.off_ids],
            "upd_dst": [x.tolist() for x in plan.upd_dst],
            "upd_a": [x.tolist() for x in plan.upd_a],
            "upd_b": [x.tolist() for x in plan.upd_b],
        }).encode(), dtype=np.uint8),
    }
    if plan.perm is not None:
        d["perm"] = plan.perm
        d["pinv"] = plan.pinv
    np.savez_compressed(path, **d)


def load_chol_factor(path: str, A: CSCMatrix):
    """Restore a factored TpuCholesky bound to matrix A (for refinement)."""
    import jax.numpy as jnp

    from ..device.chol_tpu import (CholPlan, TpuCholesky, _solve_fn,
                                   _solve_fn_scan)

    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    plan = CholPlan(
        n=int(z["n"][0]), B=int(z["B"][0]), nb=int(z["nb"][0]),
        perm=z["perm"] if "perm" in z else None,
        pinv=z["pinv"] if "pinv" in z else None,
        diag_id=z["diag_id"],
        off_ids=[np.asarray(x, np.int64) for x in meta["off_ids"]],
        off_rows=[np.asarray(x, np.int64) for x in meta["off_rows"]],
        upd_dst=[np.asarray(x, np.int64) for x in meta["upd_dst"]],
        upd_a=[np.asarray(x, np.int64) for x in meta["upd_a"]],
        upd_b=[np.asarray(x, np.int64) for x in meta["upd_b"]],
        pool_init=np.zeros((1, 1, 1), np.float32),
        flops_true=int(z["flops_true"][0]),
        flops_padded=int(z["flops_padded"][0]),
        lnz=int(z["lnz"][0]))
    F = TpuCholesky.__new__(TpuCholesky)
    F.A = A
    F.plan = plan
    import jax

    F._factor = None                      # already factored
    mk = (_solve_fn_scan if plan.nb >= TpuCholesky.SCAN_THRESHOLD
          else _solve_fn)
    F._solve = jax.jit(mk(plan))
    F._solve_vmapped = None
    F.use_scan = plan.nb >= TpuCholesky.SCAN_THRESHOLD
    F.pool = jnp.asarray(z["pool"])
    return F


def save_superscan_factor(path: str, F) -> None:
    """Persist a factored SuperscanCholesky: the packed row pools + the
    plan parameters needed to verify a resume.  The (deterministic)
    schedule is re-planned on load — at scale the numeric factor and its
    compile dominate, which is what resuming skips."""
    if F.pools is None:
        raise ValueError("factor() first")
    plan = F.plan
    d = {"perm": plan.perm, "n": np.array([plan.n]),
         "flops_true": np.array([plan.flops_true]),
         "lnz": np.array([plan.lnz])}
    for pw, v in F.pools.items():
        d[f"pool_{pw}"] = np.asarray(v)
    np.savez_compressed(path, **d)


def load_superscan_factor(path: str, A: CSCMatrix, **plan_kwargs):
    """Restore a factored SuperscanCholesky bound to matrix A.  The plan
    is rebuilt (deterministic for the same A and parameters) and checked
    against the stored permutation/shape before the pools are injected."""
    import jax.numpy as jnp

    from ..device.superscan import SuperscanCholesky
    z = np.load(path)
    F = SuperscanCholesky(A, **plan_kwargs)
    if int(z["n"][0]) != F.plan.n or not np.array_equal(
            z["perm"], F.plan.perm):
        raise ValueError("checkpoint does not match this matrix/plan")
    pools = {}
    for pw in F.plan.pool_init:
        key = f"pool_{pw}"
        if key not in z or z[key].shape != F.plan.pool_init[pw].shape:
            raise ValueError("checkpoint pool shapes do not match")
        pools[pw] = jnp.asarray(z[key])
    F.pools = pools
    return F


def save_superscan_lu_factor(path: str, F) -> None:
    """Persist a factored SuperscanLU: the mirrored L/U row pools plus
    the plan identity (perm, n) and the pivot-perturbation count."""
    if F.pools is None:
        raise ValueError("factor() first")
    plan = F.plan
    d = {"perm": plan.perm, "n": np.array([plan.n]),
         "perturbed": np.array([F.perturbed]),
         "lnz": np.array([plan.lnz]),
         "tol": np.array([F.tol])}
    if F._match_p is not None:
        d["match_p"] = F._match_p
    for (side, pw), v in F.pools.items():
        d[f"pool_{side}_{pw}"] = np.asarray(v)
    np.savez_compressed(path, **d)


def load_superscan_lu_factor(path: str, A: CSCMatrix, **plan_kwargs):
    """Restore a factored SuperscanLU bound to matrix A: the plan and
    initial value scatter are rebuilt (deterministic), the factored
    pools injected — skipping the numeric factorization and its device
    compiles."""
    import jax.numpy as jnp

    from ..device.superscan_lu import SuperscanLU
    z = np.load(path)
    if "tol" in z:
        plan_kwargs.setdefault("tol", float(z["tol"][0]))
    F = SuperscanLU(A, **plan_kwargs)
    if int(z["n"][0]) != F.plan.n or not np.array_equal(
            z["perm"], F.plan.perm):
        raise ValueError("checkpoint does not match this matrix/plan")
    ck_match = z["match_p"] if "match_p" in z else None
    here = F._match_p
    if (ck_match is None) != (here is None) or (
            ck_match is not None and not np.array_equal(ck_match, here)):
        raise ValueError("checkpoint matching permutation does not "
                         "match this matrix (numerical transversal "
                         "diverged)")
    pools = {}
    for side in ("L", "U"):
        for pw in F.plan.pool_init:
            key = f"pool_{side}_{pw}"
            if (key not in z
                    or z[key].shape != F.plan.pool_init[pw].shape):
                raise ValueError("checkpoint pool shapes do not match")
            pools[(side, pw)] = jnp.asarray(z[key])
    F.pools = pools
    F.perturbed = int(z["perturbed"][0])
    return F


def save_sparse_qr_factor(path: str, F) -> None:
    """Persist a SparseQR (Q-less R of A'A): delegates to the superscan
    checkpoint of the inner Cholesky of A'A."""
    if not F.rank_ok:
        raise ValueError("rank-deficient factor cannot be checkpointed")
    save_superscan_factor(path, F.F)


def save_mfqr_factor(path: str, F) -> None:
    """Persist a factored MultifrontalQR: the front pools (V below the
    diagonal, R on/above) and taus per bucket, plus the plan identity
    (column perm, n).  The schedule is re-planned on load."""
    if F.pools is None:
        raise ValueError("factor() first")
    plan = F.plan
    d = {"q": plan.q, "n": np.array([plan.n]), "m": np.array([plan.m]),
         "rank_ok": np.array([1 if F.rank_ok else 0])}
    for b in plan.buckets:
        key = f"{b[0]}_{b[1]}"
        d[f"pool_{key}"] = np.asarray(F.pools[b])
        d[f"taus_{key}"] = np.asarray(F.taus[b])
    np.savez_compressed(path, **d)


def load_mfqr_factor(path: str, A: CSCMatrix, **plan_kw):
    """Restore a factored MultifrontalQR bound to matrix A: the plan is
    rebuilt (deterministic), factored pools + taus injected — skipping
    the numeric factorization and its device compiles."""
    import jax.numpy as jnp

    from ..device.mfqr import MultifrontalQR
    z = np.load(path)
    F = MultifrontalQR(A, **plan_kw)
    if (int(z["n"][0]) != F.plan.n or int(z["m"][0]) != F.plan.m
            or not np.array_equal(z["q"], F.plan.q)):
        raise ValueError("checkpoint does not match this matrix/plan")
    pools, taus = {}, {}
    for b in F.plan.buckets:
        key = f"{b[0]}_{b[1]}"
        if (f"pool_{key}" not in z
                or z[f"pool_{key}"].shape != F.plan.pool_init[b].shape):
            raise ValueError("checkpoint pool shapes do not match")
        pools[b] = jnp.asarray(z[f"pool_{key}"])
        taus[b] = jnp.asarray(z[f"taus_{key}"])
    F.pools, F.taus = pools, taus
    # Older checkpoints predate the rank_ok field: fall back to re-running
    # the rdiag min-|diag| check so a singular factor cannot round-trip as
    # rank-OK (solve_ls would silently return inf/nan).
    if "rank_ok" in z:
        F.rank_ok = bool(int(z["rank_ok"][0]))
    else:
        F.rank_ok = F._check_rank()
    return F


def load_sparse_qr_factor(path: str, A: CSCMatrix, **superscan_kw):
    """Restore a SparseQR bound to A without re-running the numeric
    factorization: A'A and the plan are rebuilt, pools injected."""
    from ..core.ops import multiply, transpose
    from ..device.qr_tpu import SparseQR
    F = SparseQR.__new__(SparseQR)
    F.A = A
    F.At = transpose(A, values=True)
    F.AtA = multiply(F.At, A)
    F.F = load_superscan_factor(path, F.AtA, order=1, **superscan_kw)
    F.rank_ok = True
    return F
