"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusparse.core import csc_from_dense
from tpusparse.device.chol_tpu import plan_cholesky
from tpusparse.parallel import (ShardedSpmv, make_mesh, sharded_cg,
                                sharded_chol_factor)
from helpers import random_csc, random_spd, resid


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_spmv(rng):
    mesh = make_mesh(8)
    A, S = random_csc(rng, 70, 50, density=0.2)
    sp = ShardedSpmv(A, mesh)
    x = rng.normal(size=50)
    y = np.asarray(sp.apply(x))
    assert np.allclose(y, S.toarray() @ x, atol=1e-5)


def test_sharded_chol_factor_matches_single_chip(rng):
    mesh = make_mesh(4)
    n = 32
    A, S = random_spd(rng, n, density=0.3)
    plan = plan_cholesky(A, order=0, block=8)
    factor = jax.jit(sharded_chol_factor(plan, mesh))
    pool = factor(jnp.asarray(plan.pool_init))
    # reconstruct and compare with the dense Cholesky oracle
    B, nb = plan.B, plan.nb
    L = np.zeros((nb * B, nb * B))
    for k in range(nb):
        L[k*B:(k+1)*B, k*B:(k+1)*B] = np.tril(np.asarray(pool[plan.diag_id[k]]))
        for r, sid in zip(plan.off_rows[k], plan.off_ids[k]):
            L[r*B:(r+1)*B, k*B:(k+1)*B] = np.asarray(pool[sid])
    rec = (L @ L.T)[:n, :n]
    assert np.allclose(rec, S.toarray(), atol=1e-3)


def test_sharded_cg(rng):
    mesh = make_mesh(8)
    n = 64
    A, S = random_spd(rng, n, density=0.15)
    solve = sharded_cg(A, mesh, tol=1e-6, maxiter=500)
    b = rng.normal(size=n)
    x, iters, relres = solve(b)
    assert relres < 1e-5
    assert resid(S.toarray(), x, b) < 1e-5
    assert iters > 0


def test_sharded_spmv_dia(rng):
    import scipy.sparse as sp
    mesh = make_mesh(8)
    n = 96
    S = sp.diags([np.full(n, 5.0), -np.ones(n - 1), -np.ones(n - 1),
                  -np.ones(n - 12), -np.ones(n - 12)], [0, 1, -1, 12, -12],
                 format="csc")
    S.sort_indices()
    A = csc_from_dense(S.toarray())
    sp_plan = ShardedSpmv(A, mesh, mode="auto")
    assert sp_plan.mode == "dia"
    x = rng.normal(size=n)
    y = np.asarray(sp_plan.apply(x))
    assert np.allclose(y, S.toarray() @ x, atol=1e-5)


def test_sharded_supernodal_factor(rng):
    import jax
    import jax.numpy as jnp
    from tpusparse.device.supernodal import plan_supernodal, _solve_fn
    from tpusparse.parallel import sharded_supernodal_factor
    mesh = make_mesh(4)
    n = 64
    A, S = random_spd(rng, n, density=0.2)
    plan = plan_supernodal(A, order=1)
    factor = jax.jit(sharded_supernodal_factor(plan, mesh))
    pools = factor({b: jnp.asarray(v) for b, v in plan.pool_init.items()})
    # solve with the sharded-factored pools and check the residual
    solve = jax.jit(_solve_fn(plan))
    b = rng.normal(size=n)
    bp = b[plan.perm]
    xpad = np.zeros(n + 1, dtype=np.float32)
    xpad[:n] = bp
    out = np.asarray(solve(pools, jnp.asarray(xpad)), np.float64)[:n]
    x = np.zeros(n)
    x[plan.perm] = out
    assert resid(S.toarray(), x, b) < 1e-5     # raw f32, no refinement


def test_sharded_supernodal_solve_and_comm_metrics(rng):
    """VERDICT r1 item 7: the SOLVE's per-level batches are sharded too,
    and the structural comm accounting reports ICI volume."""
    import jax
    import jax.numpy as jnp
    from tpusparse.device.supernodal import plan_supernodal
    from tpusparse.parallel import (sharded_supernodal_factor,
                                    sharded_supernodal_solve,
                                    supernodal_comm_metrics)
    mesh = make_mesh(4)
    n = 96
    A, S = random_spd(rng, n, density=0.15)
    plan = plan_supernodal(A, order=1)
    factor = jax.jit(sharded_supernodal_factor(plan, mesh))
    pools = factor({b: jnp.asarray(v) for b, v in plan.pool_init.items()})
    solve = jax.jit(sharded_supernodal_solve(plan, mesh))
    b = rng.normal(size=n)
    bp = b[plan.perm]
    xpad = np.zeros(n + 1, dtype=np.float32)
    xpad[:n] = bp
    out = np.asarray(solve(pools, jnp.asarray(xpad)), np.float64)[:n]
    x = np.zeros(n)
    x[plan.perm] = out
    assert resid(S.toarray(), x, b) < 1e-5
    cm = supernodal_comm_metrics(plan, 4)
    for k in ("comm_bytes_factor", "comm_bytes_solve",
              "comm_bytes_total", "comm_bytes_per_flop",
              "compute_flops_issued"):
        assert k in cm
    assert cm["comm_bytes_total"] >= 0
    assert cm["comm_bytes_total"] == (cm["comm_bytes_factor"]
                                      + cm["comm_bytes_solve"])
    assert cm["compute_flops_issued"] == plan.flops_padded
    # a 1-device "mesh" shards everything (cnt >= 1 always): volume must
    # not DECREASE with a finer mesh threshold
    cm1 = supernodal_comm_metrics(plan, 1)
    assert cm1["comm_bytes_total"] >= cm["comm_bytes_total"]


def test_sharded_superscan_factor(rng):
    """The flagship scan engine on the mesh: unit batches sharded over
    devices, result matches the dense oracle."""
    import jax
    import jax.numpy as jnp
    from tpusparse.device.superscan import SuperscanCholesky
    from tpusparse.parallel import (sharded_superscan_factor,
                                    superscan_comm_metrics)
    mesh = make_mesh(4)
    n = 80
    A, S = random_spd(rng, n, density=0.15)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    factor = sharded_superscan_factor(F.plan, mesh)
    pools = factor({pw: jnp.asarray(v)
                    for pw, v in F.plan.pool_init.items()})
    F.pools = pools
    b = rng.normal(size=n)
    x = F.solve_host(b)
    assert resid(S.toarray(), x, b) < 1e-12
    cm = superscan_comm_metrics(F.plan, 4)
    assert cm["comm_bytes_total"] >= 0
    assert cm["compute_flops_issued"] == F.plan.flops_padded


def test_sharded_superscan_factor_aggregated(rng, monkeypatch):
    """TPUSPARSE_AGG=1 on the mesh: the updg/upda phases shard their
    unit batches (padded to the mesh size) and the per-step scratch
    carry threads through the sharded scan body."""
    import jax.numpy as jnp
    from tpusparse.device.superscan import SuperscanCholesky
    from tpusparse.parallel import sharded_superscan_factor
    monkeypatch.setenv("TPUSPARSE_AGG", "1")
    mesh = make_mesh(4)
    n = 80
    A, S = random_spd(rng, n, density=0.15)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    kinds = {k[0] for s in F.plan.segments for k in s.xs}
    assert "updg" in kinds and "upda" in kinds
    factor = sharded_superscan_factor(F.plan, mesh)
    pools = factor({pw: jnp.asarray(v)
                    for pw, v in F.plan.pool_init.items()})
    F.pools = pools
    b = rng.normal(size=n)
    x = F.solve_host(b)
    assert resid(S.toarray(), x, b) < 1e-12


def test_sharded_superscan_solve_matches_single_chip(rng):
    """VERDICT r2 item 4: the device-resident solve sharded over the
    mesh must match the single-chip solve bit-for-bit-ish and report
    nonzero solve comm."""
    import jax.numpy as jnp
    from tpusparse.device.refine import refine
    from tpusparse.device.superscan import SuperscanCholesky
    from tpusparse.parallel import (sharded_superscan_factor,
                                    sharded_superscan_solve,
                                    superscan_comm_metrics)
    mesh = make_mesh(4)
    n = 240
    A, S = random_spd(rng, n, density=0.06)
    F = SuperscanCholesky(A, order=1, wmax=8, tau=0.9, small_w=4)
    factor = sharded_superscan_factor(F.plan, mesh)
    F.pools = factor({pw: jnp.asarray(v)
                      for pw, v in F.plan.pool_init.items()})
    b = rng.normal(size=n)
    x_single = F._solve_f32(b)
    solve_f32 = sharded_superscan_solve(F, mesh)
    x_sharded = solve_f32(b)
    assert np.allclose(x_single, x_sharded, rtol=1e-5, atol=1e-6)
    x_ref = refine(A, solve_f32, b)
    assert resid(S.toarray(), x_ref, b) < 1e-12
    cm = superscan_comm_metrics(F.plan, 4)
    assert cm["comm_bytes_solve"] > 0
    assert cm["comm_bytes_factor"] > 0
    assert cm["comm_bytes_total"] == (cm["comm_bytes_factor"]
                                      + cm["comm_bytes_solve"])


def test_sharded_superscan_lu_factor_and_solve(rng):
    """Sparse LU on the mesh: unit batches of BOTH mirrored pools
    sharded, factor matches the single-chip pools through the
    device-resident solve, sharded solve matches single-chip, and the
    structural comm model reports LU factor traffic at 2x chol's."""
    import jax.numpy as jnp
    from tpusparse.core import csc_from_dense
    from tpusparse.device.refine import refine
    from tpusparse.device.superscan_lu import SuperscanLU
    from tpusparse.parallel import (sharded_superscan_lu_factor,
                                    sharded_superscan_lu_solve,
                                    superscan_comm_metrics)
    mesh = make_mesh(4)
    n = 120
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.08)
    d += np.diag(np.abs(d).sum(1) + 1.0)
    A = csc_from_dense(d)
    F = SuperscanLU(A, order=1, wmax=16, tau=0.9, small_w=4)
    F.pools = sharded_superscan_lu_factor(F, mesh)()
    b = rng.normal(size=n)
    x_single = F._solve_f32(b)
    solve_f32 = sharded_superscan_lu_solve(F, mesh)
    x_sharded = solve_f32(b)
    assert np.allclose(x_single, x_sharded, rtol=1e-5, atol=1e-6)
    x_ref = refine(A, solve_f32, b)
    assert resid(d, x_ref, b) < 1e-12
    cm_lu = superscan_comm_metrics(F.plan, 4, lu=True)
    cm_ch = superscan_comm_metrics(F.plan, 4)
    assert cm_lu["comm_bytes_factor"] == 2 * cm_ch["comm_bytes_factor"]
    assert cm_lu["comm_bytes_solve"] == cm_ch["comm_bytes_solve"]


def test_sharded_superscan_lu_pivoted(rng):
    """Within-panel threshold pivoting (tol=1) survives the sharded
    factor path: the one-hot pivot matrices live in the U pool's diag
    slots and the sharded update GEMMs must respect them."""
    from tpusparse.core import csc_from_dense
    from tpusparse.device.superscan_lu import SuperscanLU
    from tpusparse.parallel import sharded_superscan_lu_factor
    mesh = make_mesh(4)
    n = 90
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.1)
    d += np.diag(np.abs(d).sum(1) + 1.0)
    d[11, 11] = 1e-14                      # weak diagonal entry
    A = csc_from_dense(d)
    F = SuperscanLU(A, order=1, wmax=16, tol=1.0, match=False)
    F.pools = sharded_superscan_lu_factor(F, mesh)()
    b = rng.normal(size=n)
    x = F.solve(b)
    assert resid(d, x, b) < 1e-12


def test_sharded_mfqr_matches_single_chip(rng):
    """Sharded multifrontal QR: factor + one-pass LS solve on the mesh
    reproduce the single-chip engine's refined solution, and the comm
    model reports nonzero bytes once batches exceed the mesh."""
    from tpusparse.device.mfqr import MultifrontalQR
    from tpusparse.parallel import (mfqr_comm_metrics,
                                    sharded_mfqr_factor,
                                    sharded_mfqr_solve)
    import scipy.sparse as sp

    from tpusparse.core import CSCMatrix
    mesh = make_mesh(4)
    g = 16                       # 2D-grid LS: many independent leaf
    n = g * g                    # fronts, so batches exceed the mesh
    m = 2 * n
    main = 4.0 * np.ones(n)
    ex = -np.ones(n - 1)
    ex[np.arange(1, n) % g == 0] = 0.0
    ey = -np.ones(n - g)
    L = sp.diags([main, ex, ex, ey, ey], [0, 1, -1, g, -g], format="csc")
    S = sp.vstack([L, 0.5 * sp.eye(n)], format="csc")
    S.sort_indices()
    A = CSCMatrix(m, n, S.indptr, S.indices, S.data)
    d = S.toarray()
    F0 = MultifrontalQR(A)
    assert F0.factor()
    xstar = rng.normal(size=n)
    b = d @ xstar
    x_ref = F0.solve_ls(b)

    F = MultifrontalQR(A)
    pools0 = {bk: jnp.asarray(v) for bk, v in F.plan.pool_init.items()}
    taus0 = {bk: jnp.zeros((F.plan.bucket_count[bk], bk[1]),
                           jnp.float32) for bk in F.plan.buckets}
    factor = jax.jit(sharded_mfqr_factor(F, mesh))
    F.pools, F.taus = factor(pools0, taus0)
    F.rank_ok = True
    solve_f32 = sharded_mfqr_solve(F, mesh)
    x = np.zeros(n)
    for _ in range(4):
        x = x + solve_f32(b - d @ x)
    assert np.abs(x - xstar).max() < 1e-10
    assert np.abs(x - x_ref).max() < 1e-9
    cm = mfqr_comm_metrics(F.plan, 4)
    assert cm["comm_bytes_factor"] > 0
    assert cm["comm_bytes_solve"] > 0


def test_graft_dryrun_contract():
    """The driver's multichip dryrun must keep passing (tight refined
    asserts + nonzero comm).  Run in a SUBPROCESS exactly like the
    driver does — the dryrun's mesh programs in-process destabilize
    later XLA:CPU compiles (observed segfault in full-suite runs)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, __file__.rsplit("/", 2)[0] + "/__graft_entry__.py"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "dryrun_multichip(8): ok" in out.stdout
