"""Checkpoint/resume, metrics, and settings subsystems (SURVEY.md §5)."""

import os

import numpy as np
import pytest

from tpusparse.core import csc_from_dense
from tpusparse.numeric import chol, lsolve, ltsolve, lu, qr
from tpusparse.symbolic import schol, sqr
from tpusparse.utils import (Metrics, Settings, Timer, flop_report,
                             load_chol_factor, load_numeric, load_symbolic,
                             save_chol_factor, save_numeric, save_symbolic,
                             settings_from_env)
from helpers import random_csc, random_spd, resid


def test_symbolic_roundtrip(tmp_path, rng):
    A, _ = random_spd(rng, 15, density=0.3)
    S = schol(1, A)
    p = str(tmp_path / "sym.npz")
    save_symbolic(p, S)
    S2 = load_symbolic(p)
    assert np.array_equal(S.pinv, S2.pinv)
    assert np.array_equal(S.parent, S2.parent)
    assert np.array_equal(S.cp, S2.cp)
    assert S.lnz == S2.lnz


def test_numeric_roundtrip_factor_once_solve_later(tmp_path, rng):
    A, Ssp = random_spd(rng, 15, density=0.3)
    S = schol(1, A)
    N = chol(A, S)
    p = str(tmp_path / "num.npz")
    save_numeric(p, N)
    N2 = load_numeric(p)
    # resume: solve with the restored factor only
    from tpusparse.core import ipvec, pvec
    b = rng.normal(size=15)
    x = ipvec(S.pinv, b)
    x = lsolve(N2.L, x)
    x = ltsolve(N2.L, x)
    x = pvec(S.pinv, x)
    assert resid(Ssp.toarray(), x, b) < 1e-13


def test_qr_numeric_roundtrip(tmp_path, rng):
    A, _ = random_csc(rng, 14, 9, density=0.4)
    Sy = sqr(0, A, qr=True)
    N = qr(A, Sy)
    p = str(tmp_path / "qr.npz")
    save_numeric(p, N)
    N2 = load_numeric(p)
    assert np.allclose(N2.U.todense(), N.U.todense())
    assert np.allclose(N2.B, N.B)


def test_device_chol_checkpoint(tmp_path, rng):
    from tpusparse.device import TpuCholesky
    A, Ssp = random_spd(rng, 24, density=0.3)
    F = TpuCholesky(A, order=1, block=8)
    assert F.factor()
    p = str(tmp_path / "dev.npz")
    save_chol_factor(p, F)
    F2 = load_chol_factor(p, A)
    b = rng.normal(size=24)
    x = F2.solve(b)
    assert resid(Ssp.toarray(), x, b) < 1e-13


def test_timer_metrics():
    t = Timer()
    with t.section("a"):
        pass
    assert "a" in t.report()
    m = Metrics().record(foo=1)
    assert '"foo": 1' in m.json()


def test_settings_env(monkeypatch):
    monkeypatch.setenv("TPUSPARSE_ORDER", "3")
    monkeypatch.setenv("TPUSPARSE_BLOCK", "64")
    s = settings_from_env()
    assert s.order == 3 and s.block == 64
    assert Settings().order == 1


def test_flop_report(rng):
    from tpusparse.device.chol_tpu import plan_cholesky
    A, _ = random_spd(rng, 32, density=0.2)
    plan = plan_cholesky(A, order=1, block=8)
    rep = flop_report(plan, 0.001)
    assert rep["gflops_true"] > 0
    assert rep["gflops_issued"] >= rep["gflops_true"]


def test_device_chol_checkpoint_scan_path(tmp_path, rng):
    # large panel count -> restored factor must use the scan solve
    from tpusparse.device import TpuCholesky
    from helpers import random_spd as _rspd
    A, Ssp = _rspd(rng, 220, density=0.05)
    F = TpuCholesky(A, order=1, block=8)
    assert F.use_scan and F.factor()
    p = str(tmp_path / "dev_scan.npz")
    save_chol_factor(p, F)
    F2 = load_chol_factor(p, A)
    assert F2.use_scan
    b = rng.normal(size=220)
    x = F2.solve(b)
    assert resid(Ssp.toarray(), x, b) < 1e-13


def test_engine_metrics(rng):
    from tpusparse.device import TpuCholesky
    from tpusparse.device.supernodal import SupernodalCholesky
    A, _ = random_spd(rng, 40, density=0.2)
    m1 = TpuCholesky(A, order=1, block=8).metrics()
    assert m1.values["chol_engine"] in ("tiled", "tiled_scan")
    assert m1.values["chol_flops_padded"] >= m1.values["chol_flops_true"]
    m2 = SupernodalCholesky(A, order=1).metrics()
    assert m2.values["chol_engine"] == "supernodal"
    assert '"chol_levels"' in m2.json()


def test_superscan_factor_checkpoint(rng, tmp_path):
    from tpusparse.core import csc_from_dense
    from tpusparse.device.superscan import SuperscanCholesky
    from tpusparse.utils.checkpoint import (load_superscan_factor,
                                            save_superscan_factor)
    n = 40
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.3)
    d = d @ d.T + n * np.eye(n)
    A = csc_from_dense(d)
    F = SuperscanCholesky(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    pth = str(tmp_path / "ss.npz")
    save_superscan_factor(pth, F)
    F2 = load_superscan_factor(pth, A, order=1, wmax=16, tau=0.9,
                               small_w=4)
    b = rng.normal(size=n)
    x = F2.solve(b)          # no re-factorization needed
    from helpers import resid
    assert resid(d, x, b) < 1e-12


def test_superscan_lu_factor_checkpoint(rng, tmp_path):
    from tpusparse.core import csc_from_dense
    from tpusparse.device.superscan_lu import SuperscanLU
    from tpusparse.utils.checkpoint import (load_superscan_lu_factor,
                                            save_superscan_lu_factor)
    n = 40
    d = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.3)
    d = d + n * np.eye(n)                 # unsymmetric, diag-dominant
    A = csc_from_dense(d)
    F = SuperscanLU(A, order=1, wmax=16, tau=0.9, small_w=4)
    assert F.factor()
    pth = str(tmp_path / "sslu.npz")
    save_superscan_lu_factor(pth, F)
    F2 = load_superscan_lu_factor(pth, A, order=1, wmax=16, tau=0.9,
                                  small_w=4)
    assert F2.perturbed == F.perturbed
    b = rng.normal(size=n)
    x = F2.solve(b)          # no re-factorization needed
    from helpers import resid
    assert resid(d, x, b) < 1e-12


def test_sparse_qr_factor_checkpoint(rng, tmp_path):
    from tpusparse.core import csc_from_dense
    from tpusparse.device.qr_tpu import SparseQR
    from tpusparse.utils.checkpoint import (load_sparse_qr_factor,
                                            save_sparse_qr_factor)
    m, n = 60, 30
    d = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.4)
    d[np.arange(n), np.arange(n)] += 5.0
    A = csc_from_dense(d)
    F = SparseQR(A, wmax=16, tau=0.9, small_w=4)
    assert F.rank_ok
    pth = str(tmp_path / "ssqr.npz")
    save_sparse_qr_factor(pth, F)
    F2 = load_sparse_qr_factor(pth, A, wmax=16, tau=0.9, small_w=4)
    b = rng.normal(size=m)
    x = F2.solve_ls(b)
    xref = np.linalg.lstsq(d, b, rcond=None)[0]
    assert np.allclose(x, xref, atol=1e-8)


def test_pallas_decision_records_cover_every_kernel():
    """Every Pallas kernel module has a decision record in
    docs/PALLAS_DECISIONS.md (VERDICT r3 item 8): default, parity
    evidence, and explicit flip criteria live there, not in lore."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    doc = (root / "docs" / "PALLAS_DECISIONS.md").read_text()
    kdir = root / "tpusparse" / "device" / "kernels"
    kernels = [p.stem for p in kdir.glob("*.py") if p.stem != "__init__"]
    assert kernels, "kernel directory moved?"
    for k in kernels:
        assert f"kernels/{k}.py" in doc, f"no decision record for {k}"
