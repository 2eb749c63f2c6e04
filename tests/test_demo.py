"""Demo-suite regression: the reference's acceptance behavior
(SURVEY.md §4 — residuals ~1e-14 or better on the demo matrices, error
paths on the structurally singular one)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DATA = os.path.join(REPO, "data")

sys.path.insert(0, REPO)

from tpusparse.demo import demo2, demo3, get_problem, rhs, is_sym, make_sym
from tpusparse.core import csc_from_dense


def _ensure_data():
    if not os.path.exists(os.path.join(DATA, "t1")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "demo", "gen_matrices.py")],
                       check=True)


def load_problem(name, tol=1e-14):
    _ensure_data()
    with open(os.path.join(DATA, name)) as fh:
        return get_problem(fh, tol=tol)


RESID_TOL = 1e-12


@pytest.mark.parametrize("name", ["t1", "bcsstk01", "fs_183_1", "west0479"])
def test_demo2_square_full_rank(name, capsys):
    prob = load_problem(name, tol=0.0 if name == "t1" else 1e-14)
    results = demo2(prob)
    kinds = {k for k, *_ in results}
    assert "qr" in kinds and "lu" in kinds
    for kind, order, ok, resid in results:
        assert ok, (name, kind, order)
        assert resid < RESID_TOL, (name, kind, order, resid)


def test_demo2_spd_has_chol(capsys):
    prob = load_problem("bcsstk01")
    assert prob.sym == -1
    results = demo2(prob)
    chol_rows = [r for r in results if r[0] == "chol"]
    assert len(chol_rows) == 2
    for _, order, ok, resid in chol_rows:
        assert ok and resid < RESID_TOL


def test_demo2_least_squares(capsys):
    # rectangular: QR only; the LS residual is nonzero but x must be the
    # minimizer (checked in test_numeric); here just exercise the flow
    prob = load_problem("ash219")
    results = demo2(prob)
    assert all(k == "qr" for k, *_ in results)
    assert all(ok for _, _, ok, _ in results)


def test_demo2_structurally_singular_skips_lu(capsys):
    prob = load_problem("mbeacxc")
    results = demo2(prob)
    # sprank < n: only the QR rows may appear (reference demo2 contract)
    assert all(k == "qr" for k, *_ in results)


def test_demo3_updown(capsys):
    prob = load_problem("bcsstk01")
    resids = demo3(prob)
    assert len(resids) == 4
    assert all(r < RESID_TOL for r in resids)


def test_is_sym_make_sym():
    d = np.array([[2.0, 0.0], [1.0, 3.0]])
    A = csc_from_dense(d)          # lower stored
    assert is_sym(A) == -1
    C = make_sym(A)
    assert np.allclose(C.todense(), [[2.0, 1.0], [1.0, 3.0]])


def test_demo1_script_runs():
    _ensure_data()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "demo", "cs_demo1.py"),
         os.path.join(DATA, "t1")],
        capture_output=True, text=True, check=True)
    assert "C = A*A':" in out.stdout
    assert "4-by-4" in out.stdout


def test_demo3_tpu_engine(capsys):
    prob = load_problem("bcsstk01")
    resids = demo3(prob, engine="tpu")
    assert len(resids) == 4
    assert all(r < RESID_TOL for r in resids)


def test_demo2_tpu_engine(capsys):
    from tpusparse.device import solvers as dev_solvers
    prob = load_problem("bcsstk01")
    results = demo2(prob, engine=dev_solvers)
    for kind, order, ok, resid in results:
        assert ok, (kind, order)
        assert resid < RESID_TOL, (kind, order, resid)
