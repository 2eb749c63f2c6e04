"""Driver-contract guards: bench.py must print one valid JSON line with
the required keys; __graft_entry__ must compile single-chip and dry-run
an 8-device mesh.  Run in subprocesses with tiny shapes."""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def test_bench_json_contract():
    env = dict(os.environ)
    env.update(TPUSPARSE_BENCH_CPU="1", TPUSPARSE_BENCH_N="512",
               TPUSPARSE_BENCH_BLOCK="32", TPUSPARSE_BENCH_SPMV_N="1024",
               TPUSPARSE_BENCH_ITERS="1", TPUSPARSE_BENCH_LU_G="6",
               TPUSPARSE_BENCH_QR_M="256", TPUSPARSE_BENCH_QR_N="128")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print ONE line, got {lines}"
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in d, key
    assert d["value"] > 0
    assert d["refined_residual"] < 1e-12
    # multi-engine rows (VERDICT r3 item 7): every flagship engine has
    # a driver-parsed round-over-round metric with value semantics
    rows = d["metrics"]
    assert len(rows) >= 4
    engines = {r.get("engine") for r in rows}
    assert {"superscan_chol", "spmv", "superscan_lu",
            "mfqr"} <= engines, engines
    for r in rows:
        assert "error" not in r, r
        assert "value_semantics" in r


def test_graft_entry_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "fn, args = g.entry()\n"
        "import jax\n"
        "out = jax.jit(fn)(*args)\n"
        "import numpy as np\n"
        "assert np.all(np.isfinite(np.asarray(out)))\n"
        "print('CONTRACT_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT_OK" in out.stdout
    assert "dryrun_multichip(8): ok" in out.stdout
