"""Test config: force JAX onto a virtual 8-device CPU mesh.

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars set here are too late — but backends
initialize lazily, so jax.config.update('jax_platforms', 'cpu') before
the first device use works (and XLA_FLAGS is still read at backend init).
Real-TPU compiles go through a remote-compile relay (~90 s each), far too
slow for tests; the TPU path is exercised by bench.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Per-module compiled-program cleanup.  XLA:CPU JIT code pins mmap
# regions; the engines' module-level program caches (_JIT_CACHE etc.)
# keep every compiled executable alive for the whole pytest process, and
# the full suite approaches vm.max_map_count (65530) — observed as
# deterministic SIGSEGV inside backend_compile_and_load late in the
# suite.  Dropping the caches (and jax's own) between test modules
# bounds the live-executable set.
@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    yield
    from tpusparse.device import chol_tpu, mfqr, superscan, superscan_lu
    mfqr._K_CACHE.clear()
    superscan._JIT_CACHE.clear()
    superscan.SuperscanCholesky._UD_JIT.clear()
    superscan_lu._JIT_CACHE.clear()
    chol_tpu._SCAN_CACHE.clear()
    chol_tpu.TpuCholesky._UD_JIT.clear()
    for kmod in ("chol_tile", "dia_spmv", "trsm_tile", "sell_spmv"):
        try:
            import importlib
            m = importlib.import_module(
                f"tpusparse.device.kernels.{kmod}")
            for attr in dir(m):
                f = getattr(m, attr)
                if hasattr(f, "cache_clear"):
                    f.cache_clear()
        except Exception:
            pass
    jax.clear_caches()
