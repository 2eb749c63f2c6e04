"""Device configuration: precision, backend detection, Pallas mode.

TPU v5 lite via axon facts baked in from the empirical probe
(BASELINE.md "Empirical device probe"):
- default matmul precision is bf16-grade -> ALWAYS use Precision.HIGHEST;
- jax_enable_x64 hangs the axon backend -> device compute stays f32 and
  reference-grade residuals come from host-f64 iterative refinement
  (tpusparse.device.refine);
- Pallas kernels run compiled on TPU, interpret=True elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["HIGHEST", "DTYPE", "IDX_DTYPE", "on_tpu", "pallas_interpret",
           "default_block", "matmul", "cdiv", "round_up"]

HIGHEST = lax.Precision.HIGHEST
DTYPE = jnp.float32
IDX_DTYPE = jnp.int32

# persistent compilation cache: axon remote compiles cost 90 s - 15 min,
# so every process shares one on-disk cache (harmless on CPU)
try:
    _cache_dir = os.environ.get(
        "TPUSPARSE_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:  # pragma: no cover
    pass


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")


@functools.lru_cache(maxsize=1)
def pallas_interpret() -> bool:
    """Pallas kernels compile only on real TPU; interpret elsewhere."""
    if os.environ.get("TPUSPARSE_FORCE_INTERPRET"):
        return True
    return not on_tpu()


def default_block() -> int:
    """Default tile edge: 128 matches the MXU systolic array."""
    return int(os.environ.get("TPUSPARSE_BLOCK", "128"))


def matmul(a, b, transpose_b: bool = False):
    """f32 matmul at HIGHEST precision (true f32 on the MXU via 3-pass
    bf16 decomposition) — required on this device, see config docstring."""
    if transpose_b:
        return lax.dot_general(a, b, (((a.ndim - 1,), (b.ndim - 1,)),
                                      (tuple(range(a.ndim - 2)),
                                       tuple(range(b.ndim - 2)))),
                               precision=HIGHEST)
    return jnp.matmul(a, b, precision=HIGHEST)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
