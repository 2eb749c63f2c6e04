"""tpusparse — a TPU-native sparse direct-solver framework.

From-scratch re-design of the capabilities of rwl/CSparse.py (Tim Davis's
CSparse): host symbolic planning (etree/AMD/dmperm/...) + device numeric
kernels (Pallas/XLA supernodal factorization, batched solves, SpMV).

Layers (see SURVEY.md):
  tpusparse.core      — COO/CSC containers + sparse BLAS (host)
  tpusparse.symbolic  — etree, counts, reach, AMD, dmperm/scc/maxtrans
  tpusparse.numeric   — host f64 chol/lu/qr engine (reference-grade)
  tpusparse.device    — TPU engine: Pallas/XLA kernels, f32+refinement
  tpusparse.parallel  — multi-chip sharding (jax.sharding / shard_map)
  tpusparse.api       — cs_* compatibility surface
"""

__version__ = "0.1.0"

from . import core, symbolic, numeric
from .core import COOMatrix, CSCMatrix, csc_from_dense
from .symbolic import schol, sqr, amd, dmperm, scc, maxtrans, etree
from .numeric import chol, lu, qr, cholsol, lusol, qrsol, updown

__all__ = [
    "core", "symbolic", "numeric", "COOMatrix", "CSCMatrix",
    "csc_from_dense", "schol", "sqr", "amd", "dmperm", "scc", "maxtrans",
    "etree", "chol", "lu", "qr", "cholsol", "lusol", "qrsol", "updown",
]
