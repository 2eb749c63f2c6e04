from . import config
from .config import HIGHEST, DTYPE, on_tpu, pallas_interpret
from .formats import EllMatrix, BellMatrix, to_ell, to_bell
from .spmv import SpmvPlan, spmv_plan, gaxpy_device
from .chol_tpu import TpuCholesky, plan_cholesky
from .supernodal import SupernodalCholesky, plan_supernodal
from .lu_tpu import TpuLU
from .qr_tpu import TpuQR
from .refine import refine
from . import solvers

__all__ = [
    "config", "HIGHEST", "DTYPE", "on_tpu", "pallas_interpret",
    "EllMatrix", "BellMatrix", "to_ell", "to_bell",
    "SpmvPlan", "spmv_plan", "gaxpy_device",
    "TpuCholesky", "plan_cholesky", "SupernodalCholesky", "plan_supernodal", "TpuLU", "TpuQR", "refine", "solvers",
]
