from . import config
from .config import HIGHEST, DTYPE, on_tpu, pallas_interpret
from .formats import EllMatrix, BellMatrix, to_ell, to_bell
from .spmv import SpmvPlan, spmv_plan, gaxpy_device

__all__ = [
    "config", "HIGHEST", "DTYPE", "on_tpu", "pallas_interpret",
    "EllMatrix", "BellMatrix", "to_ell", "to_bell",
    "SpmvPlan", "spmv_plan", "gaxpy_device",
]
