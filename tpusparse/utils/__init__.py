from .profiling import Timer, Metrics, trace, flop_report
from .settings import Settings, settings_from_env
from .checkpoint import (save_symbolic, load_symbolic, save_numeric,
                         load_numeric, save_chol_factor, load_chol_factor)

__all__ = [
    "Timer", "Metrics", "trace", "flop_report",
    "Settings", "settings_from_env",
    "save_symbolic", "load_symbolic", "save_numeric", "load_numeric",
    "save_chol_factor", "load_chol_factor",
]
