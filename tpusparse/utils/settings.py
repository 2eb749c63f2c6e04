"""Config / flag system (SURVEY.md §5).

The reference has none — behavior is positional args (order, tol, seed).
Here one dataclass collects every knob (solver options + device tiling +
refinement), with env-var overrides for scripts, so demo/bench/CLI all
share a single config surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = ["Settings", "settings_from_env"]


@dataclass
class Settings:
    # reference-visible knobs (SURVEY.md Appendix A)
    order: int = 1              # 0 natural, 1 amd(A+A'), 2 amd(A'A-dense), 3 amd(A'A)
    tol: float = 1.0            # LU pivot threshold (host engine)
    seed: int = 0               # dmperm randperm seed
    # device knobs
    block: int = 128            # tile edge (MXU-aligned)
    dtype: str = "float32"      # device compute dtype (f64 hangs axon)
    refine_iters: int = 3       # f64 refinement sweeps
    spmv_mode: str = "auto"     # ell | bell | auto
    use_native: bool = True     # C++ host planner when built
    # mesh knobs
    mesh_devices: int = 0       # 0 = all available
    mesh_axis: str = "d"


_ENV_MAP = {
    "TPUSPARSE_ORDER": ("order", int),
    "TPUSPARSE_TOL": ("tol", float),
    "TPUSPARSE_SEED": ("seed", int),
    "TPUSPARSE_BLOCK": ("block", int),
    "TPUSPARSE_REFINE_ITERS": ("refine_iters", int),
    "TPUSPARSE_SPMV_MODE": ("spmv_mode", str),
    "TPUSPARSE_MESH_DEVICES": ("mesh_devices", int),
}


def settings_from_env(base: Settings = None) -> Settings:
    s = base or Settings()
    for env, (attr, conv) in _ENV_MAP.items():
        if env in os.environ:
            setattr(s, attr, conv(os.environ[env]))
    if os.environ.get("TPUSPARSE_NO_NATIVE"):
        s.use_native = False
    return s
