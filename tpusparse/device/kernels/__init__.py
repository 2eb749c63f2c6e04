from .chol_tile import chol_tiles
from .trsm_tile import trsm_tiles

__all__ = ["chol_tiles", "trsm_tiles"]
