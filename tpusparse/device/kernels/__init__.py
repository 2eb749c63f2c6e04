from .chol_tile import chol_tiles

__all__ = ["chol_tiles"]
