from .matrix import COOMatrix, CSCMatrix, coo_from_arrays, csc_from_dense
from .ops import (cumsum, transpose, add, multiply, gaxpy, norm1, permute,
                  symperm, scale_cols)
from .filter import fkeep, droptol, dropzeros, dupl
from .perm import pinv, pvec, ipvec, randperm
from .io import load, load_file, save, sprint, pprint

__all__ = [
    "COOMatrix", "CSCMatrix", "coo_from_arrays", "csc_from_dense",
    "cumsum", "transpose", "add", "multiply", "gaxpy", "norm1", "permute",
    "symperm", "scale_cols", "fkeep", "droptol", "dropzeros", "dupl",
    "pinv", "pvec", "ipvec", "randperm", "load", "load_file", "save",
    "sprint", "pprint",
]
