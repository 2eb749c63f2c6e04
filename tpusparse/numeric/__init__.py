from .chol import Numeric, chol, updown
from .lu import lu
from .qr import house, happly, qr
from .trisolve import lsolve, ltsolve, usolve, utsolve, spsolve
from .solvers import cholsol, lusol, qrsol

__all__ = [
    "Numeric", "chol", "updown", "lu", "house", "happly", "qr",
    "lsolve", "ltsolve", "usolve", "utsolve", "spsolve",
    "cholsol", "lusol", "qrsol",
]
