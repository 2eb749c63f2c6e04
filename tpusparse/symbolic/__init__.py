from .etree import etree, post, tdfs, counts, ereach, leaf
from .reach import dfs, reach
from .amd import amd
from .rcm import rcm
from .dmperm import DmPermResult, maxtrans, scc, dmperm, sprank
from .plan import Symbolic, schol, sqr

__all__ = [
    "etree", "post", "tdfs", "counts", "ereach", "leaf", "dfs", "reach",
    "amd", "rcm", "DmPermResult", "maxtrans", "scc", "dmperm", "sprank",
    "Symbolic", "schol", "sqr",
]
