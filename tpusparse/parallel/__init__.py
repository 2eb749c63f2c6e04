from .mesh import make_mesh, P, NamedSharding
from .sharded import (ShardedSpmv, sharded_chol_factor,
                      sharded_supernodal_factor,
                      sharded_supernodal_solve,
                      sharded_superscan_factor,
                      sharded_superscan_solve,
                      sharded_superscan_lu_factor,
                      sharded_superscan_lu_solve,
                      sharded_mfqr_factor, sharded_mfqr_solve,
                      superscan_comm_metrics,
                      supernodal_comm_metrics, mfqr_comm_metrics,
                      sharded_cg)

__all__ = ["make_mesh", "P", "NamedSharding", "ShardedSpmv",
           "sharded_chol_factor", "sharded_supernodal_factor",
           "sharded_supernodal_solve", "supernodal_comm_metrics",
           "sharded_superscan_factor", "sharded_superscan_solve",
           "sharded_superscan_lu_factor", "sharded_superscan_lu_solve",
           "sharded_mfqr_factor", "sharded_mfqr_solve",
           "superscan_comm_metrics", "mfqr_comm_metrics",
           "sharded_cg"]
