from slam_plus_plus_tpu.parallel.dist import (
    DistributedAssembler, DistributedSchurSolver, make_edge_mesh)

__all__ = ["DistributedAssembler", "DistributedSchurSolver",
           "make_edge_mesh"]
