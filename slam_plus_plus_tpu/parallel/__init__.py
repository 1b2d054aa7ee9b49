from slam_plus_plus_tpu.parallel.dist import (
    DistributedAssembler, DistributedSchurSolver, make_edge_mesh)
from slam_plus_plus_tpu.parallel.sharded_ba import (
    ShardedBAOptimizer, make_lm_mesh)
from slam_plus_plus_tpu.parallel.dist_cholesky import (
    DistributedBlockCholeskySolver)
from slam_plus_plus_tpu.parallel import multihost

__all__ = ["DistributedAssembler", "DistributedSchurSolver",
           "make_edge_mesh", "ShardedBAOptimizer", "make_lm_mesh",
           "DistributedBlockCholeskySolver", "multihost"]
