from slam_plus_plus_tpu.parallel.dist import DistributedAssembler, make_edge_mesh

__all__ = ["DistributedAssembler", "make_edge_mesh"]
