from slam_plus_plus_tpu.graph.system import GraphSystem

__all__ = ["GraphSystem"]
