from slam_plus_plus_tpu.linalg import bsr, dense, host_solver, schur

__all__ = ["bsr", "dense", "host_solver", "schur"]
