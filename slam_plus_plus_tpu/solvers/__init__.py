from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver, optimize

__all__ = ["GaussNewtonSolver", "optimize"]
