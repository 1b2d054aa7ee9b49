"""Batch Gauss-Newton over the Jacobian A ("A solver").

Reference analogue: CNonlinearSolver_A (reference
include/slam/NonlinearSolver_A.h:314) — the pedagogical/benchmark solver
that assembles the rectangular Jacobian A and solves the normal equations
A^T A dx = A^T b.  On TPU the normal equations are assembled directly from
the same per-edge Jacobian products (mathematically identical; the
reference's A solver differs only in materializing A first), so this is the
lambda pipeline with the A solver's behavioral differences applied:

  * robust edge weighting is NOT applied (the reference's A solver has no
    robust hook — CBaseEdgeImpl routes robust weights through the lambda
    reduction plans only);
  * iteration semantics identical to CNonlinearSolver_A::Optimize, which
    shares CSolverOps_Base with the lambda solver.
"""

from __future__ import annotations

from typing import Optional

import dataclasses

from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver


class ASolver(GaussNewtonSolver):
    def __init__(self, system: GraphSystem, config: Optional[SolverConfig] = None):
        config = config or SolverConfig()
        config = dataclasses.replace(config, solver="a")
        super().__init__(system, config)
