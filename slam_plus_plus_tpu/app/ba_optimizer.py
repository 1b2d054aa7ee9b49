"""BAOptimizer facade — the embedding API.

Reference analogue: CBAOptimizer (reference
include/ba_interface_example/BAOptimizer.h:49, pimpl C++ facade with a C API
at :127-135) and the incremental-BA variant
(include/incremental_ba_3dv/BAOptimizer.h): a narrow interface for feeding
camera/point vertices and reprojection edges programmatically, optimizing,
and reading back states/covariances — used to embed the optimizer in SfM
front-ends.

The C-API functions of the reference (New_Optimizer, Add_XYZVertex,
Add_CamVertex, Add_P2CEdge, Optimize, ...) map 1:1 to methods here.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.graph.system import GraphSystem


class BAOptimizer:
    def __init__(self, use_schur: bool = True, verbose: bool = False):
        self.system = GraphSystem()
        self.verbose = verbose
        self.use_schur = use_schur
        self._solver = None

    # ---- vertex/edge feeding (reference C API Add_* functions) ---------

    def add_xyz_vertex(self, vertex_id: int, xyz) -> None:
        self.system.add_vertex(vertex_id, "xyz", np.asarray(xyz, float))

    def add_cam_vertex(self, vertex_id: int, pose6, intrinsics5) -> None:
        """pose6 = internal world->cam [t, axis-angle]; intrinsics5 =
        [fx fy cx cy d_scaled] (d already scaled by mean focal)."""
        state = np.concatenate([np.asarray(pose6, float),
                                np.asarray(intrinsics5, float)])
        self.system.add_vertex(vertex_id, "cam", state)

    def add_cam_vertex_g2o(self, vertex_id: int, pos3, quat_xyzw,
                           fx, fy, cx, cy, d) -> None:
        """g2o VERTEX_CAM convention (world pose + raw distortion)."""
        from slam_plus_plus_tpu.io.parser import _invert_cam_pose
        q = np.asarray(quat_xyzw, float)
        pose = _invert_cam_pose(np.asarray(pos3, float), q[0], q[1], q[2], q[3])
        intr = np.array([fx, fy, cx, cy, d * 0.5 * (fx + fy)])
        self.system.add_vertex(vertex_id, "cam", np.concatenate([pose, intr]))

    def add_p2c_edge(self, point_id: int, cam_id: int, uv, info2x2) -> None:
        self.system.add_edge("edge_p2c", (cam_id, point_id),
                             np.asarray(uv, float), np.asarray(info2x2, float))

    # ---- optimization --------------------------------------------------

    def optimize(self, max_iterations: int = 5, dx_threshold: float = 0.01,
                 solver: str = "lm"):
        """Returns (final_chi2, iterations).  solver: lm | gn | dogleg."""
        from slam_plus_plus_tpu.solvers.dogleg import DoglegSolver
        from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
        from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver
        cls = {"lm": LevenbergMarquardtSolver, "gn": GaussNewtonSolver,
               "dogleg": DoglegSolver}[solver]
        self._solver = cls(self.system)
        return self._solver.optimize(max_iterations, dx_threshold,
                                     verbose=self.verbose)

    def chi2(self) -> float:
        from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
        if self._solver is None:
            self._solver = GaussNewtonSolver(self.system)
        return self._solver.chi2()

    # ---- state access (reference r_Vertex_State / Dump_*) --------------

    def vertex_state(self, vertex_id: int) -> np.ndarray:
        return self.system.vertex_state(vertex_id).copy()

    def n_vertices(self) -> int:
        return self.system.num_vertices

    def n_edges(self) -> int:
        return self.system.num_edges

    def dump_state(self, path: str) -> None:
        self.system.dump(path)

    def dump_graph(self, path: str) -> None:
        """Re-export the graph in the g2o dialect (reference Dump_Graph)."""
        with open(path, "w") as f:
            for gid in self.system.vertex_order:
                tname, li = self.system.vertex_directory[gid]
                st = self.system.vertex_stores[tname].states[li]
                if tname == "xyz":
                    f.write(f"VERTEX_XYZ {gid} " +
                            " ".join(f"{v:.10f}" for v in st) + "\n")
                elif tname == "cam":
                    # internal -> g2o world pose
                    f.write(f"# VERTEX_CAM {gid} (internal) " +
                            " ".join(f"{v:.10f}" for v in st) + "\n")
            store = self.system.edge_stores.get("edge_p2c")
            if store is not None:
                for e in range(store.n):
                    cam, pt = store.vertex_ids[e]
                    z = store.measurements[e]
                    i = store.informations[e]
                    f.write(f"EDGE_PROJECT_P2MC {pt} {cam} {z[0]:.10f} "
                            f"{z[1]:.10f} {i[0,0]} {i[0,1]} {i[1,1]}\n")

    def covariances(self):
        """Block-diagonal marginal covariances (camera + landmark).

        Reference analogue: the covariance dumps of the incremental-BA
        facade."""
        from slam_plus_plus_tpu.assembly.assembler import Assembler
        from slam_plus_plus_tpu.marginals import Marginals
        asm = Assembler(self.system)
        bs = asm.assemble(asm.snapshot_states(self.system))
        # mono BA is gauge-deficient (scale): tiny jitter keeps Sigma finite
        return Marginals(asm, gauge_jitter=1e-10).compute(bs)
