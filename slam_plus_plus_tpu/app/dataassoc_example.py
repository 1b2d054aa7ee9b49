"""Marginals-driven data-association demo (end-to-end).

Reference analogue: src/slam_dataassoc_example/Main.cpp and the
slam_compact_pose_ijrr association loop — run an incremental solver with
maintained marginal covariances, then test candidate associations between
the current pose and earlier poses under the POSTERIOR: the relative-pose
distribution (evaluation/distances.py, reference include/slam/Distances.h)
is reduced by a distance transform to 4D [x y z theta] and gated.

Pipeline:
  1. incremental FastL replay with MarginalsPolicy(enabled) — the solver
     maintains per-vertex covariance diagonals inside the loop
     (update-vs-recalculate decisions logged in marginals_trace);
  2. for the query pose, relative_pose_distribution vs every candidate
     from the MAINTAINED sigma;
  3. rotation-magnitude (or view-direction) transform + Mahalanobis-style
     gate -> association decisions.

Usage:  python -m slam_plus_plus_tpu.app.dataassoc_example [g2o-file]
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from slam_plus_plus_tpu.config import MarginalsPolicy, SolverConfig
from slam_plus_plus_tpu.evaluation.distances import (
    mahalanobis_distance2, mahalanobis_gate, relative_pose_distribution,
    rotation_magnitude_transform, view_direction_transform)
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.solvers.fastl import FastLSolver


def run_association(system: GraphSystem, query: int,
                    candidates: List[int],
                    gate=(1.0, 1.0, 1.0, 0.5),
                    transform: str = "rotation_magnitude",
                    verbose: bool = False):
    """Returns (decisions, solver): decisions[i] = (candidate_id, mean4,
    accepted) for each candidate, judged under the maintained posterior."""
    cfg = dataclasses.replace(SolverConfig(),
                              marginals=MarginalsPolicy(enabled=True))
    sv = FastLSolver(system, every_n=1, config=cfg)
    chi2, _iters = sv.run()
    sig = sv.sigma_diag()
    if sig is None:
        raise RuntimeError("marginals were not maintained")
    asm = sv.asm

    def pose_and_sigma(gid):
        tname, li = system.vertex_directory[gid]
        cs = int(asm.type_cslot[tname][li])
        x = system.vertex_stores[tname].data[li]
        d = min(asm.Bp, 6)
        return x, np.asarray(sig[cs])[:d, :d]

    xq, sq = pose_and_sigma(query)
    decisions = []
    tf = (rotation_magnitude_transform if transform == "rotation_magnitude"
          else view_direction_transform)
    for cid in candidates:
        xc, sc = pose_and_sigma(cid)
        mean, sigma = relative_pose_distribution(xq, xc, sq, sc)
        m4, s4 = tf(mean, sigma)
        s4r = s4 + 1e-9 * np.eye(4)
        ok = mahalanobis_gate(m4, s4r, np.asarray(gate))
        decisions.append((cid, m4, bool(ok), mahalanobis_distance2(m4, s4r)))
        if verbose:
            print(f"candidate {cid}: |t|={np.linalg.norm(m4[:3]):.3f} "
                  f"theta={m4[3]:.3f} -> "
                  f"{'ASSOCIATE' if ok else 'reject'}")
    return decisions, sv


def main(argv=None):
    import sys
    import slam_plus_plus_tpu.models  # noqa: F401
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o

    argv = argv if argv is not None else sys.argv[1:]
    if argv:
        path = argv[0]
    else:
        path = "/tmp/dataassoc_demo.txt"
        poses, edges = D.make_sphere_3d(n_poses=120, trans_noise=0.01,
                                        rot_noise=0.005, seed=4)
        D.write_g2o_3d(path, edges, poses)
    system = parse_g2o(path)
    n = len(system.vertex_order)
    query = system.vertex_order[-1]
    candidates = system.vertex_order[:-1][:: max(1, n // 12)]
    decisions, sv = run_association(system, query, candidates, verbose=True)
    n_acc = sum(1 for (_c, _m, ok, _d2) in decisions if ok)
    print(f"{n_acc}/{len(decisions)} candidates associated; marginals "
          f"trace: {sv.marginals_trace[:6]}...")


if __name__ == "__main__":
    main()
