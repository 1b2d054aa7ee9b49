"""Incremental bundle adjustment driven by CONSISTENCY_MARKER lines.

Reference analogue: the 3DV-2017 incremental BA demo
(reference src/incremental_ba_3dv/Main.cpp:22-181): the dataset interleaves
camera/point vertices and observations with CONSISTENCY_MARKER lines; at
each marker the solver runs (dogleg in the reference) and optionally
recovers marginals.  Here the replay runs on the active-prefix machinery
(solvers/incremental.py) — one compiled step for the whole sequence.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.io.parser import parse_g2o


def parse_with_markers(path: str):
    """Parse fully (using vertex init: BA layout), recording the edge count
    at each CONSISTENCY_MARKER."""
    markers: List[int] = []

    def on_marker(system):
        markers.append(system.num_edges)

    system = parse_g2o(path, on_marker=on_marker, use_vertex_init=True)
    return system, markers


def run_incremental_ba(path: str, max_iterations: int = 5,
                       dx_threshold: float = 0.01, marginals: bool = False,
                       verbose: bool = False, solver: str = "dl"):
    """Replay the dataset, solving at each marker.  Returns
    (final_chi2, per-marker chi2 list, marginals result or None).

    solver="dl" (default, matching the reference incremental_ba_3dv demo's
    Lambda-DL): fluid relinearization + incrementally maintained Schur
    complement + maintained-state marginals.  solver="lambda": the
    active-prefix GN replay."""
    from slam_plus_plus_tpu.solvers.incremental import IncrementalSolver

    system, markers = parse_with_markers(path)
    if not markers:
        markers = [system.num_edges]

    if solver == "dl":
        from slam_plus_plus_tpu.marginals.covariance import MarginalsResult
        from slam_plus_plus_tpu.solvers.dogleg_incremental import (
            IncrementalDoglegSolver)
        s = IncrementalDoglegSolver(system, max_iterations=max_iterations,
                                    dx_threshold=dx_threshold)
        final_chi2, chi2_trace = s.run([m - 1 for m in markers],
                                       verbose=verbose)
        marg = None
        if marginals:
            p_diag, l_diag = s.marginals()
            marg = MarginalsResult(p_diag, l_diag, None)
        return final_chi2, chi2_trace, marg

    inc = IncrementalSolver(system, every_n=0)   # scheduling disabled
    asm = inc.asm
    states = asm.snapshot_states(system)

    marker_set = set(m - 1 for m in markers)     # steps are 0-based
    chi2_trace = []
    for si, step in enumerate(inc.steps):
        for (slot, gid) in step["new_vs"]:
            states = inc._activate(states, step["ename"], slot, step["li"])
        if si in marker_set:
            counts = {n: step["counts"].get(n, 0) for n in asm.edge_data}
            nap = int(inc._p_prefix[step["n_active"]])
            nal = int(inc._l_prefix[step["n_active"]])
            states, _ = inc._optimize(states, counts, nap, nal,
                                      max_iterations, dx_threshold)
            chi2 = float(asm.chi2_active(states, counts))
            chi2_trace.append(chi2)
            if verbose:
                print(f"marker @{si + 1} edges: chi2 {chi2:.3f}")

    full_counts = {n: inc.steps[-1]["counts"].get(n, 0)
                   for n in asm.edge_data}
    final_chi2 = float(asm.chi2_active(states, full_counts))
    asm.writeback_states(system, states)

    marg = None
    if marginals:
        from slam_plus_plus_tpu.marginals import Marginals
        bs = asm.assemble(states)
        marg = Marginals(asm, gauge_jitter=1e-10).compute(bs)
    return final_chi2, chi2_trace, marg


def write_incremental_ba(path: str, cams, points, obs, cams_per_chunk: int = 2,
                         point_noise: float = 0.05, seed: int = 1):
    """Write an incremental-BA dataset: cameras arrive in chunks, each chunk
    followed by its observations and a CONSISTENCY_MARKER (the 3DV layout,
    data/Readme.txt incremental BA format)."""
    rng = np.random.default_rng(seed)
    n_cams = len(cams)
    obs_by_cam = {}
    for (pid, cid, u, v) in obs:
        obs_by_cam.setdefault(cid, []).append((pid, u, v))
    noisy_pts = {p: pt + rng.normal(0, point_noise, 3)
                 for p, pt in enumerate(points)}
    with open(path, "w") as f:
        seen_pts = set()
        for c0 in range(0, n_cams, cams_per_chunk):
            for c in range(c0, min(c0 + cams_per_chunk, n_cams)):
                (pos, q, fx, fy, cx, cy, d) = cams[c]
                f.write(f"VERTEX_CAM {c} " +
                        " ".join(f"{v:.10f}" for v in pos) + " " +
                        " ".join(f"{v:.10f}" for v in q) +
                        f" {fx} {fy} {cx} {cy} {d}\n")
                for (pid, u, v) in obs_by_cam.get(c, []):
                    gid = n_cams + pid
                    if pid not in seen_pts:
                        seen_pts.add(pid)
                        f.write(f"VERTEX_XYZ {gid} " +
                                " ".join(f"{x:.10f}"
                                         for x in noisy_pts[pid]) + "\n")
                    f.write(f"EDGE_PROJECT_P2MC {gid} {c} {u:.10f} {v:.10f} "
                            f"1 0 1\n")
            f.write("CONSISTENCY_MARKER\n")
