"""End-to-end coverage of the remaining model families: stereo BA,
BA-with-intrinsics, spheron, ROCV, Sim3.

Reference-binary goldens where obtainable:
  * intrinsics BA: reference LM takes alpha 11691803.04, 1 iteration,
    final 20520.96 — ours matches exactly;
  * ROCV: reference GN, 5 iterations, final 148.56 — ours matches exactly;
  * stereo BA and spheron: the reference binary SEGFAULTS on these datasets
    (its stereo/spheron paths are untested upstream — unit_tests.sh carries
    no goldens for them either); values below are our own regression
    anchors, validated by convergence to the measurement-noise floor.
"""

import numpy as np
import pytest

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver


def test_stereo_ba(tmp_path):
    cams, pts, obs = D.make_ba_scene(n_cams=8, n_points=150, seed=30)
    sobs = D.make_ba_stereo_obs(cams, pts, seed=31)
    p = str(tmp_path / "bas.txt")
    D.write_g2o_ba_stereo(p, cams, pts, sobs)
    system = parse_g2o(p)
    assert "scam" in system.vertex_stores
    lm = LevenbergMarquardtSolver(system)
    init = lm.chi2()
    assert abs(init - 33066.64) < 1.0
    chi2, iters = lm.optimize(5)
    assert chi2 < 140.0  # regression anchor 135.96


def test_intrinsics_ba(tmp_path):
    """Exact reference parity: alpha 11691803.04, 1 iteration, 20520.96."""
    cams, pts, obs = D.make_ba_scene(n_cams=8, n_points=150, seed=30)
    p = str(tmp_path / "bai.txt")
    D.write_g2o_ba_intrinsics(p, cams, pts, obs)
    system = parse_g2o(p)
    assert "intrinsics" in system.vertex_stores
    lm = LevenbergMarquardtSolver(system)
    init = lm.chi2()
    assert abs(init - 20520.957368) < 1e-3
    chi2, iters = lm.optimize(5)
    assert iters == 1  # giant initial damping -> immediate sub-threshold step
    assert abs(chi2 - 20520.96) < 0.01


def test_spheron(tmp_path):
    poses, pts, obs = D.make_spheron_scene(seed=32)
    p = str(tmp_path / "sph.txt")
    D.write_g2o_spheron(p, poses, pts, obs)
    system = parse_g2o(p)
    assert "spheron" in system.vertex_stores
    assert "xyz" in system.vertex_stores  # points auto-created from edges
    lm = LevenbergMarquardtSolver(system)
    chi2, iters = lm.optimize(5)
    assert chi2 < 1.0  # converges to the noise floor (anchor 0.394)


def test_rocv(tmp_path):
    """Exact reference parity: 5 iterations, final 148.56."""
    tx, traj, ranges, dt = D.make_rocv_scene(seed=33)
    p = str(tmp_path / "rocv.txt")
    D.write_g2o_rocv(p, tx, traj, ranges, dt)
    system = parse_g2o(p)
    assert "pos_vel3d" in system.vertex_stores
    gn = GaussNewtonSolver(system)
    init = gn.chi2()
    assert abs(init - 381.2204) < 1e-3
    chi2, iters = gn.optimize(5)
    assert iters == 5
    assert abs(chi2 - 148.5625) < 0.01


def test_sim3_pose_graph():
    """Sim3 pose-graph self-consistency: noisy Sim3 chain converges."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.graph.system import GraphSystem
    from slam_plus_plus_tpu.manifolds import sim3 as m

    rng = np.random.default_rng(44)
    import jax
    N = 12
    gt = [np.array([0.0, 0, 0, 0, 0, 0, 1.0])]
    for i in range(1, N):
        step = np.array([1.0, 0.1, 0.0, 0.02, 0.03, 0.1, 1.01])
        gt.append(np.asarray(m.compose(jnp.asarray(gt[-1]), jnp.asarray(step))))

    def rel(a, b):
        return np.array(m.relative_to(jnp.asarray(a), jnp.asarray(b)))

    system = GraphSystem()
    info = np.eye(7) * 100.0
    for i in range(N - 1):
        z = rel(gt[i], gt[i + 1])
        z[:3] += rng.normal(0, 0.01, 3)
        system.add_vertex(i, "cam_sim3",
                          np.concatenate([gt[i] + rng.normal(0, 0.01, 7)
                                          if i else gt[i],
                                          [500, 500, 320, 240, 0]]))
        system.add_vertex(i + 1, "cam_sim3",
                          np.concatenate([gt[i + 1] + rng.normal(0, 0.05, 7),
                                          [500, 500, 320, 240, 0]]))
        system.add_edge("edge_pose_cam_sim3", (i, i + 1), z, info)
    # loop closure first-last
    z = rel(gt[0], gt[N - 1])
    system.add_edge("edge_pose_cam_sim3", (0, N - 1), z, info)

    gn = GaussNewtonSolver(system)
    chi2_0 = gn.chi2()
    chi2, iters = gn.optimize(10)
    assert chi2 < chi2_0 * 0.05  # large reduction


def test_sim3_invdist_ba():
    """Inverse-distance Sim3 BA (LS + LO edges) converges."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.graph.system import GraphSystem
    from slam_plus_plus_tpu.manifolds import sim3
    from slam_plus_plus_tpu.models.sim3_types import _project_sim3
    from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver

    rng = np.random.default_rng(55)
    intr = [500.0, 500.0, 320.0, 240.0, 0.0]
    cams = [np.concatenate([[0.3 * i, 0, 0], [0, 0.02 * i, 0], [1.0], intr])
            for i in range(3)]
    pts = rng.uniform(-1, 1, (20, 3)) + [0, 0, 4]
    system = GraphSystem()
    for i, c in enumerate(cams):
        system.add_vertex(i, "cam_sim3", c)

    def proj(c, p):
        return np.asarray(_project_sim3(jnp.asarray(c), jnp.asarray(p)))

    for p in range(20):
        x = np.asarray(sim3.transform_point(jnp.asarray(cams[0][:7]),
                                            jnp.asarray(pts[p])))
        d = np.linalg.norm(x)
        q = 1.0 / d * (1 + rng.normal(0, 0.02))
        system.add_vertex(3 + p, "inv_dist4", np.concatenate([x / d, [q]]))
        for ci in range(3):
            uv = proj(cams[ci], pts[p]) + rng.normal(0, 0.3, 2)
            if ci == 0:
                system.add_edge("edge_p2c_invdist_ls", (0, 3 + p), uv, np.eye(2))
            else:
                system.add_edge("edge_p2c_invdist_lo", (0, ci, 3 + p), uv,
                                np.eye(2))
    lm = LevenbergMarquardtSolver(system)
    chi2_0 = lm.chi2()
    chi2, _ = lm.optimize(10)
    assert chi2 < chi2_0 * 0.5
    assert chi2 < 25.0  # near the 2-dof-per-obs noise floor


def test_sim3_angle_error_edge():
    """Angle-error reprojection edge: the reference\'s 3D cross-product
    residual (Sim3SolverBase.h:2963) — zero at ground truth, nonzero under
    perturbation."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.models.types import EDGE_TYPES

    et = EDGE_TYPES["edge_p2c_xyz_angle"]
    cam = jnp.asarray(np.concatenate([[0.1, -0.2, 0.0], [0, 0.05, 0], [1.0],
                                      [500.0, 500.0, 320.0, 240.0, 0.0]]))
    pt = jnp.asarray([0.3, 0.2, 5.0])
    from slam_plus_plus_tpu.manifolds import sim3 as m
    x = np.asarray(m.transform_point(cam[:7], pt))
    z = jnp.asarray([500.0 * x[0] / x[2] + 320.0,
                     500.0 * x[1] / x[2] + 240.0])
    r0 = float(jnp.linalg.norm(et.residual((cam, pt), z)))
    assert r0 < 1e-6
    r1 = float(jnp.linalg.norm(et.residual((cam, pt + 0.3), z)))
    assert r1 > 0.01


def test_poly_fitting_example():
    """Tutorial path: user-registered vertex/edge types fit a quartic to
    noisy samples (reference src/poly_fitting_example)."""
    from slam_plus_plus_tpu.app.poly_fitting import fit

    rng = np.random.default_rng(5)
    true_c = rng.normal(0, 1, 5)
    xs = np.linspace(-1, 1, 150)
    ys = np.polyval(true_c[::-1], xs) + rng.normal(0, 0.02, xs.shape)
    c, chi2 = fit(xs, ys)
    assert np.abs(c - true_c).max() < 0.05
    assert chi2 < 2.0 * len(xs) * 1.0  # near the noise floor


def test_se3_ternary_hyperedge(tmp_path):
    """Three-pose SE(3) hyperedge (reference CEdgePose3D_Ternary demo,
    SE3_Types.h:339): relative-motion consistency residual with REAL
    jacobians for all three poses (the reference's third jacobian is an
    identity placeholder).  Checks (a) jacfwd vs finite differences,
    (b) batch GN convergence on a chain with binary odometry + ternary
    constant-velocity priors, (c) the incremental fastL engine accepts a
    pose hyperedge (n-ary omega scatter)."""
    import jax
    import jax.numpy as jnp
    from slam_plus_plus_tpu.models.se3_types import (
        _pose3d_ternary_residual)
    from slam_plus_plus_tpu.manifolds import se3

    rng = np.random.default_rng(5)
    xs = [rng.normal(size=6) * 0.3 for _ in range(3)]
    z = rng.normal(size=6) * 0.1

    # (a) jacobian through the boxplus chart vs finite differences
    def r_of_d(d, slot):
        states = [jnp.asarray(x) for x in xs]
        states[slot] = se3.boxplus(states[slot], d)
        return _pose3d_ternary_residual(tuple(states), jnp.asarray(z))

    for slot in range(3):
        J = jax.jacfwd(lambda d: r_of_d(d, slot))(jnp.zeros(6))
        eps = 1e-6
        for k in range(6):
            d = np.zeros(6)
            d[k] = eps
            fd = (np.asarray(r_of_d(jnp.asarray(d), slot)) -
                  np.asarray(r_of_d(jnp.asarray(-d), slot))) / (2 * eps)
            assert np.allclose(np.asarray(J)[:, k], fd, atol=1e-4), \
                (slot, k)

    # (b) batch: noisy chain, odometry + ternary smoothness edges
    poses, edges = D.make_sphere_3d(n_poses=40, trans_noise=0.02,
                                    rot_noise=0.01, seed=11)
    p = str(tmp_path / "tern.txt")
    D.write_g2o_3d(p, edges, poses)
    n = len(parse_g2o(p).vertex_order)   # actual pose count in the file
    info_u = " ".join(["20 0 0 0 0 0 20 0 0 0 0 20 0 0 0 20 0 0 20 0 20"])
    with open(p, "a") as f:
        for i in range(0, n - 2, 3):
            f.write(f"EDGE3:TERNARY {i} {i+1} {i+2} 0 0 0 0 0 0 "
                    f"{info_u}\n")
    system = parse_g2o(p)
    assert "edge_pose3d_ternary" in system.edge_stores
    gn = GaussNewtonSolver(system)
    init = gn.chi2()
    chi2, _ = gn.optimize(10)
    assert np.isfinite(chi2) and chi2 < init

    # (c) incremental fastL replay accepts the hyperedge
    from slam_plus_plus_tpu.solvers.fastl import FastLSolver
    system2 = parse_g2o(p)
    fl = FastLSolver(system2, every_n=1)
    chi2_fl, _ = fl.run()
    assert np.isfinite(chi2_fl)
