"""ATE/RPE/Kabsch tests + an end-to-end quality check: optimization must
reduce ATE vs ground truth on a noisy Manhattan dataset."""

import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.evaluation import (ate_rmse, evaluate_trajectory,
                                           kabsch_align, rpe_errors)
from slam_plus_plus_tpu.io import datasets
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 2, (40, 3))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    t = np.array([1.0, -2.0, 0.5])
    dst = (R @ pts.T).T + t
    R2, t2, s = kabsch_align(pts, dst)
    assert np.abs(R2 - R).max() < 1e-10
    assert np.abs(t2 - t).max() < 1e-10
    assert abs(s - 1.0) < 1e-12


def test_ate_zero_on_identical():
    rng = np.random.default_rng(4)
    poses = np.concatenate([rng.normal(0, 5, (30, 2)),
                            rng.uniform(-3, 3, (30, 1))], axis=1)
    assert ate_rmse(poses, poses) < 1e-12
    te, re = rpe_errors(poses, poses)
    assert te.max() < 1e-12 and re.max() < 1e-12


def test_optimization_reduces_ate(tmp_path):
    poses_gt, edges = datasets.make_manhattan_2d(n_poses=200, seed=21)
    p = str(tmp_path / "m.txt")
    datasets.write_g2o_2d(p, edges, poses_gt)
    system = parse_g2o(p)

    # odometry-composed initial states (parser ignores VERTEX lines)
    store = system.vertex_stores["pose2d"]
    est0 = store.data.copy()
    ate0 = ate_rmse(est0, poses_gt)

    gn = GaussNewtonSolver(system)
    gn.optimize(5)
    est1 = store.data.copy()
    ate1 = ate_rmse(est1, poses_gt)
    assert ate1 < ate0 * 0.5  # optimization must cut ATE at least in half
    m = evaluate_trajectory(est1, poses_gt)
    assert m["ate_rmse"] == ate1
    assert m["rpe_trans_rmse"] > 0
