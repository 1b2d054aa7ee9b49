"""Robust kernel wiring: per-edge-type losses, overrides, IRLS behavior.

Reference analogue: the robust mixin zoo (reference
include/slam/RobustUtils.h:368-502 + include/geometry/RobustLoss.h:55-393)
and the reweighted GN (IRLS) driven by Notify_LinearizationChange
(reference include/slam/NonlinearSolver_Lambda.h:455)."""

import numpy as np
import pytest

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.evaluation.error_eval import ate_rmse
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver


def _corrupted_sphere(tmp_path, n_outliers=12, seed=55):
    """3D pose graph (robust edge type) with gross outlier closures."""
    poses, edges = D.make_sphere_3d(n_poses=150, seed=seed)
    rng = np.random.default_rng(seed + 1)
    # corrupt some loop closures with large wrong translations
    closures = [k for k, e in enumerate(edges) if abs(e[0] - e[1]) > 1]
    for k in rng.choice(closures, size=min(n_outliers, len(closures)),
                        replace=False):
        i, j, z, info = edges[k]
        z = np.array(z, copy=True)
        z[:3] += rng.normal(0, 4.0, 3)
        edges[k] = (i, j, z, info)
    p = str(tmp_path / "sph.txt")
    D.write_g2o_3d(p, edges, poses)
    return p, poses


def _run(path, gt, loss, scale=0.3):
    """Optimize the corrupted graph from a near-truth linearization point
    (the IRLS regime — redescending losses assume a reasonable init, same
    as the reference's robust mixins) and measure trajectory distortion."""
    s = parse_g2o(path)
    store = s.vertex_stores["pose3d"]
    store.states[:len(gt)] = gt  # start at ground truth
    cfg = SolverConfig(robust_overrides={"*": (loss, scale)})
    gn = GaussNewtonSolver(s, cfg)
    gn.optimize(10, 0.001)
    est = np.stack([store.states[i][:3] for i in range(len(gt))])
    return ate_rmse(est, gt[:, :3])


def test_robust_losses_beat_plain_on_outliers(tmp_path):
    path, gt = _corrupted_sphere(tmp_path)
    ate_plain = _run(path, gt, "none")
    ate_by_loss = {loss: _run(path, gt, loss)
                   for loss in ("huber", "cauchy", "tukey")}
    # every robust loss must resist the outlier distortion better than
    # plain least squares
    for loss, ate in ate_by_loss.items():
        assert ate < ate_plain, (loss, ate, ate_plain)
    # the hard redescenders should cut the distortion substantially
    assert min(ate_by_loss["cauchy"], ate_by_loss["tukey"]) < 0.5 * ate_plain


def test_all_losses_reachable(tmp_path):
    """Every registered loss builds and runs through the pipeline."""
    from slam_plus_plus_tpu.robust.losses import LOSSES
    path, gt = _corrupted_sphere(tmp_path, n_outliers=3)
    for loss in LOSSES:
        s = parse_g2o(path)
        cfg = SolverConfig(robust_overrides={"edge_pose3d": (loss, 0.3)})
        gn = GaussNewtonSolver(s, cfg)
        chi2, _ = gn.optimize(2)
        assert np.isfinite(chi2), loss


def test_type_registry_defaults_apply(tmp_path):
    """Without overrides, the edge type's registered loss/scale is used
    (huber/0.3 for edge_pose3d — the reference's CEdgePose3D tuning)."""
    path, gt = _corrupted_sphere(tmp_path, n_outliers=3)
    s1 = parse_g2o(path)
    gn1 = GaussNewtonSolver(s1)
    chi2_default, _ = gn1.optimize(5)
    s2 = parse_g2o(path)
    gn2 = GaussNewtonSolver(
        s2, SolverConfig(robust_overrides={"edge_pose3d": ("huber", 0.3)}))
    chi2_explicit, _ = gn2.optimize(5)
    assert chi2_default == pytest.approx(chi2_explicit, rel=1e-12)
