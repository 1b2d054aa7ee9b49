"""Compact-pose distances under the posterior (marginals-driven).

Reference analogue: include/slam/Distances.h — the IJRR compact-pose-SLAM
distance machinery: the distribution of the *relative pose* between two
vertices under the current posterior (using marginal covariances), and
distance transforms reducing it to 4D [x, y, z, angle] for data-association
tests:

  * CSE3_XYZ_RotationMagnitude_DistanceTransform (:79): angle = |axis-angle|
    of the relative rotation;
  * CSE3_XYZ_ViewDirection_DistanceTransform (:145): angle between the z+
    view directions.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import se3, so3


def relative_pose_distribution(x_i, x_j, sigma_ii, sigma_jj,
                               sigma_ij=None) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of the SE3 relative pose d = x_i^-1 x_j.

    sigma_*: [6,6] marginal covariance blocks in the vertices' tangent
    spaces (from marginals); sigma_ij is the cross-covariance (None = 0,
    the conservative block-diagonal approximation the reference uses when
    only the diagonal is maintained)."""
    x_i = jnp.asarray(x_i)
    x_j = jnp.asarray(x_j)
    mean = np.asarray(se3.relative_to(x_i, x_j))

    J_i = np.asarray(jax.jacfwd(
        lambda d: se3.relative_to(se3.boxplus(x_i, d), x_j))(jnp.zeros(6)))
    J_j = np.asarray(jax.jacfwd(
        lambda d: se3.relative_to(x_i, se3.boxplus(x_j, d)))(jnp.zeros(6)))

    sigma = J_i @ np.asarray(sigma_ii) @ J_i.T + \
        J_j @ np.asarray(sigma_jj) @ J_j.T
    if sigma_ij is not None:
        c = J_i @ np.asarray(sigma_ij) @ J_j.T
        sigma = sigma + c + c.T
    return mean, sigma


def rotation_magnitude_transform(mean, sigma):
    """[x y z aa] 6D distribution -> 4D [x y z theta] (reference :79-140)."""
    mean = np.asarray(mean, float)
    sigma = np.asarray(sigma, float)
    H = np.zeros((4, 6))
    H[:3, :3] = np.eye(3)
    aa = mean[3:]
    D = np.linalg.norm(aa)
    if D > 0:
        H[3, 3:] = aa / D
    else:
        H[3, 3:] = 1.0 / np.sqrt(3.0)
    m4 = np.concatenate([mean[:3], [D]])
    return m4, H @ sigma @ H.T


def view_direction_transform(mean, sigma):
    """4D [x y z view-angle]: angle between z+ axes (reference :145-230)."""
    mean = np.asarray(mean, float)
    sigma = np.asarray(sigma, float)
    aa = jnp.asarray(mean[3:])

    def view_angle(a):
        R = so3.axis_angle_to_rotmat(a)
        ct = jnp.clip(R[2, 2], -1.0, 1.0)  # z+ . R z+
        return jnp.arccos(ct)

    ang = float(view_angle(aa))
    g = np.asarray(jax.grad(view_angle)(aa))
    H = np.zeros((4, 6))
    H[:3, :3] = np.eye(3)
    H[3, 3:] = g
    m4 = np.concatenate([mean[:3], [ang]])
    return m4, H @ sigma @ H.T


def mahalanobis_distance2(mean4, sigma4) -> float:
    """Squared Mahalanobis distance of the zero-relative-pose hypothesis."""
    d = np.asarray(mean4, float)
    try:
        return float(d @ np.linalg.solve(np.asarray(sigma4, float), d))
    except np.linalg.LinAlgError:
        return float("inf")


def mahalanobis_gate(mean4, sigma4, threshold4) -> bool:
    """Probabilistic data-association test: is the zero-distance hypothesis
    within the gate?  (The compact-pose SLAM association test.)"""
    d = np.asarray(mean4, float) - np.asarray(threshold4, float) * 0.0
    try:
        m2 = float(d @ np.linalg.solve(sigma4, d))
    except np.linalg.LinAlgError:
        return False
    thr = float(np.asarray(threshold4, float) @ np.asarray(threshold4, float))
    return m2 <= thr
