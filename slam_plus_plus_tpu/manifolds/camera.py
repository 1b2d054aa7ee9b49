"""Camera projection models for bundle adjustment.

Behavior-matched to the reference's CBAJacobians::Project_P2C
(reference include/slam/BASolverBase.h:260-330):

  * the camera vertex stores the *world-to-camera* transform
    ``x_cam = R X + t`` as ``[t(3), axis_angle(3)]`` (the g2o ``VERTEX_CAM``
    world pose is inverted at parse time);
  * intrinsics are ``[fx, fy, cx, cy, d]`` where the stored distortion ``d``
    is the raw coefficient times the mean focal length — internally
    ``k = d / (0.5 (fx + fy))``;
  * radial distortion acts on *pixel* coordinates about the principal point:
    ``uv' = c + (1 + k r^2) (uv - c)`` with ``r = |uv - c|`` in pixels.

Stereo adds the disparity coordinate ``f b / z`` (reference Project_P2SC).
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import so3


def project_p2c(cam, intrinsics, point):
    """Project world point -> distorted pixel coords.

    cam: [6] world-to-camera [t, axis-angle]; intrinsics: [5] fx fy cx cy d;
    point: [3] world position.  Returns [2] pixel coordinates.
    """
    fx, fy, cx, cy, d = (intrinsics[0], intrinsics[1], intrinsics[2],
                         intrinsics[3], intrinsics[4])
    k = d / (0.5 * (fx + fy))
    R = so3.axis_angle_to_rotmat(cam[3:6])
    x = R @ point + cam[:3]
    inv_z = 1.0 / x[2]
    u = fx * x[0] * inv_z + cx
    v = fy * x[1] * inv_z + cy
    du, dv = u - cx, v - cy
    r2 = du * du + dv * dv
    w = 1.0 + k * r2
    return jnp.stack([cx + w * du, cy + w * dv])


def project_p2sc(cam, intrinsics, point):
    """Stereo projection -> [u, v, u - f*b/z] (reference Project_P2SC).

    intrinsics: [5] fx fy cx cy baseline (stereo cameras carry the baseline in
    the distortion slot; no radial distortion on the stereo path).
    """
    fx, fy, cx, cy, b = (intrinsics[0], intrinsics[1], intrinsics[2],
                         intrinsics[3], intrinsics[4])
    R = so3.axis_angle_to_rotmat(cam[3:6])
    x = R @ point + cam[:3]
    inv_z = 1.0 / x[2]
    u = fx * x[0] * inv_z + cx
    v = fy * x[1] * inv_z + cy
    u_right = fx * (x[0] - b) * inv_z + cx
    return jnp.stack([u, v, u_right])


def project_spheron(cam, point):
    """Spherical (omnidirectional) projection: unit direction vector residual
    domain (reference Project_P2S, EDGE_SPHERON_XYZ).  Returns the [3] unit
    bearing of the point in the camera frame.
    """
    R = so3.axis_angle_to_rotmat(cam[3:6])
    x = R @ point + cam[:3]
    n = jnp.linalg.norm(x)
    return x / jnp.where(n < 1e-12, 1.0, n)


def world_pose_to_cam(position, quat_xyzw, invert: bool = True):
    """Convert a g2o VERTEX_CAM world pose (position + xyzw quaternion) to the
    internal world-to-camera [t, axis-angle] representation."""
    q = jnp.concatenate([quat_xyzw[3:4], quat_xyzw[:3]])  # -> wxyz
    q = q / jnp.linalg.norm(q)
    if invert:
        qi = so3.quat_conjugate(q)
        t = -so3.quat_rotate(qi, position)
        return jnp.concatenate([t, so3.quat_to_axis_angle(qi)])
    return jnp.concatenate([position, so3.quat_to_axis_angle(q)])


def cam_to_world_pose(cam):
    """Inverse of world_pose_to_cam: [6] -> (position[3], quat_xyzw[4])."""
    q = so3.axis_angle_to_quat(cam[3:6])
    qi = so3.quat_conjugate(q)
    pos = -so3.quat_rotate(qi, cam[:3])
    return pos, jnp.concatenate([qi[1:], qi[:1]])
