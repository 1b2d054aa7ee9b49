"""Bundle-adjustment vertex/edge types (reference include/slam/BA_Types.h).

Conventions (verified):
  * cam vertex stores 11 floats: [t(3), axis-angle(3) world->cam, fx, fy, cx,
    cy, d'] where d' = d * mean focal (parse-time scaling, reference
    include/slam/Parser.h:517, ParsePrimitives.h:902-917); only the first 6
    are optimized (tangent 6), ⊞ = SE3 right-compose (BA_Types.h:54-82);
  * scam (stereo) vertex stores 12: pose(6) + [fx fy cx cy d' baseline];
  * mono projection applies pixel-space radial distortion (1 + k r^2), the
    stereo path (1 + k r) — an asymmetry present in the reference
    (BASolverBase.h Project_P2C vs Project_P2SC) that we replicate;
  * P2C residual r = z - project (BA_Types.h:92-103); stereo residual is
    [u_l, v_l, u_r] difference; spheron edge is the landmark-in-frame
    residual (BA_Types.h CEdgeSpheronXYZ).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import camera, se3, so3
from slam_plus_plus_tpu.models.types import edge_type, vertex_type


def _cam_boxplus(x, dx):
    """SE3 right-compose on the pose part; intrinsics stay constant."""
    return jnp.concatenate([se3.boxplus(x[:6], dx), x[6:]])


CAM = vertex_type("cam", 11, 6, _cam_boxplus, schur_class="pose")
SCAM = vertex_type("scam", 12, 6, _cam_boxplus, schur_class="pose")
SPHERON = vertex_type("spheron", 6, 6, se3.boxplus, schur_class="pose")
INTRINSICS = vertex_type("intrinsics", 5, 5, lambda x, dx: x + dx,
                         schur_class="pose")
XYZ = vertex_type("xyz", 3, 3, lambda x, dx: x + dx, schur_class="landmark")


def _p2c_residual(states, z):
    cam_state, point = states
    h = camera.project_p2c(cam_state[:6], cam_state[6:11], point)
    return z - h


def _p2c_init(states, z):
    cam_state, point = states
    if cam_state is None:
        cam_state = np.zeros(11)
    if point is None:
        # no reliable single-view init; place on the optical axis at unit depth
        # in front of the camera (reference initializes from parsed VERTEX_XYZ
        # in practice; BA datasets always provide landmark vertices)
        from slam_plus_plus_tpu.models.se3_types import _np_aa2q, _np_qrot
        q = _np_aa2q(np.asarray(cam_state[3:6], float))
        qi = np.concatenate([q[:1], -q[1:]])
        point = _np_qrot(qi, np.array([0.0, 0.0, 1.0]) -
                         np.asarray(cam_state[:3], float))
    return cam_state, point


EDGE_P2C = edge_type("edge_p2c", ("cam", "xyz"), 2, 2, _p2c_residual, _p2c_init)


def _p2ci_residual(states, z):
    cam_state, point, intr = states
    h = camera.project_p2c(cam_state[:6], intr, point)
    return z - h


EDGE_P2CI = edge_type("edge_p2ci", ("cam", "xyz", "intrinsics"), 2, 2,
                      _p2ci_residual)


def _p2sc_residual(states, z):
    cam_state, point = states
    fx, fy, cx, cy, d, b = (cam_state[6], cam_state[7], cam_state[8],
                            cam_state[9], cam_state[10], cam_state[11])
    k = d / (0.5 * (fx + fy))
    R = so3.axis_angle_to_rotmat(cam_state[3:6])
    t = cam_state[:3]

    def distort_uv(x):
        inv_z = 1.0 / x[2]
        u = fx * x[0] * inv_z + cx
        v = fy * x[1] * inv_z + cy
        du, dv = u - cx, v - cy
        r = jnp.sqrt(du * du + dv * dv)
        w = 1.0 + k * r  # stereo path: linear in r (reference Project_P2SC)
        return jnp.stack([cx + w * du, cy + w * dv])

    x_left = R @ point + t
    # right camera: shift the world point by -b along the camera x-axis
    x_right = R @ (point - b * R[0, :]) + t
    uv_l = distort_uv(x_left)
    uv_r = distort_uv(x_right)
    h = jnp.stack([uv_l[0], uv_l[1], uv_r[0]])
    return z - h


EDGE_P2SC = edge_type("edge_p2sc", ("scam", "xyz"), 3, 3, _p2sc_residual)


def _spheron_residual(states, z):
    pose, point = states
    h = se3.landmark_in_frame(pose, point)
    return z - h


def _spheron_init(states, z):
    """Spheron datasets carry no VERTEX_XYZ (that would flip the reference's
    peeker to BA dispatch) — points initialize from the first observation:
    world = R(pose) z + t."""
    pose, point = states
    if pose is None:
        pose = np.zeros(6)
    if point is None:
        from slam_plus_plus_tpu.models.se3_types import _np_aa2q, _np_qrot
        q = _np_aa2q(np.asarray(pose[3:6], float))
        point = _np_qrot(q, np.asarray(z, float)) + pose[:3]
    return pose, point


def _spheron_jax_init(states, z, slot):
    if slot == 0:
        return jnp.zeros(6, dtype=z.dtype)
    pose = states[0]
    q = so3.axis_angle_to_quat(pose[3:6])
    return so3.quat_rotate(q, z) + pose[:3]


EDGE_SPHERON_XYZ = edge_type("edge_spheron_xyz", ("spheron", "xyz"), 3, 3,
                             _spheron_residual, _spheron_init,
                             jax_initializer=_spheron_jax_init)
