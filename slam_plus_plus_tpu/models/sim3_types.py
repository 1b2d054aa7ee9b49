"""Sim(3) incremental-SfM types (reference include/slam/Sim3_Types.h).

Round-1 subset: the Sim3 camera vertex, Sim3 pose-pose edge, and the XYZ
"other-observing" reprojection edge — the core of the incremental-BA-3dv
pipeline.  The reference declares ~30 edge permutations ({XYZ, InvDepth,
InvDist} x {self, other} x {with/without intrinsics} x {pixel/angle error},
Sim3_Types.h:247-3598); the remaining permutations are follow-on work and
share all math below.

Conventions:
  * cam_sim3 vertex stores 12: [t(3) aa(3) s(1)] (world->camera Sim3, tRs) +
    intrinsics [fx fy cx cy d'] (Sim3_Types.h:178 CVertexCamSim3); tangent 7,
    ⊞ composes with Exp of the sim(3) delta;
  * reprojection: point transformed by the camera Sim3 then pinhole+radial
    projection identical to the BA path.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import sim3, so3
from slam_plus_plus_tpu.models.types import edge_type, vertex_type


def _cam_sim3_boxplus(x, dx):
    return jnp.concatenate([sim3.boxplus(x[:7], dx), x[7:]])


CAM_SIM3 = vertex_type("cam_sim3", 12, 7, _cam_sim3_boxplus, schur_class="pose")
SIM3_POSE = vertex_type("sim3_pose", 7, 7, sim3.boxplus, schur_class="pose")
# inverse-depth (3D: [u, v, inv_depth] in owner frame) and inverse-distance
# (1D) landmarks for the LS/LO edge families
INV_DEPTH = vertex_type("inv_depth", 3, 3, lambda x, dx: x + dx,
                        schur_class="landmark")
INV_DIST = vertex_type("inv_dist", 1, 1, lambda x, dx: x + dx,
                       schur_class="landmark")


def _project_sim3(cam_state, point_world):
    """Transform by the world->camera Sim3, then pinhole + radial distortion
    (same pixel-space distortion as the BA path)."""
    x = sim3.transform_point(cam_state[:7], point_world)
    fx, fy, cx, cy, d = (cam_state[7], cam_state[8], cam_state[9],
                         cam_state[10], cam_state[11])
    k = d / (0.5 * (fx + fy))
    inv_z = 1.0 / x[2]
    u = fx * x[0] * inv_z + cx
    v = fy * x[1] * inv_z + cy
    du, dv = u - cx, v - cy
    w = 1.0 + k * (du * du + dv * dv)
    return jnp.stack([cx + w * du, cy + w * dv])


def _p2c_sim3_residual(states, z):
    cam_state, point = states
    return z - _project_sim3(cam_state, point)


EDGE_P2C_SIM3 = edge_type("edge_p2c_sim3", ("cam_sim3", "xyz"), 2, 2,
                          _p2c_sim3_residual)


def _pose_cam_sim3_residual(states, z):
    """Sim3 pose-pose edge (CEdgePoseCamSim3): r = log(z^-1 * (x0^-1 x1))."""
    x0, x1 = states
    rel = sim3.relative_to(x0[:7], x1[:7])
    z_sim = jnp.concatenate([z[:3], z[3:6], z[6:7]])
    err = sim3.compose(sim3.inverse(z_sim), rel)
    return sim3.log(err)


EDGE_POSE_CAM_SIM3 = edge_type("edge_pose_cam_sim3", ("cam_sim3", "cam_sim3"),
                               7, 7, _pose_cam_sim3_residual)


def _invdepth_to_world(owner_cam_state, lm):
    """Inverse-depth landmark [u_n, v_n, q]: the point at normalized image
    coords (u_n, v_n) and depth 1/q in the *owner* camera, mapped to world."""
    q = jnp.maximum(jnp.abs(lm[2]), 1e-12) * jnp.sign(jnp.where(lm[2] == 0, 1.0, lm[2]))
    p_cam = jnp.concatenate([lm[:2], jnp.ones(1)]) / q
    cam_to_world = sim3.inverse(owner_cam_state[:7])
    return sim3.transform_point(cam_to_world, p_cam)


def _p2c_invdepth_lo_residual(states, z):
    """Other-observing inverse-depth edge: landmark owned by cam0, observed
    by cam1 (LO family, Sim3_Types.h)."""
    owner, observer, lm = states
    pw = _invdepth_to_world(owner, lm)
    return z - _project_sim3(observer, pw)


EDGE_P2C_INVDEPTH_LO = edge_type(
    "edge_p2c_invdepth_lo", ("cam_sim3", "cam_sim3", "inv_depth"), 2, 2,
    _p2c_invdepth_lo_residual)


def _p2c_invdepth_ls_residual(states, z):
    """Self-observing inverse-depth edge: projecting into the owner itself
    (LS family) — the residual only depends on (u_n, v_n)."""
    owner, lm = states
    pw = _invdepth_to_world(owner, lm)
    return z - _project_sim3(owner, pw)


EDGE_P2C_INVDEPTH_LS = edge_type("edge_p2c_invdepth_ls", ("cam_sim3", "inv_depth"),
                                 2, 2, _p2c_invdepth_ls_residual)


def _p2c_xyz_ls_residual(states, z):
    """Self-observing XYZ edge (LS family): project a world point into the
    owner camera itself (Sim3_Types.h LS variants)."""
    owner, lm = states
    return z - _project_sim3(owner, lm)


EDGE_P2C_XYZ_LS = edge_type("edge_p2c_xyz_ls", ("cam_sim3", "xyz"), 2, 2,
                            _p2c_xyz_ls_residual)


# inverse-distance landmarks: state [dx, dy, dz, q] — a unit-ish direction in
# the OWNER camera frame (constant after init) and the optimized inverse
# distance q; tangent is 1-dof (reference CVertexInvDist, Sim3_Types.h:102,
# stores the direction as a constant alongside the 1D state)
INV_DIST4 = vertex_type("inv_dist4", 4, 1,
                        lambda x, dx: jnp.concatenate([x[:3], x[3:] + dx]),
                        schur_class="landmark")


def _invdist_to_world(owner_cam_state, lm):
    q = lm[3]
    sign = jnp.where(q == 0, 1.0, jnp.sign(q))
    q = sign * jnp.maximum(jnp.abs(q), 1e-12)
    p_cam = lm[:3] / q
    cam_to_world = sim3.inverse(owner_cam_state[:7])
    return sim3.transform_point(cam_to_world, p_cam)


def _p2c_invdist_lo_residual(states, z):
    owner, observer, lm = states
    return z - _project_sim3(observer, _invdist_to_world(owner, lm))


EDGE_P2C_INVDIST_LO = edge_type(
    "edge_p2c_invdist_lo", ("cam_sim3", "cam_sim3", "inv_dist4"), 2, 2,
    _p2c_invdist_lo_residual)


def _p2c_invdist_ls_residual(states, z):
    owner, lm = states
    return z - _project_sim3(owner, _invdist_to_world(owner, lm))


EDGE_P2C_INVDIST_LS = edge_type(
    "edge_p2c_invdist_ls", ("cam_sim3", "inv_dist4"), 2, 2,
    _p2c_invdist_ls_residual)


def _project_sim3_intr(cam_state, intr, point_world):
    """Projection with a separate intrinsics vertex (the 'I' variants)."""
    x = sim3.transform_point(cam_state[:7], point_world)
    fx, fy, cx, cy, d = intr[0], intr[1], intr[2], intr[3], intr[4]
    k = d / (0.5 * (fx + fy))
    inv_z = 1.0 / x[2]
    u = fx * x[0] * inv_z + cx
    v = fy * x[1] * inv_z + cy
    du, dv = u - cx, v - cy
    w = 1.0 + k * (du * du + dv * dv)
    return jnp.stack([cx + w * du, cy + w * dv])


def _p2ci_xyz_lo_residual(states, z):
    cam, lm, intr = states
    return z - _project_sim3_intr(cam, intr, lm)


EDGE_P2CI_XYZ_SIM3 = edge_type(
    "edge_p2ci_xyz_sim3", ("cam_sim3", "xyz", "intrinsics"), 2, 2,
    _p2ci_xyz_lo_residual)


def _angle_err_residual(states, z):
    """Angle-error variant (reference's *_AngleErr edges): 1D angular
    difference between the observation ray (z = normalized image coords)
    and the predicted camera-frame ray."""
    owner, lm = states
    x = sim3.transform_point(owner[:7], lm)
    ray = x / jnp.linalg.norm(x)
    obs = jnp.concatenate([z, jnp.ones(1)])
    obs = obs / jnp.linalg.norm(obs)
    c = jnp.clip(jnp.dot(ray, obs), -1.0, 1.0)
    return jnp.arccos(c)[None]


EDGE_P2C_XYZ_ANGLE = edge_type("edge_p2c_xyz_angle", ("cam_sim3", "xyz"),
                               1, 2, _angle_err_residual)
