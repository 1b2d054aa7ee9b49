"""SE(2) vertex/edge types (reference include/slam/SE2_Types.h).

Conventions (verified against the reference):
  * pose2d vertex: ⊞ = plain add + angle wrap (SE2_Types.h:70-75);
  * pose-pose edge: h = relative_to(x0, x1); r = z - h with wrapped angle
    (SE2_Types.h:305-320); chi2 = r^T Lambda r;
  * pose-landmark edge is internally *range-bearing*: XY-parsed measurements
    are converted via v_ToPolar and the information set to identity
    (SE2_Types.h:602-615) — an intentional reference behavior we replicate for
    golden-value parity; RB-parsed measurements keep their information.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import se2
from slam_plus_plus_tpu.models.types import edge_type, vertex_type

POSE2D = vertex_type("pose2d", 3, 3, se2.boxplus, schur_class="pose")
LANDMARK2D = vertex_type("landmark2d", 2, 2, lambda x, dx: x + dx,
                         schur_class="landmark")


def _pose2d_residual(states, z):
    x0, x1 = states
    h = se2.relative_to(x0, x1)
    r = z - h
    return r.at[2].set(se2.wrap_angle(r[2]))


def _pose2d_init(states, z):
    """Auto-create missing vertices at edge insertion (host-side numpy)."""
    x0, x1 = states
    if x0 is None:
        x0 = np.zeros(3)
    if x1 is None:
        c, s = np.cos(x0[2]), np.sin(x0[2])
        x1 = np.array([x0[0] + c * z[0] - s * z[1],
                       x0[1] + s * z[0] + c * z[1],
                       np.arctan2(np.sin(x0[2] + z[2]), np.cos(x0[2] + z[2]))])
    return x0, x1


def _pose2d_jax_init(states, z, slot):
    """On-device activation init: new pose composed from the other end."""
    if slot == 0:
        return jnp.zeros(3, dtype=z.dtype)
    return se2.compose(states[0], z)


EDGE_POSE2D = edge_type("edge_pose2d", ("pose2d", "pose2d"), 3, 3,
                        _pose2d_residual, _pose2d_init,
                        jax_initializer=_pose2d_jax_init)


def _rb_residual(states, z):
    """Range-bearing observation of a 2D landmark (2DSolverBase.h:443+)."""
    pose, lm = states
    de = lm[0] - pose[0]
    dn = lm[1] - pose[1]
    rng = jnp.sqrt(de * de + dn * dn)
    rng = jnp.maximum(rng, 1e-5)  # reference clamps |r| >= 1e-5
    brg = se2.wrap_angle(jnp.arctan2(dn, de) - pose[2])
    r = jnp.stack([z[0] - rng, se2.wrap_angle(z[1] - brg)])
    return r


def _rb_init(states, z):
    pose, lm = states
    if pose is None:
        pose = np.zeros(3)
    if lm is None:
        # z is [range, bearing]: landmark at pose ∘ polar offset
        ang = pose[2] + z[1]
        lm = np.array([pose[0] + z[0] * np.cos(ang), pose[1] + z[0] * np.sin(ang)])
    return pose, lm


def _rb_jax_init(states, z, slot):
    if slot == 0:
        return jnp.zeros(3, dtype=z.dtype)
    pose = states[0]
    ang = pose[2] + z[1]
    return jnp.stack([pose[0] + z[0] * jnp.cos(ang),
                      pose[1] + z[0] * jnp.sin(ang)])


EDGE_POSE_LANDMARK2D = edge_type("edge_pose_landmark2d", ("pose2d", "landmark2d"),
                                 2, 2, _rb_residual, _rb_init,
                                 jax_initializer=_rb_jax_init)


def xy_measurement_to_polar(xy: np.ndarray):
    """v_ToPolar: XY landmark offset -> [range, bearing]; information becomes
    identity (reference t_ToPolar)."""
    rng = float(np.hypot(xy[0], xy[1]))
    brg = float(np.arctan2(xy[1], xy[0]))
    return np.array([rng, brg]), np.eye(2)
