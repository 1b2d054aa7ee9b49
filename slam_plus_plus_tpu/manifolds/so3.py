"""SO(3): quaternion <-> axis-angle <-> rotation-matrix conversions.

Quaternions are stored ``[w, x, y, z]``.  Conventions match the reference's
C3DJacobians (reference include/slam/3DSolverBase.h:265+, f_AxisAngle_to_Quat /
f_Quat_to_AxisAngle):

  * axis-angle -> quat normalizes the sign so that ``w >= 0`` (equivalent to
    wrapping the rotation angle into ``[-pi, pi]``);
  * quat -> axis-angle uses ``theta = 2 * atan2(|v|, w)`` on the ``w >= 0``
    representative, so recovered angles are always in ``[-pi, pi]``;
  * small angles take the Taylor limit ``sin(x/2)/x -> 1/2`` branchlessly,
    which keeps forward- and reverse-mode derivatives finite at identity.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-24  # squared-norm cutoff below which the Taylor limit is used


def _safe_norm(v, eps2=_EPS2):
    """Norm with non-NaN derivative at 0 (returns ~0 there)."""
    n2 = jnp.sum(v * v, axis=-1)
    safe = jnp.sqrt(jnp.where(n2 < eps2, 1.0, n2))
    return jnp.where(n2 < eps2, jnp.sqrt(eps2), safe), n2 < eps2


def axis_angle_to_quat(aa):
    """[3] axis-angle -> [4] quaternion (w >= 0)."""
    angle, small = _safe_norm(aa)
    half = angle * 0.5
    c = jnp.cos(half)
    # sin(angle/2)/angle; limit 1/2 at angle -> 0
    q = jnp.where(small, 0.5, jnp.sin(half) / angle)
    # sign-normalize to w >= 0 (same as wrapping angle modulo 2*pi)
    s = jnp.where(c < 0, -1.0, 1.0)
    quat = jnp.concatenate([(c * s)[None], aa * (q * s)])
    return quat / jnp.linalg.norm(quat)


def quat_to_axis_angle(q):
    """[4] quaternion -> [3] axis-angle with angle in [-pi, pi]."""
    q = jnp.where(q[0] < 0, -q, q)  # w >= 0 representative
    w = q[0]
    v = q[1:]
    vn, small = _safe_norm(v)
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(small, 2.0 / jnp.where(w < 1e-12, 1.0, w), angle / vn)
    return v * scale


def quat_multiply(a, b):
    """Hamilton product a*b, both [4] wxyz."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_conjugate(q):
    return jnp.concatenate([q[:1], -q[1:]])


def quat_rotate(q, v):
    """Rotate [3] vector v by [4] quaternion q (unit)."""
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    u = q[1:]
    w = q[0]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q):
    """[4] quaternion -> [3,3] rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array([
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ])


def rotmat_to_quat(R):
    """[3,3] rotation matrix -> [4] quaternion, w >= 0.

    Branchless Shepperd-style: compute all four candidate quaternions scaled by
    their (guaranteed-nonnegative) squared magnitudes and pick the largest.
    """
    t = jnp.trace(R)
    qw2 = jnp.maximum(0.0, 1.0 + t) / 4.0
    qx2 = jnp.maximum(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2]) / 4.0
    qy2 = jnp.maximum(0.0, 1.0 - R[0, 0] + R[1, 1] - R[2, 2]) / 4.0
    qz2 = jnp.maximum(0.0, 1.0 - R[0, 0] - R[1, 1] + R[2, 2]) / 4.0
    cands = jnp.stack([
        jnp.stack([qw2 * 4.0, R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]),
        jnp.stack([R[2, 1] - R[1, 2], qx2 * 4.0, R[1, 0] + R[0, 1], R[0, 2] + R[2, 0]]),
        jnp.stack([R[0, 2] - R[2, 0], R[1, 0] + R[0, 1], qy2 * 4.0, R[2, 1] + R[1, 2]]),
        jnp.stack([R[1, 0] - R[0, 1], R[0, 2] + R[2, 0], R[2, 1] + R[1, 2], qz2 * 4.0]),
    ])
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    best = jnp.argmax(mags)
    q = cands[best]
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[0] < 0, -q, q)


def axis_angle_to_rotmat(aa):
    return quat_to_rotmat(axis_angle_to_quat(aa))


def rotmat_to_axis_angle(R):
    return quat_to_axis_angle(rotmat_to_quat(R))
