"""SE(2) pose math: state = [x, y, theta].

Behavior-matched to the reference's C2DJacobians
(reference include/slam/2DSolverBase.h:44-443): composition rotates the child
translation by the parent heading and adds angles; all produced angles are
wrapped into [-pi, pi]; the vertex ⊞ is plain vector addition with an angle
wrap (reference include/slam/SE2_Types.h:70-75).
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(a):
    """Wrap angle into [-pi, pi] (reference f_ClampAngle_2Pi)."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def compose(p1, p2):
    """relative_to_absolute: pose p2 expressed relative to p1 -> absolute."""
    c, s = jnp.cos(p1[2]), jnp.sin(p1[2])
    return jnp.stack([
        p1[0] + c * p2[0] - s * p2[1],
        p1[1] + s * p2[0] + c * p2[1],
        wrap_angle(p1[2] + p2[2]),
    ])


def relative_to(p1, p2):
    """absolute_to_relative: pose p2 in the frame of p1."""
    c, s = jnp.cos(p1[2]), jnp.sin(p1[2])
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    return jnp.stack([
        c * dx + s * dy,
        -s * dx + c * dy,
        wrap_angle(p2[2] - p1[2]),
    ])


def inverse(p):
    c, s = jnp.cos(p[2]), jnp.sin(p[2])
    return jnp.stack([-(c * p[0] + s * p[1]), -(-s * p[0] + c * p[1]), -p[2]])


def boxplus(x, dx):
    """Vertex retraction: plain addition + angle wrap."""
    out = x + dx
    return out.at[2].set(wrap_angle(out[2]))


def landmark_in_frame(pose, lm):
    """[2] landmark world position expressed in the pose frame."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    dx, dy = lm[0] - pose[0], lm[1] - pose[1]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy])
