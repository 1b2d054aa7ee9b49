"""Sim(3) similarity-transform math: state = [t(3), axis-angle(3), scale(1)].

Behavior-matched to the reference's CSim3Jacobians::TSim3
(reference include/slam/Sim3SolverBase.h:88-230): the "tRs" storage is
translation + axis-angle + linear scale; composition is
``t = t1 + s1 R1 t2, R = R1 R2, s = s1 s2``; inversion is
``s' = 1/s, R' = R^T, t' = -s' R' t``.  The vertex ⊞ composes with the
*exponential* of a 7D sim(3) tangent vector ``[u(3), w(3), lambda(1)]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import so3

_EPS = 1e-9


def compose(a, b):
    qa = so3.axis_angle_to_quat(a[3:6])
    qb = so3.axis_angle_to_quat(b[3:6])
    t = a[:3] + a[6] * so3.quat_rotate(qa, b[:3])
    aa = so3.quat_to_axis_angle(so3.quat_multiply(qa, qb))
    return jnp.concatenate([t, aa, a[6:7] * b[6:7]])


def inverse(p):
    q = so3.axis_angle_to_quat(p[3:6])
    qi = so3.quat_conjugate(q)
    s_inv = 1.0 / p[6]
    t = -s_inv * so3.quat_rotate(qi, p[:3])
    return jnp.concatenate([t, so3.quat_to_axis_angle(qi), jnp.array([s_inv])])


def relative_to(a, b):
    """b expressed in the frame of a: a^-1 * b."""
    return compose(inverse(a), b)


def _skew(w):
    return jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])


def _w_matrix(w, lam):
    """W = integral_0^1 e^(lam*tau) exp(tau [w]_x) dtau, closed form.

    Expanding the rotation exponential, W = A I + B [w]_x + C [w]_x^2 with
        A = int e^(lt) dt            = (s - 1)/l
        B = int e^(lt) sin(t h)/h dt = (a l + h (1 - b)) / (h (l^2 + h^2))
        C = int e^(lt)(1-cos(t h))/h^2 dt = (A - ((b - 1) l + a h)/(l^2+h^2)) / h^2
    where h = |w|, s = e^l, a = s sin h, b = s cos h.  Small-h / small-l use
    the Taylor limits of the defining integrals (branchless).
    """
    theta2 = jnp.sum(w * w)
    small_th = theta2 < _EPS
    theta = jnp.sqrt(jnp.where(small_th, 1.0, theta2))
    s = jnp.exp(lam)
    small_lam = jnp.abs(lam) < _EPS
    lam_safe = jnp.where(small_lam, 1.0, lam)

    A = jnp.where(small_lam, 1.0 + lam / 2.0 + lam * lam / 6.0, (s - 1.0) / lam_safe)

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + lam * lam
    c_safe = jnp.where(c < _EPS, 1.0, c)

    B_full = (a * lam + theta * (1.0 - b)) / (jnp.where(small_th, 1.0, theta) * c_safe)
    C_full = (A - ((b - 1.0) * lam + a * theta) / c_safe) / jnp.where(small_th, 1.0, theta2)

    # theta -> 0 limits: B -> int e^(lt) t dt, C -> int e^(lt) t^2/2 dt
    lam3_safe = lam_safe * lam_safe * lam_safe
    B_small = jnp.where(small_lam, 0.5 + lam / 3.0,
                        (s * (lam - 1.0) + 1.0) / (lam_safe * lam_safe))
    C_small = jnp.where(small_lam, 1.0 / 6.0 + lam / 8.0,
                        (s * (lam * lam - 2.0 * lam + 2.0) - 2.0) / (2.0 * lam3_safe))

    B = jnp.where(small_th, B_small, B_full)
    C = jnp.where(small_th, C_small, C_full)

    wx = _skew(w)
    return A * jnp.eye(3) + B * wx + C * (wx @ wx)


def exp(tangent):
    """sim(3) exponential: [u(3), w(3), lambda(1)] -> [t, aa, s]."""
    u, w, lam = tangent[:3], tangent[3:6], tangent[6]
    W = _w_matrix(w, lam)
    t = W @ u
    return jnp.concatenate([t, w, jnp.array([jnp.exp(lam)])])


def log(p):
    """Inverse of exp: [t, aa, s] -> [u, w, lambda].  Solves W u = t."""
    w = p[3:6]
    lam = jnp.log(p[6])
    W = _w_matrix(w, lam)
    u = jnp.linalg.solve(W, p[:3])
    return jnp.concatenate([u, w, jnp.array([lam])])


def boxplus(x, dx):
    """Vertex retraction: x ∘ Exp(dx) (reference CVertexSim3::Operator_Plus
    composes with an exp of the tangent delta)."""
    return compose(x, exp(dx))


def transform_point(p, x):
    """Apply the similarity transform: s R x + t."""
    q = so3.axis_angle_to_quat(p[3:6])
    return p[6] * so3.quat_rotate(q, x) + p[:3]
