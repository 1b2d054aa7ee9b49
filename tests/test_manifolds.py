"""Manifold math unit tests: conversions, group identities, jacobians.

Mirrors the role of the reference's numerical-vs-analytic jacobian checks
(reference include/slam/Derivatives.h) as pytest property tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.manifolds import se2, se3, so3


RNG = np.random.default_rng(42)


def rand_aa(scale=2.5):
    return jnp.asarray(RNG.uniform(-scale, scale, 3))


def rand_pose():
    return jnp.concatenate([jnp.asarray(RNG.normal(0, 2.0, 3)), rand_aa()])


class TestSO3:
    def test_quat_roundtrip(self):
        for _ in range(20):
            aa = rand_aa(3.0)
            q = so3.axis_angle_to_quat(aa)
            assert abs(float(jnp.linalg.norm(q)) - 1) < 1e-12
            aa2 = so3.quat_to_axis_angle(q)
            # representations may differ by 2*pi wrap; compare rotations
            q2 = so3.axis_angle_to_quat(aa2)
            assert float(jnp.abs(q - q2).max()) < 1e-10

    def test_rotmat_roundtrip(self):
        for _ in range(20):
            aa = rand_aa()
            R = so3.axis_angle_to_rotmat(aa)
            assert float(jnp.abs(R @ R.T - jnp.eye(3)).max()) < 1e-12
            assert abs(float(jnp.linalg.det(R)) - 1) < 1e-12
            q1 = so3.axis_angle_to_quat(aa)
            q2 = so3.rotmat_to_quat(R)
            assert float(jnp.abs(jnp.abs(jnp.dot(q1, q2)) - 1)) < 1e-12

    def test_quat_rotate_matches_matrix(self):
        for _ in range(10):
            aa = rand_aa()
            v = jnp.asarray(RNG.normal(0, 1, 3))
            q = so3.axis_angle_to_quat(aa)
            R = so3.quat_to_rotmat(q)
            assert float(jnp.abs(so3.quat_rotate(q, v) - R @ v).max()) < 1e-12

    def test_small_angle_derivative_finite(self):
        J = jax.jacfwd(so3.axis_angle_to_quat)(jnp.zeros(3))
        assert bool(jnp.all(jnp.isfinite(J)))
        # d(quat)/d(aa) at 0 = [0; I/2]
        assert float(jnp.abs(J[1:, :] - 0.5 * jnp.eye(3)).max()) < 1e-6


class TestSE3:
    def test_compose_inverse(self):
        for _ in range(10):
            p = rand_pose()
            ident = se3.compose(p, se3.inverse(p))
            assert float(jnp.abs(ident).max()) < 1e-10

    def test_relative_consistency(self):
        # compose(p1, relative_to(p1, p2)) == p2 (as rotations)
        for _ in range(10):
            p1, p2 = rand_pose(), rand_pose()
            rel = se3.relative_to(p1, p2)
            p2b = se3.compose(p1, rel)
            assert float(jnp.abs(p2b[:3] - p2[:3]).max()) < 1e-10
            q_a = so3.axis_angle_to_quat(p2b[3:])
            q_b = so3.axis_angle_to_quat(p2[3:])
            assert float(jnp.abs(jnp.abs(jnp.dot(q_a, q_b)) - 1)) < 1e-10

    def test_jacfwd_matches_numeric(self):
        """jacfwd through boxplus == the reference's eps=1e-9 forward diff
        (reference include/slam/3DSolverBase.h:1357-1372)."""
        p1, p2 = rand_pose(), rand_pose()

        def h(delta):
            return se3.relative_to(se3.boxplus(p1, delta), p2)

        J = jax.jacfwd(h)(jnp.zeros(6))
        eps = 1e-7
        h0 = h(jnp.zeros(6))
        for j in range(6):
            d = jnp.zeros(6).at[j].set(eps)
            col = (h(d) - h0) / eps
            assert float(jnp.abs(col - J[:, j]).max()) < 1e-5


class TestSE2:
    def test_compose_relative(self):
        a = jnp.asarray([1.0, 2.0, 0.7])
        b = jnp.asarray([-0.5, 0.3, -0.2])
        rel = se2.relative_to(a, b)
        b2 = se2.compose(a, rel)
        assert float(jnp.abs(se2.wrap_angle(b2[2] - b[2]))) < 1e-12
        assert float(jnp.abs(b2[:2] - b[:2]).max()) < 1e-12
