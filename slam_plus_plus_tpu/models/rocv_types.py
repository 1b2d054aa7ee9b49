"""Range-only constant-velocity (ROCV) types (reference include/slam/ROCV_Types.h).

  * pos_vel vertex: [x y z vx vy vz], Euclidean ⊞ (ROCV_Types.h:31);
  * range edge (1D): r = z_range - |p - l| (ROCV_Types.h:163-200);
  * const-velocity edge (1D form): measurement is the time delta dt; the
    residual is the norm of the 6D deviation from the constant-velocity
    prediction [p + dt v, v] (ROCV_Types.h:454+);
  * landmark prior: direct position residual (ROCV_Types.h:228).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slam_plus_plus_tpu.models.types import edge_type, vertex_type

POS_VEL3D = vertex_type("pos_vel3d", 6, 6, lambda x, dx: x + dx,
                        schur_class="pose")


def _range_residual(states, z):
    pv, lm = states
    dist = jnp.sqrt(jnp.sum((pv[:3] - lm) ** 2) + 1e-30)
    return z - dist[None]


EDGE_ROCV_RANGE = edge_type("edge_rocv_range", ("pos_vel3d", "landmark3d"), 1, 1,
                            _range_residual)


def _const_velocity_residual(states, z):
    """6D residual (the reference default, b_1D_residual = false):
    deviation from the Newtonian constant-velocity prediction
    (reference include/slam/ROCV_Types.h:325,454+); measurement is the
    1D time delta, information 6x6."""
    prev, cur = states
    dt = z[0]
    pred = jnp.concatenate([prev[:3] + dt * prev[3:], prev[3:]])
    return pred - cur


def _const_velocity_init(states, z):
    prev, cur = states
    if prev is None:
        prev = np.zeros(6)
    if cur is None:
        dt = float(z[0])
        cur = np.concatenate([prev[:3] + dt * prev[3:], prev[3:]])
    return prev, cur


def _const_velocity_jax_init(states, z, slot):
    if slot == 0:
        return jnp.zeros(6, dtype=z.dtype)
    prev = states[0]
    dt = z[0]
    return jnp.concatenate([prev[:3] + dt * prev[3:], prev[3:]])


EDGE_ROCV_CONST_VEL = edge_type("edge_rocv_const_vel", ("pos_vel3d", "pos_vel3d"),
                                6, 1, _const_velocity_residual,
                                _const_velocity_init,
                                jax_initializer=_const_velocity_jax_init)


def _lm_prior_residual(states, z):
    (lm,) = states
    return z - lm


def _lm_anchor_expectation(states):
    (lm,) = states
    return lm


def _lm_anchor_error(z, h):
    # reference CEdgeLandmark3DPrior: J = I, error = 0, chi2 = 0 — a pure
    # curvature anchor; the parsed factor is the information (unsquared)
    # (reference include/slam/ROCV_Types.h:280-312)
    return jnp.zeros_like(h)


EDGE_LANDMARK3D_PRIOR = edge_type("edge_landmark3d_prior", ("landmark3d",), 3, 3,
                                  _lm_prior_residual,
                                  lambda states, z: (np.asarray(z, float),)
                                  if states[0] is None else states,
                                  expectation=_lm_anchor_expectation,
                                  error=_lm_anchor_error)
