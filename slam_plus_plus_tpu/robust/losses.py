"""Robust loss weight functions (reference include/geometry/RobustLoss.h:55-393).

Each function returns the IRLS weight w(x) = psi(x)/x for a scaled error
magnitude x >= 0, with the reference's default tuning constants (95%
asymptotic efficiency for Gaussian noise).  Edges apply sqrt(w) to the error
and Jacobians, so the Hessian/eta contributions scale by w (reference
include/slam/BaseTypes.h:1442-1501).

The reference's SE(3) pose edge uses Huber with error scale 0.3
(CRobustify_ErrorNorm_Default<CCTFraction<30,100>, CHuberLossd>,
reference include/slam/SE3_Types.h:128-129).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(x, a=1.345):
    x = jnp.abs(x)
    return jnp.where(x <= a, 1.0, a / jnp.maximum(x, 1e-30))


def cauchy_weight(x, a=2.385):
    return a * a / (a * a + x * x)


def tukey_weight(x, a=4.685):
    x = jnp.abs(x)
    t = 1.0 - (x / a) ** 2
    return jnp.where(x <= a, t * t, 0.0)


def hampel_weight(x, a=1.5, b=3.5, c=8.0):
    x = jnp.abs(x)
    xs = jnp.maximum(x, 1e-30)
    w_mid = a / xs
    w_tail = a * (c - x) / (c - b) / xs
    return jnp.where(x <= a, 1.0,
                     jnp.where(x <= b, w_mid,
                               jnp.where(x <= c, w_tail, 0.0)))


def logistic_weight(x, a=1.205):
    xs = jnp.maximum(jnp.abs(x), 1e-12) / a
    return jnp.tanh(xs) / xs


def fair_weight(x, a=1.4):
    return 1.0 / (1.0 + jnp.abs(x) / a)


def welsch_weight(x, a=2.985):
    return jnp.exp(-((x / a) ** 2))


LOSSES = {
    "huber": huber_weight,
    "cauchy": cauchy_weight,
    "tukey": tukey_weight,
    "hampel": hampel_weight,
    "logistic": logistic_weight,
    "fair": fair_weight,
    "welsch": welsch_weight,
    # unit weight: disables robustification for a robust-capable edge type
    # without changing the type registry (plain least squares)
    "none": lambda x: jnp.ones_like(jnp.asarray(x, dtype=jnp.result_type(x, 0.0))),
}
