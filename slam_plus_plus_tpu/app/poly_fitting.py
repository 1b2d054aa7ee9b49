"""Minimal curve-fitting intro — the poly_fitting_example analogue.

Reference: src/poly_fitting_example (389 LoC) — the tutorial showing how a
user defines their OWN vertex/edge types and runs the NLS machinery on a
non-SLAM problem.  Here the whole definition is ~20 lines: a polynomial-
coefficient vertex and a sample edge registered into the same type registry
the SLAM models use; the standard Gauss-Newton solver does the rest.

Usage:  python -m slam_plus_plus_tpu.app.poly_fitting [degree]
"""

from __future__ import annotations

import sys

import numpy as np

import jax.numpy as jnp

from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.models.types import EDGE_TYPES, edge_type, vertex_type
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver

DEGREE = 4  # quartic, like the reference example


def _register(degree: int = DEGREE):
    """User-defined types: one vertex holding the coefficients, one unary
    edge per sample (z = [x, y], residual = y - p(x))."""
    name_v, name_e = f"poly{degree}", f"poly{degree}_sample"
    if name_e in EDGE_TYPES:
        return name_v, name_e
    vertex_type(name_v, degree + 1, degree + 1, lambda c, dc: c + dc,
                schur_class="pose")

    def residual(states, z):
        (coeffs,) = states
        x, y = z[0], z[1]
        powers = x ** jnp.arange(coeffs.shape[0], dtype=z.dtype)
        return (y - jnp.dot(coeffs, powers))[None]

    edge_type(name_e, (name_v,), 1, 2, residual)
    return name_v, name_e


def fit(xs, ys, degree: int = DEGREE, sigma: float = 1.0):
    """Fit y ~ poly(x); returns (coefficients, final chi2)."""
    name_v, name_e = _register(degree)
    sys_ = GraphSystem()
    sys_.add_vertex(0, name_v, np.zeros(degree + 1))
    info = np.array([[1.0 / sigma**2]])
    for x, y in zip(xs, ys):
        sys_.add_edge(name_e, (0,), np.array([x, y]), info)
    gn = GaussNewtonSolver(sys_)
    chi2, _ = gn.optimize(10)
    return np.asarray(sys_.vertex_stores[name_v].data[0]), chi2


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    deg = int(sys.argv[1]) if len(sys.argv) > 1 else DEGREE
    rng = np.random.default_rng(0)
    true_c = rng.normal(0, 1, deg + 1)
    xs = np.linspace(-1, 1, 200)
    ys = np.polyval(true_c[::-1], xs) + rng.normal(0, 0.05, xs.shape)
    c, chi2 = fit(xs, ys, degree=deg)
    print("true coeffs:", np.round(true_c, 4))
    print("fit  coeffs:", np.round(c, 4))
    print(f"final chi2: {chi2:.3f} over {len(xs)} samples")
