"""Manifold / Lie-group math for all vertex and edge types.

Everything here is pure-functional JAX, written for single elements
(``[3]``/``[6]``/``[7]`` state vectors) and batched with ``jax.vmap`` by the
assembly layer.  All functions are differentiable (``jacfwd``-safe at
singularities — small-angle limits are handled branchlessly with Taylor
expansions), replacing the reference's hand-derived Matlab-generated Jacobians
(reference include/slam/2DSolverBase.h, 3DSolverBase.h, BASolverBase.h,
Sim3SolverBase.h) with autodiff of behavior-matched forward models.
"""

from slam_plus_plus_tpu.manifolds import camera, se2, se3, sim3, so3

__all__ = ["so3", "se2", "se3", "sim3", "camera"]
