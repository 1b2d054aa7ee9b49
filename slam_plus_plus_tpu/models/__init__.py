"""The vertex/edge "type zoo" (reference §L6: include/slam/SE2_Types.h,
SE3_Types.h, BA_Types.h, Sim3_Types.h, ROCV_Types.h).

Where the reference declares each type as a CRTP class with hand-derived
Jacobians, here a type is a *declaration*: dimensions + a pure-JAX residual
function.  Jacobians come from ``jax.jacfwd`` of the residual; batching from
``jax.vmap``; all heavy math lives in ``manifolds/``.

Importing this package registers all built-in types.
"""

from slam_plus_plus_tpu.models import ba_types, rocv_types, se2_types, se3_types, sim3_types  # noqa: F401
from slam_plus_plus_tpu.models.types import (
    EDGE_TYPES,
    VERTEX_TYPES,
    EdgeType,
    VertexType,
    edge_type,
    vertex_type,
)

__all__ = [
    "EdgeType",
    "VertexType",
    "EDGE_TYPES",
    "VERTEX_TYPES",
    "edge_type",
    "vertex_type",
]
