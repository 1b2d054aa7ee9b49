"""Vertex/edge type registry.

Reference analogue: the CRTP bases CBaseVertexImpl / CBaseEdgeImpl
(reference include/slam/BaseTypes.h:458,695) and the per-family *_Types.h
headers.  A type here is data, not a class hierarchy: the solver pipeline is
generic over these declarations, batching same-typed elements into arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

VERTEX_TYPES: Dict[str, "VertexType"] = {}
EDGE_TYPES: Dict[str, "EdgeType"] = {}


@dataclasses.dataclass(frozen=True)
class VertexType:
    """A vertex (variable) type.

    state_dim   — stored state size (e.g. 7 for Sim3 tRs)
    tangent_dim — optimization tangent size (= Hessian block size)
    boxplus     — retraction state x tangent -> state (JAX, single element)
    """

    name: str
    state_dim: int
    tangent_dim: int
    boxplus: Callable
    # category used by the Schur guided ordering: "pose"-like types form the
    # reduced system, "landmark"-like types get eliminated
    # (reference CSchurOrdering::n_Calculate_GuidedOrdering splits by vertex
    # dimension/type, include/slam/LinearSolver_Schur.h:292).
    schur_class: str = "pose"  # "pose" | "landmark"


@dataclasses.dataclass(frozen=True)
class EdgeType:
    """An edge (factor) type.

    residual — JAX fn (vertex_states: tuple, measurement) -> [residual_dim];
               the convention matches the reference: r = z ⊖ h(x), and
               chi2 = r^T Sigma^-1 r with Sigma^-1 the parsed information.
    initializer — host fn (existing_states: tuple_with_None, measurement)
               -> tuple of states for vertices needing initialization; mirrors
               the reference's per-edge vertex initializers
               (e.g. CRelative_to_Absolute_XYT_Initializer,
               reference include/slam/SE2_Types.h:184-210).
    """

    name: str
    vertex_types: Tuple[str, ...]
    residual_dim: int
    measurement_dim: int
    residual: Callable
    initializer: Optional[Callable] = None
    robust: bool = False  # reference: CBaseEdge::Robust edges (e.g. CEdgePose3D)
    # Optional split form: h = expectation(states); r = error(z, h).  When
    # set, GN jacobians are taken of the *expectation* (negated), matching the
    # reference, which differentiates h — not r — through the vertex ⊞
    # (numerical diff at eps=1e-9, reference include/slam/3DSolverBase.h:1357-1372,
    # used by CEdgePose3D::Calculate_Jacobians_Expectation_Error,
    # SE3_Types.h:265-290).  For linear errors (r = z - h) the two coincide;
    # for manifold-valued errors (SE3/Sim3 rotation log) they differ away from
    # convergence, and the split form is required for iterate-level parity.
    expectation: Optional[Callable] = None
    error: Optional[Callable] = None
    # JAX version of the initializer for on-device vertex activation during
    # incremental replay: (states_tuple, z, slot) -> state for `slot`.
    # None = initialize from the parsed file state (BA vertices).
    jax_initializer: Optional[Callable] = None
    # robust loss selection (reference: per-edge CRTP robust mixins with
    # flyweight parameters, include/slam/RobustUtils.h:368,502): the loss
    # name indexes robust.losses.LOSSES; the error norm is divided by
    # robust_scale before the weight (the reference's CCTFraction scale,
    # e.g. 30/100 for CEdgePose3D, SE3_Types.h:128-129).  Effective only
    # when robust=True; SolverConfig.robust_overrides can re-tune per type.
    robust_loss: str = "huber"
    robust_scale: float = 0.3

    @property
    def arity(self) -> int:
        return len(self.vertex_types)


def vertex_type(name: str, state_dim: int, tangent_dim: int, boxplus: Callable,
                schur_class: str = "pose") -> VertexType:
    vt = VertexType(name, state_dim, tangent_dim, boxplus, schur_class)
    VERTEX_TYPES[name] = vt
    return vt


def edge_type(name: str, vertex_types: Sequence[str], residual_dim: int,
              measurement_dim: int, residual: Callable,
              initializer: Optional[Callable] = None,
              robust: bool = False,
              expectation: Optional[Callable] = None,
              error: Optional[Callable] = None,
              jax_initializer: Optional[Callable] = None,
              robust_loss: str = "huber",
              robust_scale: float = 0.3) -> EdgeType:
    et = EdgeType(name, tuple(vertex_types), residual_dim, measurement_dim,
                  residual, initializer, robust, expectation, error,
                  jax_initializer, robust_loss, robust_scale)
    EDGE_TYPES[name] = et
    return et
