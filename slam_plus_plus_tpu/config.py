"""Global configuration: dtype policy and solver settings.

The reference is double-precision everywhere (C++ ``double``).  TPUs execute
float32/bfloat16 natively; float64 is software-emulated and slow.  Policy:

  * on CPU (tests, verification): float64, bit-matching a NumPy/SciPy oracle;
  * on TPU: float32 compute with float64-equivalent accuracy recovered through
    iterative refinement of the linear solves (see linalg/refine.py).

``default_dtype()`` picks per-backend; every array-creating entry point takes
an optional dtype override.

Reference analogue: the three-tier config system of SLAM++ (CMake defines /
ConfigSolvers.h / TCommandLineArgs — reference include/slam/ConfigSolvers.h:24,
include/slam_app/Main.h:1645) collapses here into one dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_dtype(platform: Optional[str] = None):
    """float64 on CPU when x64 is on; float32 otherwise (TPU)."""
    if platform is None:
        platform = jax.default_backend()
    if platform == "cpu" and x64_enabled():
        return jnp.float64
    return jnp.float32


@dataclasses.dataclass(frozen=True)
class IncrementalPolicy:
    """When to run nonlinear iterations during incremental operation.

    Reference analogue: TIncrementalSolveSetting / the fluent
    ``solve::Nonlinear(frequency::Every(N))`` API
    (reference include/slam/IncrementalPolicy.h:45-70,172).
    """

    every_n_vertices: int = 0        # 0 = never (batch mode)
    max_iterations: int = 5
    dx_threshold: float = 1e-2       # reference default f_nonlinear_solve_error_threshold = .01
    # batch-final settings
    final_max_iterations: int = 5
    final_dx_threshold: float = 1e-2


@dataclasses.dataclass(frozen=True)
class MarginalsPolicy:
    """Which part of the covariance to maintain, and how often.

    Reference analogue: TMarginalsComputationPolicy + EBlockMatrixPart
    (reference include/slam/IncrementalPolicy.h:366-372,398).
    """

    enabled: bool = False
    part: str = "diagonal"           # diagonal | last_column | full
    increment_every: int = 1
    relinearize_update: bool = True  # allow incremental omega-updates


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    solver: str = "lambda"           # a | lambda | lambda_lm | lambda_dl | fast_l
    linear_solver: str = "auto"      # auto | dense | block_cholesky | schur | scipy
    use_schur: bool = False
    # landmark-class elimination policy: "auto" splits off the landmark
    # class for Schur only when the reduced (pose/camera) system is small
    # enough for the dense MXU path — the reference's own default applies
    # Schur on request (-us) and solves many-pose landmark SLAM with a
    # fill-reducing ordering over ALL variables (unit_tests.sh cityTrees10k
    # row has no -us).  "off" always mixes; "on" always splits.
    schur_split: str = "auto"
    dtype: Optional[object] = None   # None = default_dtype()
    use_pallas: str = "auto"         # auto | on | off — fused TPU edge kernels
    # "uniform": sort + pad observation edges into a per-landmark [Nl, M]
    # layout at build time so every landmark-side reduction and the Schur
    # panel build become pure reshapes (TPU gathers/scatters of O(E) rows
    # cost ~11 ns/row regardless of locality — measured; the uniform layout
    # removes them entirely).  "auto" enables it for batch landmark
    # problems when padding inflates the edge count <= 1.5x; "flat" keeps
    # parse order (required by the incremental prefix-masking engines).
    edge_layout: str = "auto"        # auto | uniform | flat
    refine_iterations: int = 2       # iterative-refinement sweeps for f32 solves
    incremental: IncrementalPolicy = dataclasses.field(default_factory=IncrementalPolicy)
    marginals: MarginalsPolicy = dataclasses.field(default_factory=MarginalsPolicy)
    damping_init: float = 0.0        # LM initial damping; 0 = derive from diagonal
    dogleg_radius: float = 1.0
    verbose: bool = False
    # per-edge-type robust loss overrides: {edge_type_name: (loss, scale)}
    # with loss in robust.losses.LOSSES; overrides the type registry's
    # defaults (reference: robust mixin template parameters,
    # include/slam/RobustUtils.h:368-502).  {"*": (...)} applies to every
    # robust-enabled edge type.
    robust_overrides: Optional[dict] = None

    def resolved_dtype(self):
        return self.dtype if self.dtype is not None else default_dtype()
