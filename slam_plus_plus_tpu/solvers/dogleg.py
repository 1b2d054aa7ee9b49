"""Powell's dogleg trust-region solver ("Lambda-DL").

Reference analogue: CNonlinearSolver_Lambda_DL (reference
include/slam/NonlinearSolver_Lambda_DL.h:242-1560, the 3DV-2017 incremental
BA solver).  This implements the core dogleg trust-region algorithm with the
reference's semantics:

  * trust radius delta init 2 (reference :405, CLI -dlss);
  * alpha (steepest-descent scale) = |eta|^2 / (eta^T lambda eta)
    (:1239-1242 with the lazily-evaluated denominator);
  * step selection (:1290-1330): GN step if |h_gn| <= delta; scaled
    steepest descent if alpha |eta| >= delta; else dogleg interpolation
    solving |a + beta (b - a)| = delta with the roundoff-compensated
    quadratic;
  * gain = (f0 - f1) / (dx . (2 eta - lambda dx)) (:1505-1510);
  * radius update delta /= max(1/3, 1 - (2 g - 1)^3); bad steps restore
    state and retry; stop when delta < threshold (:1516-1543);
  * Cauchy fallback when the Cholesky fails (:1157).

Fluid relinearization (per-vertex thresholds) and the incrementally
maintained Schur complement are not yet implemented — batch relinearizes
fully each iteration, which computes the same fixed points.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax.numpy as jnp

from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.linalg.spmv import lambda_spmv
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver


class DoglegSolver(GaussNewtonSolver):
    def __init__(self, system: GraphSystem, config: Optional[SolverConfig] = None,
                 trust_radius: float = 2.0):
        super().__init__(system, config)
        self.initial_delta = trust_radius

    def _dot(self, ap, al, bp, bl):
        return float(jnp.sum(ap * bp) + jnp.sum(al * bl))

    def optimize(self, max_iterations: Optional[int] = None,
                 dx_threshold: Optional[float] = None, verbose: bool = False):
        cfg = self.config.incremental
        max_iterations = (max_iterations if max_iterations is not None
                          else cfg.final_max_iterations)
        dx_threshold = (dx_threshold if dx_threshold is not None
                        else cfg.final_dx_threshold)

        t0 = time.perf_counter()
        asm = self.asm
        states = asm.snapshot_states(self.system)
        delta = self.initial_delta

        bs = asm.assemble(states)
        last_error = float(bs.chi2)
        n_iters = 0
        it = 0
        while it < max_iterations:
            it += 1
            n_iters += 1

            eta_p, eta_l = bs.eta_p, bs.eta_l
            # GN step (Cauchy fallback on failure).  A gauge-deficient lambda
            # (pure BA) makes our Cholesky NaN where the reference's merely
    	    # loses precision and returns a huge-but-finite step that the
            # trust region then clips; a tiny scaled jitter recovers the same
            # behavior.
            try:
                gn_p, gn_l = self._solve(bs)
                gn_ok = bool(np.isfinite(float(jnp.sum(gn_p) + jnp.sum(gn_l))))
                if not gn_ok:
                    from slam_plus_plus_tpu.solvers.lm import damp_system
                    jitter = float(bs.max_hdiag) * 1e-9
                    gn_p, gn_l = self._solve(
                        damp_system(bs, jitter, asm.pp_diag_ids_dev))
                    gn_ok = bool(np.isfinite(float(jnp.sum(gn_p) +
                                                   jnp.sum(gn_l))))
            except Exception:
                gn_ok = False
            gn_norm = (float(jnp.sqrt(jnp.sum(gn_p ** 2) + jnp.sum(gn_l ** 2)))
                       if gn_ok else np.inf)

            if gn_ok and gn_norm <= dx_threshold:
                break  # reference: GN residual below threshold (:1394 check)

            eta_norm = float(jnp.sqrt(jnp.sum(eta_p ** 2) + jnp.sum(eta_l ** 2)))
            if eta_norm < 1e-14:
                break
            lam_eta_p, lam_eta_l = lambda_spmv(asm, bs, eta_p, eta_l)
            denom = self._dot(eta_p, eta_l, lam_eta_p, lam_eta_l)
            alpha = eta_norm ** 2 / denom if denom > 0 else 0.0

            # dogleg step selection (reference :1290-1330)
            if gn_ok and gn_norm <= delta:
                dl_p, dl_l = gn_p, gn_l
                dl_norm = gn_norm
            elif (not gn_ok) or alpha * eta_norm >= delta:
                scale = delta / eta_norm
                if not gn_ok:
                    scale = min(alpha, scale)  # Cauchy point, clipped (:1354-1359)
                dl_p, dl_l = eta_p * scale, eta_l * scale
                dl_norm = eta_norm * scale
            else:
                a_p, a_l = eta_p * alpha, eta_l * alpha
                b_p, b_l = gn_p - a_p, gn_l - a_l
                bb = self._dot(b_p, b_l, b_p, b_l)
                c = self._dot(a_p, a_l, b_p, b_l)
                a2 = (alpha * eta_norm) ** 2
                disc = np.sqrt(c * c + bb * (delta * delta - a2))
                beta = ((-c + disc) / bb if c <= 0
                        else (delta * delta - a2) / (c + disc))
                dl_p = a_p + beta * b_p
                dl_l = a_l + beta * b_l
                dl_norm = float(jnp.sqrt(jnp.sum(dl_p ** 2) + jnp.sum(dl_l ** 2)))

            new_states = asm.update(states, dl_p, dl_l)
            new_bs = asm.assemble(new_states)
            error = float(new_bs.chi2)

            # gain = (f0 - f1) / (dx . (2 eta - lambda dx))   (:1505-1510)
            lam_dx_p, lam_dx_l = lambda_spmv(asm, bs, dl_p, dl_l)
            pred = self._dot(dl_p, dl_l, 2.0 * eta_p - lam_dx_p,
                             2.0 * eta_l - lam_dx_l)
            gain = (last_error - error) / pred if pred != 0 else -1.0

            if verbose:
                print(f"iter {it - 1}: chi2: {error:f} |dl|={dl_norm:.6f} "
                      f"delta={delta:.4g} gain={gain:.3f}")

            prev_delta = delta
            delta = delta / max(1.0 / 3.0,
                                1.0 - (2.0 * gain - 1.0) ** 3)
            if gain > 0:
                states = new_states
                bs = new_bs
                last_error = error
            # bad step: keep old state, retry with the shrunk radius

            if delta < dx_threshold:
                delta = (min(2 * delta, prev_delta)
                         if 2 * delta >= dx_threshold else prev_delta)
                break

        chi2 = float(asm.chi2(states))
        asm.writeback_states(self.system, states)
        self.timing["optimize"] = time.perf_counter() - t0
        return chi2, n_iters
