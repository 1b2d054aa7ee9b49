"""Batch Gauss-Newton ("Lambda") solver.

Reference analogue: CNonlinearSolver_Lambda::Optimize
(reference include/slam/NonlinearSolver_Lambda.h:476-668).  Iteration
semantics replicated exactly for golden-value parity:

    for iter in range(max_iters):
        refresh lambda at current linearization point
        eta = rhs
        dx = solve(lambda, eta)            # Cholesky or Schur
        if ||dx||_2 <= dx_threshold: break # break BEFORE pushing
        x <- x ⊞ dx

The linear backend is chosen per structure: Schur elimination whenever an
eliminated (landmark) class exists, a dense MXU Cholesky for small primary
systems, and the nested MIS-Schur sparse block Cholesky
(linalg/block_cholesky.py) for large pose graphs; linear_solver="scipy"
forces the host oracle.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.linalg.dense import solve_dense_spd
from slam_plus_plus_tpu.linalg.host_solver import HostSparseSolver
from slam_plus_plus_tpu.linalg.schur import SchurSolver

def _dense_limit():
    """Scalar dims below which the direct dense MXU path is used: the TPU
    factors a 20k-dim dense system in ~ms; host sparse fallback only pays
    beyond that."""
    import jax
    return 20000 if jax.default_backend() == "tpu" else 6000




class GaussNewtonSolver:
    def __init__(self, system: GraphSystem, config: Optional[SolverConfig] = None):
        if not system.edge_stores:
            raise ValueError("cannot build a solver over an empty system "
                             "(no edges); add edges first")
        self.system = system
        self.config = config or SolverConfig()
        self.asm = Assembler(system, self.config)
        self.timing = {}

        asm = self.asm
        use_schur = asm.Nl > 0 and asm.Kpl > 0
        if self.config.linear_solver == "schur":
            use_schur = True
        if self.config.linear_solver in ("dense", "scipy"):
            use_schur = False

        self._schur = SchurSolver(asm) if use_schur else None
        self._host = HostSparseSolver() if not use_schur else None
        n_scalar = asm.Np * asm.Bp
        self._dense_direct = (not use_schur and
                              (self.config.linear_solver == "dense" or
                               (self.config.linear_solver == "auto" and
                                n_scalar <= _dense_limit())))
        if self._dense_direct:
            # rows/cols stay host-side numpy: static scatter structure
            self._dense_solve_jit = jax.jit(
                lambda sys_: solve_dense_spd(asm.pp_rows, asm.pp_cols,
                                             sys_.pp_blocks, sys_.eta_p,
                                             asm.Np, asm.Bp))
        # large pose-graph path: nested MIS-Schur sparse block Cholesky on
        # device (replaces the reference's CLinearSolver_UberBlock role)
        self._sparse_chol = None
        if (not use_schur and not self._dense_direct and
                self.config.linear_solver in ("auto", "block_cholesky")):
            from slam_plus_plus_tpu.linalg.block_cholesky import (
                BlockCholeskySolver)
            from slam_plus_plus_tpu.linalg.spmv import lambda_spmv
            self._sparse_chol = BlockCholeskySolver(
                asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp)
            chol = self._sparse_chol
            # f32 deep eliminations lose ~3-4 digits; a couple of cheap
            # refinement sweeps against the cached factor restore the GN
            # step to working precision (f64 needs none)
            n_refine = (self.config.refine_iterations
                        if self.asm.dtype == jnp.float32 else 0)

            def sparse_solve(bs):
                f = chol._factor_impl(bs.pp_blocks)
                dx = chol._solve_with_factor_impl(f, bs.eta_p)
                zl = jnp.zeros((max(asm.Nl, 1), asm.Bl), dtype=dx.dtype)
                for _ in range(n_refine):
                    hv, _ = lambda_spmv(asm, bs, dx, zl)
                    dx = dx + chol._solve_with_factor_impl(f, bs.eta_p - hv)
                if n_refine:
                    # f32 solve-quality gate: at extreme depth the f32
                    # elimination can produce a finite but useless factor
                    # (near-singular level pivot -> huge c_inv; observed on
                    # TPU at w100K).  A true-residual check catches it on
                    # device; NaN-ing dx makes the GN loop abort cleanly
                    # instead of corrupting the state (the reference's
                    # Cholesky-failure abort analogue).
                    hv, _ = lambda_spmv(asm, bs, dx, zl)
                    rel = (jnp.linalg.norm(bs.eta_p - hv) /
                           jnp.maximum(jnp.linalg.norm(bs.eta_p), 1e-30))
                    dx = jnp.where(rel < 1.0, dx, jnp.nan)
                return dx

            self._sparse_solve_jit = jax.jit(sparse_solve)

    def _solve(self, block_system):
        asm = self.asm
        if self._schur is not None:
            return self._schur.solve(block_system)
        zeros_l = jnp.zeros((max(asm.Nl, 1), asm.Bl), dtype=block_system.eta_p.dtype)
        if self._dense_direct:
            return self._dense_solve_jit(block_system), zeros_l
        if self._sparse_chol is not None:
            return self._sparse_solve_jit(block_system), zeros_l
        if asm.Nl:
            dx_p, dx_l = self._host.solve_partitioned(asm, block_system)
            return (jnp.asarray(dx_p, dtype=block_system.eta_p.dtype),
                    jnp.asarray(dx_l, dtype=block_system.eta_p.dtype))
        dx_p = self._host.solve_blocks(asm.pp_rows, asm.pp_cols,
                                       np.asarray(block_system.pp_blocks),
                                       np.asarray(block_system.eta_p),
                                       asm.Np, asm.Bp)
        return jnp.asarray(dx_p, dtype=block_system.eta_p.dtype), zeros_l

    def optimize(self, max_iterations: Optional[int] = None,
                 dx_threshold: Optional[float] = None, verbose: bool = False):
        """Run GN to convergence; writes optimized states back to the system.

        Returns (final_chi2, iterations_run).
        """
        cfg = self.config.incremental
        max_iterations = (max_iterations if max_iterations is not None
                          else cfg.final_max_iterations)
        dx_threshold = (dx_threshold if dx_threshold is not None
                        else cfg.final_dx_threshold)

        t0 = time.perf_counter()
        states = self.asm.snapshot_states(self.system)
        n_iters = 0
        for it in range(max_iterations):
            n_iters += 1
            block_system = self.asm.assemble(states)
            dx_p, dx_l = self._solve(block_system)
            dx_norm = float(jnp.sqrt(jnp.sum(dx_p * dx_p) + jnp.sum(dx_l * dx_l)))
            if verbose:
                print(f"iter {it}: chi2={float(block_system.chi2):.2f} "
                      f"|dx|={dx_norm:.6f}")
            if not np.isfinite(dx_norm):
                break  # Cholesky failure analogue: abort iteration
            if dx_norm <= dx_threshold:
                break  # reference: break before pushing (Lambda.h:648)
            states = self.asm.update(states, dx_p, dx_l)
        chi2 = float(self.asm.chi2(states))
        self.asm.writeback_states(self.system, states)
        self.timing["optimize"] = time.perf_counter() - t0
        return chi2, n_iters

    def chi2(self) -> float:
        states = self.asm.snapshot_states(self.system)
        return float(self.asm.chi2(states))


def optimize(system: GraphSystem, config: Optional[SolverConfig] = None,
             max_iterations: int = 5, dx_threshold: float = 0.01,
             verbose: bool = False):
    solver = GaussNewtonSolver(system, config)
    return solver.optimize(max_iterations, dx_threshold, verbose=verbose)
