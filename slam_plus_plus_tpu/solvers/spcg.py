"""Preconditioned conjugate-gradient solver ("SPCG").

Reference analogue: CNonlinearSolver_SPCG (reference
include/slam/NonlinearSolver_SPCG.h:61) — research solver running conjugate
gradients over the normal equations with a subgraph preconditioner.  TPU
formulation: matrix-free CG over the planar block SpMV (one batched GEMM
sweep per iteration — bandwidth-bound, no factorization at all), with a
block-Jacobi preconditioner (the diagonal blocks of lambda, inverted with
the planar batched inverse).  Block-Jacobi replaces the reference's
spanning-tree subgraph: on TPU the preconditioner application must itself be
a batched kernel, and the block diagonal is the natural choice; the
spanning-tree variant adds a sequential triangular solve that does not map
to the hardware.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.linalg.spmv import lambda_spmv
from slam_plus_plus_tpu.ops import planar
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver


class SPCGSolver(GaussNewtonSolver):
    """GN outer loop with a CG linear solver (no factorization)."""

    def __init__(self, system: GraphSystem, config: Optional[SolverConfig] = None,
                 cg_iters: int = 200, cg_tol: float = 1e-8):
        super().__init__(system, config)
        self.cg_iters = cg_iters
        self.cg_tol = cg_tol
        asm = self.asm
        self._diag_pos = jnp.asarray(asm.pp_diag_ids)
        self._cg_jit = jax.jit(self._cg_impl)

    def _cg_impl(self, bs):
        asm = self.asm
        Bp, Bl = asm.Bp, asm.Bl

        # block-Jacobi preconditioner: inverted diagonal blocks
        diag_p = bs.pp_blocks[self._diag_pos]            # [Np, Bp*Bp]
        m_p = planar.binv(diag_p, Bp)
        m_l = planar.binv(bs.ll_blocks, Bl) if asm.Nl else None

        def precond(r_p, r_l):
            z_p = planar.bmv(m_p, r_p, Bp, Bp)
            z_l = planar.bmv(m_l, r_l, Bl, Bl) if asm.Nl else r_l
            return z_p, z_l

        def matvec(v_p, v_l):
            return lambda_spmv(asm, bs, v_p, v_l)

        b_p, b_l = bs.eta_p, bs.eta_l
        x_p = jnp.zeros_like(b_p)
        x_l = jnp.zeros_like(b_l)
        r_p, r_l = b_p, b_l
        z_p, z_l = precond(r_p, r_l)
        p_p, p_l = z_p, z_l
        rz = jnp.sum(r_p * z_p) + jnp.sum(r_l * z_l)
        b_norm = jnp.sqrt(jnp.sum(b_p * b_p) + jnp.sum(b_l * b_l))

        def body(carry, _):
            x_p, x_l, r_p, r_l, p_p, p_l, rz, done = carry
            Ap_p, Ap_l = matvec(p_p, p_l)
            pAp = jnp.sum(p_p * Ap_p) + jnp.sum(p_l * Ap_l)
            alpha = jnp.where(pAp > 0, rz / pAp, 0.0)
            x_p2 = x_p + alpha * p_p
            x_l2 = x_l + alpha * p_l
            r_p2 = r_p - alpha * Ap_p
            r_l2 = r_l - alpha * Ap_l
            z_p2, z_l2 = precond(r_p2, r_l2)
            rz2 = jnp.sum(r_p2 * z_p2) + jnp.sum(r_l2 * z_l2)
            beta = jnp.where(rz > 0, rz2 / rz, 0.0)
            p_p2 = z_p2 + beta * p_p
            p_l2 = z_l2 + beta * p_l
            r_norm = jnp.sqrt(jnp.sum(r_p2 * r_p2) + jnp.sum(r_l2 * r_l2))
            done2 = done | (r_norm <= self.cg_tol * b_norm)
            # freeze updates once converged
            keep = 1.0 - done.astype(x_p.dtype)
            out = (x_p + keep * (x_p2 - x_p), x_l + keep * (x_l2 - x_l),
                   jnp.where(done, r_p, r_p2), jnp.where(done, r_l, r_l2),
                   jnp.where(done, p_p, p_p2), jnp.where(done, p_l, p_l2),
                   jnp.where(done, rz, rz2), done2)
            return out, None

        init = (x_p, x_l, r_p, r_l, p_p, p_l, rz,
                jnp.asarray(False))
        (x_p, x_l, *_), _ = jax.lax.scan(body, init, None,
                                         length=self.cg_iters)
        return x_p, x_l

    def _solve(self, block_system):
        return self._cg_jit(block_system)
