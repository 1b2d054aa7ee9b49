"""Marginal covariance recovery.

Reference analogue: CMarginals (reference include/slam/Marginals.h:70-5224,
the ICRA-2015 fast covariance recovery) and CSchurComplement_Marginals
(reference include/slam/BAMarginals.h:388, the 3DV-2017 Schur-domain BA
marginals).  The reference recovers requested parts of Sigma = lambda^-1 by a
backward recurrence over the sparse Cholesky factor R; the TPU formulation
goes through the same two-level structure the solvers already use:

  * primary (pose/camera) covariance: Sigma_pp = SC^-1 where SC is the
    reduced system after eliminating the landmark class — computed via one
    dense MXU Cholesky + triangular solves against identity (the reduced
    system is small by construction, the same reasoning as the reference's
    __SCHUR_USE_DENSE_SOLVER default);
  * landmark block-diagonal: Sigma_l = C_l^-1 + W_l^T Sigma_pp W_l with
    W = U C^-1 — the reference's sc_margs_detail::CUTTSolve_Bases_Impl
    recovers the same quantity with per-landmark basis solves
    (BAMarginals.h:238); here it is one dense GEMM Sigma_pp @ W_panel plus a
    batched per-landmark contraction, chunked over landmarks like the Schur
    solver's panels;
  * problems with no eliminated class invert the dense lambda directly.

Marginals are computed on the UNDAMPED lambda, as the reference refreshes
lambda with null damping before marginals (reference
include/slam/NonlinearSolver_Lambda_LM.h:1138-1142).

Covariance of the gauge: like the reference, the unary-factor block
(+identity on the anchor vertex) is part of lambda, which keeps it
invertible and matches the reference's numbers exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.ops import planar


class MarginalsResult(NamedTuple):
    p_diag: jnp.ndarray           # [Np, Bp*Bp] planar block-diagonal of Sigma_pp
    l_diag: jnp.ndarray           # [Nl, Bl*Bl] planar (empty-dim if no landmarks)
    sigma_pp: Optional[jnp.ndarray] = None  # [Np*Bp, Np*Bp] dense (if requested)


class Marginals:
    """Covariance recovery bound to an Assembler's structure.

    part: "diagonal" (default — the reference's mpart_Diagonal) or "full"
    (additionally returns the dense primary covariance).
    """

    def __init__(self, asm, part: str = "diagonal",
                 gauge_jitter: float = 0.0):
        """gauge_jitter: relative diagonal damping (scaled by max_hdiag)
        applied before inversion — gauge-deficient systems (mono BA scale
        freedom) are singular and would produce NaN; the reference's own
        factorization merely loses precision there, producing huge finite
        values.  Set 0 to disable."""
        self.asm = asm
        self.part = part
        self.gauge_jitter = gauge_jitter
        self._schur_mode = asm.Nl > 0 and asm.Kpl > 0
        if self._schur_mode:
            from slam_plus_plus_tpu.linalg.schur import SchurSolver
            self._schur = SchurSolver(asm)
        else:
            self._schur = None
        self._compute_jit = jax.jit(self._compute_impl)

    def _dense_lambda_pp(self, bs):
        from slam_plus_plus_tpu.linalg.dense import scatter_dense
        asm = self.asm
        return scatter_dense(asm.pp_rows, asm.pp_cols, bs.pp_blocks,
                             asm.Np, asm.Bp)

    def _compute_impl(self, bs) -> MarginalsResult:
        asm = self.asm
        if self.gauge_jitter:
            from slam_plus_plus_tpu.solvers.lm import damp_system
            bs = damp_system(bs, bs.max_hdiag * self.gauge_jitter,
                             asm.pp_diag_ids_dev)
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        nred = Np * Bp
        dt = bs.pp_blocks.dtype

        if not self._schur_mode:
            A = self._dense_lambda_pp(bs)
            L = jnp.linalg.cholesky(A)
            inv_l = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(nred, dtype=dt), lower=True)
            sigma = inv_l.T @ inv_l
            p_diag = self._extract_pdiag(sigma)
            l_diag = jnp.zeros((max(Nl, 1), Bl * Bl), dtype=dt)
            return MarginalsResult(
                p_diag, l_diag, sigma if self.part == "full" else None)

        sch = self._schur
        c_inv = planar.binv(bs.ll_blocks, Bl)                  # [Nl, Bl*Bl]
        u = bs.pl_blocks
        w = planar.bmm(u, c_inv[sch._pl_cols_dev], Bp, Bl, Bl)  # [Kpl, Bp*Bl]

        # SC and its inverse (dense, MXU)
        sc0 = sch._dense_pp(bs.pp_blocks)
        u_sorted = u[sch._order_dev]
        w_sorted = w[sch._order_dev]
        C = sch.chunk

        def build_panel(vals, idx):
            panel = jnp.zeros((nred * C * Bl,), dtype=dt)
            return panel.at[idx.reshape(-1)].add(
                vals.reshape(-1)).reshape(nred, C * Bl)

        # single-chunk fast path mirrors SchurSolver
        if sch.n_chunks == 1:
            idx = sch._panel_base + (sch._sorted_cols_dev * Bl)[:, None]
            up = build_panel(u_sorted, idx)
            wp = build_panel(w_sorted, idx)
            sc = sc0 - wp @ up.T
        else:
            M = sch.max_chunk_blocks

            def body(sc, ci):
                lo = sch._chunk_starts[ci]
                n_in = sch._chunk_starts[ci + 1] - lo
                sl = jnp.minimum(jnp.arange(M, dtype=lo.dtype) + lo,
                                 u_sorted.shape[0] - 1)
                valid = jnp.arange(M) < n_in
                mask = valid.astype(dt)[:, None]
                rel = sch._sorted_cols_dev[sl] - ci * C
                idx = jnp.where(valid[:, None],
                                sch._panel_base[sl] + (rel * Bl)[:, None], 0)
                up = build_panel(u_sorted[sl] * mask, idx)
                wp = build_panel(w_sorted[sl] * mask, idx)
                return sc - wp @ up.T, None

            sc, _ = jax.lax.scan(body, sc0, jnp.arange(sch.n_chunks))

        L = jnp.linalg.cholesky(sc)
        inv_l = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(nred, dtype=dt), lower=True)
        sigma_pp = inv_l.T @ inv_l                              # SC^-1
        p_diag = self._extract_pdiag(sigma_pp)

        # landmark block diagonal: Sigma_l = C^-1 + W_l^T Sigma_pp W_l,
        # chunked: P = Sigma_pp @ W_panel; Sigma_l = C_l^-1 + W_l^T P_l
        l_diag = c_inv

        if sch.n_chunks == 1:
            idx = sch._panel_base + (sch._sorted_cols_dev * Bl)[:, None]
            wp = build_panel(w_sorted, idx)
            P = sigma_pp @ wp                                  # [nred, C*Bl]
            wr = wp.reshape(nred, C, Bl)
            pr = P.reshape(nred, C, Bl)
            corr = jnp.einsum("rci,rcj->cij", wr, pr).reshape(C, Bl * Bl)
            l_diag = l_diag + corr[:Nl]
        else:
            M = sch.max_chunk_blocks

            def lbody(carry, ci):
                ld = carry
                lo = sch._chunk_starts[ci]
                n_in = sch._chunk_starts[ci + 1] - lo
                sl = jnp.minimum(jnp.arange(M, dtype=lo.dtype) + lo,
                                 w_sorted.shape[0] - 1)
                valid = jnp.arange(M) < n_in
                mask = valid.astype(dt)[:, None]
                rel = sch._sorted_cols_dev[sl] - ci * C
                idx = jnp.where(valid[:, None],
                                sch._panel_base[sl] + (rel * Bl)[:, None], 0)
                wp = build_panel(w_sorted[sl] * mask, idx)
                P = sigma_pp @ wp
                wr = wp.reshape(nred, C, Bl)
                pr = P.reshape(nred, C, Bl)
                corr = jnp.einsum("rci,rcj->cij", wr, pr).reshape(C, Bl * Bl)
                # scatter chunk correction into the landmark diag
                lm_ids = jnp.minimum(ci * C + jnp.arange(C), ld.shape[0] - 1)
                in_range = (ci * C + jnp.arange(C)) < ld.shape[0]
                ld = ld.at[lm_ids].add(corr * in_range[:, None].astype(dt))
                return ld, None

            l_diag, _ = jax.lax.scan(lbody, l_diag, jnp.arange(sch.n_chunks))

        return MarginalsResult(
            p_diag, l_diag, sigma_pp if self.part == "full" else None)

    def _extract_pdiag(self, sigma):
        asm = self.asm
        Np, Bp = asm.Np, asm.Bp
        s4 = sigma.reshape(Np, Bp, Np, Bp)
        ids = jnp.arange(Np)
        return s4[ids, :, ids, :].reshape(Np, Bp * Bp)

    # public ------------------------------------------------------------

    def compute(self, block_system) -> MarginalsResult:
        return self._compute_jit(block_system)
