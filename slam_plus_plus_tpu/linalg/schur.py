"""Schur-complement elimination of the landmark class, fully on device.

Reference analogue: CLinearSolver_Schur::Solve_PosDef_Blocky
(reference include/slam/LinearSolver_Schur.h:1623-1849) and its CUDA backend
(reference src/slam/LinearSolver_Schur_GPU.cpp — cuSPARSE SpDGEMM + CULA dense
Cholesky).  TPU-native version:

  * the guided camera/landmark split is free — the assembler already
    partitions by vertex type;
  * C^-1 is a batched small inverse over [Nl, Bl, Bl] (reference
    InverseOf_BlockDiag_FBS_Parallel, BlockMatrix.h:3165);
  * U C^-1 and U C^-1 U^T are *batched block GEMMs* over host-precomputed
    pair lists with a segment-sum reduction — the SpDGEMM replacement;
  * the reduced system solves densely on the MXU (its size = #cameras * Bp,
    small by construction — reference __SCHUR_USE_DENSE_SOLVER default,
    LinearSolver_Schur.h:49-55) or through any block solver when large.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.linalg.dense import solve_dense_spd


@dataclasses.dataclass
class SchurPlan:
    """Host-precomputed symbolic structure of SC = Hpp - U C^-1 U^T."""

    sc_rows: np.ndarray       # [Ksc] unique upper pairs (union of pp and fill)
    sc_cols: np.ndarray
    pp_to_sc: np.ndarray      # [Kpp] position of each pp block in sc pattern
    pair_ki: np.ndarray       # [Npair] index into pl block list (left factor)
    pair_kj: np.ndarray       # [Npair] index into pl block list (right factor)
    pair_seg: np.ndarray      # [Npair] target sc block id
    Ksc: int


def build_schur_plan(pp_rows, pp_cols, pl_rows, pl_cols, Np) -> SchurPlan:
    """Symbolic SC pattern: for every landmark, all upper pairs of the primary
    vertices observing it (reference: the sparsity of U C^-1 V,
    LinearSolver_Schur.h:1744-1767)."""
    order = np.argsort(pl_cols, kind="stable")
    ki_parts, kj_parts = [], []
    # group pl entries by landmark
    sorted_cols = pl_cols[order]
    boundaries = np.flatnonzero(np.diff(sorted_cols)) + 1
    groups = np.split(order, boundaries)
    for g in groups:
        if len(g) == 0:
            continue
        # all ordered pairs (ki, kj) with p_row[ki] <= p_row[kj]
        gi = np.repeat(g, len(g))
        gj = np.tile(g, len(g))
        keep = pl_rows[gi] <= pl_rows[gj]
        ki_parts.append(gi[keep])
        kj_parts.append(gj[keep])
    if ki_parts:
        pair_ki = np.concatenate(ki_parts)
        pair_kj = np.concatenate(kj_parts)
    else:
        pair_ki = np.zeros(0, dtype=np.int64)
        pair_kj = np.zeros(0, dtype=np.int64)

    pair_keys = pl_rows[pair_ki].astype(np.int64) * Np + pl_rows[pair_kj]
    pp_keys = pp_rows.astype(np.int64) * Np + pp_cols
    uniq = np.unique(np.concatenate([pp_keys, pair_keys]))
    sc_rows = (uniq // Np).astype(np.int64)
    sc_cols = (uniq % Np).astype(np.int64)
    pp_to_sc = np.searchsorted(uniq, pp_keys).astype(np.int64)
    pair_seg = np.searchsorted(uniq, pair_keys).astype(np.int64)
    return SchurPlan(sc_rows, sc_cols, pp_to_sc, pair_ki, pair_kj, pair_seg,
                     len(uniq))


def schur_reduce(plan: SchurPlan, pp_blocks, pl_blocks, ll_blocks,
                 eta_p, eta_l, pl_rows_dev, pl_cols_dev, Kpp_to_sc_dev):
    """Forward elimination: returns (sc_blocks [Ksc,Bp,Bp], rhs_p [Np,Bp],
    c_inv [Nl,Bl,Bl], w_blocks [Kpl,Bp,Bl])."""
    Np = eta_p.shape[0]
    c_inv = jnp.linalg.inv(ll_blocks)                       # batched small inverse
    w = jnp.einsum("kij,kjl->kil", pl_blocks, c_inv[pl_cols_dev])  # U C^-1 per block

    # rhs_p = eta_p - W eta_l
    w_eta = jnp.einsum("kil,kl->ki", w, eta_l[pl_cols_dev])
    rhs_p = eta_p - jax.ops.segment_sum(w_eta, pl_rows_dev, num_segments=Np)

    # SC = Hpp - sum_l W_il U_jl^T over pair list
    contrib = jnp.einsum("kil,kjl->kij", w[plan.pair_ki], pl_blocks[plan.pair_kj])
    sc = jax.ops.segment_sum(-contrib, jnp.asarray(plan.pair_seg),
                             num_segments=plan.Ksc)
    sc = sc.at[Kpp_to_sc_dev].add(pp_blocks)
    return sc, rhs_p, c_inv, w


def schur_backsub(dx_p, eta_l, c_inv, pl_blocks, pl_rows_dev, pl_cols_dev, Nl):
    """Landmark back-substitution: dx_l = C^-1 (eta_l - U^T dx_p)."""
    ut_dx = jnp.einsum("kij,ki->kj", pl_blocks, dx_p[pl_rows_dev])  # [Kpl, Bl]
    rhs_l = eta_l - jax.ops.segment_sum(ut_dx, pl_cols_dev, num_segments=Nl)
    return jnp.einsum("lij,lj->li", c_inv, rhs_l)


class SchurSolver:
    """End-to-end Schur solve bound to an Assembler's structure."""

    def __init__(self, asm, dense_reduced: Optional[bool] = None):
        self.asm = asm
        if asm.Nl == 0 or asm.Kpl == 0:
            raise ValueError("Schur solver requires an eliminated class")
        self.plan = build_schur_plan(asm.pp_rows, asm.pp_cols,
                                     asm.pl_rows, asm.pl_cols, asm.Np)
        n_reduced = asm.Np * asm.Bp
        self.dense_reduced = (dense_reduced if dense_reduced is not None
                              else n_reduced <= 12288)
        self._pl_rows_dev = jnp.asarray(asm.pl_rows)
        self._pl_cols_dev = jnp.asarray(asm.pl_cols)
        self._pp_to_sc_dev = jnp.asarray(self.plan.pp_to_sc)
        self._sc_rows_dev = jnp.asarray(self.plan.sc_rows)
        self._sc_cols_dev = jnp.asarray(self.plan.sc_cols)
        if self.dense_reduced:
            self._solve_jit = jax.jit(self._solve_dense_impl)
        else:
            self._reduce_jit = jax.jit(self._reduce_impl)
            self._backsub_jit = jax.jit(self._backsub_impl)
            from slam_plus_plus_tpu.linalg.host_solver import HostSparseSolver
            self._host = HostSparseSolver()

    def _reduce_impl(self, system):
        return schur_reduce(self.plan, system.pp_blocks, system.pl_blocks,
                            system.ll_blocks, system.eta_p, system.eta_l,
                            self._pl_rows_dev, self._pl_cols_dev,
                            self._pp_to_sc_dev)

    def _solve_dense_impl(self, system):
        sc, rhs_p, c_inv, _ = self._reduce_impl(system)
        dx_p = solve_dense_spd(self._sc_rows_dev, self._sc_cols_dev, sc,
                               rhs_p, self.asm.Np, self.asm.Bp)
        dx_l = schur_backsub(dx_p, system.eta_l, c_inv, system.pl_blocks,
                             self._pl_rows_dev, self._pl_cols_dev, self.asm.Nl)
        return dx_p, dx_l

    def _backsub_impl(self, system, dx_p, c_inv):
        return schur_backsub(dx_p, system.eta_l, c_inv, system.pl_blocks,
                             self._pl_rows_dev, self._pl_cols_dev, self.asm.Nl)

    def solve(self, system):
        if self.dense_reduced:
            return self._solve_dense_impl(system) if False else self._solve_jit(system)
        sc, rhs_p, c_inv, _ = self._reduce_jit(system)
        dx_p = jnp.asarray(self._host.solve_blocks(
            self.plan.sc_rows, self.plan.sc_cols, sc, rhs_p,
            self.asm.Np, self.asm.Bp), dtype=rhs_p.dtype)
        dx_l = self._backsub_jit(system, dx_p, c_inv)
        return dx_p, dx_l
