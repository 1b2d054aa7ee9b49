"""Device dense solve of a uniform block-sparse SPD system.

Fills the role of the reference's CLinearSolver_DenseEigen / CLinearSolver_DenseGPU
(reference include/slam/LinearSolver_Schur.h:1046,1219): the reduced camera
system after Schur elimination is small and dense — exactly the regime where
a single MXU-tiled Cholesky wins.  XLA's `cholesky`/`triangular_solve` are
already blocked and MXU-scheduled; we add the block-scatter densification.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_dense(rows, cols, blocks, N, B):
    """Upper-pair block list -> dense symmetric [N*B, N*B]."""
    K, Bb, _ = blocks.shape
    dense = jnp.zeros((N, B, N, B), dtype=blocks.dtype)
    dense = dense.at[rows, :, cols, :].add(blocks)
    off = rows != cols
    dense = dense.at[cols, :, rows, :].add(
        jnp.where(off[:, None, None], jnp.swapaxes(blocks, 1, 2), 0.0))
    return dense.reshape(N * B, N * B)


def solve_dense_spd(rows, cols, blocks, rhs, N, B):
    """Solve the block system densely with Cholesky.  rhs: [N, B]."""
    A = scatter_dense(rows, cols, blocks, N, B)
    b = rhs.reshape(N * B)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x.reshape(N, B)
