"""Symmetric block-sparse matrix-vector product on the partitioned planar
lambda.

Reference analogue: CUberBlockMatrix::SymmetricMultiply_Add (used by the
dogleg solver's gain computation, reference
include/slam/NonlinearSolver_Lambda_DL.h:1508-1510)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.ops import planar


def lambda_spmv(asm, bs, v_p, v_l):
    """(lambda) @ [v_p; v_l] for the partitioned planar BlockSystem.

    v_p: [Np, Bp], v_l: [Nl, Bl].  Returns (out_p, out_l)."""
    import numpy as np
    Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl

    rows = jnp.asarray(asm.pp_rows)
    cols = jnp.asarray(asm.pp_cols)
    off = jnp.asarray((asm.pp_rows != asm.pp_cols).astype(np.float32))

    # upper blocks: out[row] += H v[col]
    hv = planar.bmv(bs.pp_blocks, v_p[cols], Bp, Bp)
    out_p = jax.ops.segment_sum(hv, rows, num_segments=max(Np, 1))
    # mirrored: out[col] += H^T v[row] (off-diagonal only)
    htv = planar.bmv_At(bs.pp_blocks, v_p[rows], Bp, Bp)
    out_p = out_p + jax.ops.segment_sum(
        htv * off[:, None].astype(htv.dtype), cols, num_segments=max(Np, 1))

    out_l = jnp.zeros((max(Nl, 1), Bl), dtype=v_p.dtype)
    if asm.Nl and asm.Kpl:
        prows = jnp.asarray(asm.pl_rows)
        pcols = jnp.asarray(asm.pl_cols)
        out_p = out_p + jax.ops.segment_sum(
            planar.bmv(bs.pl_blocks, v_l[pcols], Bp, Bl), prows,
            num_segments=max(Np, 1))
        out_l = out_l + jax.ops.segment_sum(
            planar.bmv_At(bs.pl_blocks, v_p[prows], Bp, Bl), pcols,
            num_segments=max(Nl, 1))
    if asm.Nl:
        out_l = out_l + planar.bmv(bs.ll_blocks, v_l, Bl, Bl)
    return out_p, out_l
