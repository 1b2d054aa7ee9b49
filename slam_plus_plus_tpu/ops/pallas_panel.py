"""Pallas TPU kernel: masked-broadcast Schur panel builder.

The dominant cost of the flagship BA iteration (round-4 profile: 9.04 ms of
a 12 ms iteration) was the per-landmark one-hot panel einsum — 8000 batched
[600x76]@[76x18] MXU passes at ~7% utilization (the contraction is tall and
the result narrow, the worst shape for a 128x128 systolic array).  This
kernel replaces those matmuls with VPU mask-selects: the panel accumulator
tile lives in VMEM across the whole observation loop, each observation
contributes `tiled * (camera_iota == row)` — elementwise work proportional
to M * Bl * nred with zero HBM round-trips for the accumulator.

This fills the role of the reference's FBS-specialized Schur product kernels
(reference include/slam/BlockMatrixFBS.h:40, LinearSolver_Schur.h:1744-1767
and the cuSPARSE SpDGEMM GPU path, src/slam/LinearSolver_Schur_GPU.cpp:2190)
— redesigned for the TPU memory hierarchy instead of ported.

Layouts:
  u4   [Nl, M, Bl, Bp]  per-landmark padded observation blocks, transposed
                        so (l, p) index the block entry (dummy slots zero)
  rows [Nl, M] int32    camera id per observation slot
  cinv [Nl, Bl*Bl]      landmark pivot inverses
  out  Ut, Wt [Bl, Nl, nred]  panel row-planes; row (l, c) holds landmark
                        c's tangent-l row; W = C^-1-recombination of U is
                        computed in-kernel (no second pass)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _panel_kernel(u4_ref, rows_ref, cinv_ref, ut_ref, wt_ref, *,
                  TL, M, Bl, Bp, n_cams):
    nred = n_cams * Bp
    cam_iota = jax.lax.broadcasted_iota(jnp.int32, (TL, nred), 1) // Bp

    acc = [jnp.zeros((TL, nred), dtype=u4_ref.dtype) for _ in range(Bl)]
    for m in range(M):
        mask = rows_ref[:, m][:, None] == cam_iota          # [TL, nred]
        for l in range(Bl):
            x = u4_ref[:, m, l, :]                          # [TL, Bp]
            tiled = jnp.broadcast_to(
                x[:, None, :], (TL, n_cams, Bp)).reshape(TL, nred)
            acc[l] = acc[l] + jnp.where(mask, tiled, 0.0)
    for l in range(Bl):
        ut_ref[l, :, :] = acc[l]
        w = acc[0] * cinv_ref[:, l * Bl + 0][:, None]
        for k in range(1, Bl):
            w = w + acc[k] * cinv_ref[:, l * Bl + k][:, None]
        wt_ref[l, :, :] = w


@functools.partial(jax.jit,
                   static_argnames=("Bl", "Bp", "n_cams", "interpret",
                                    "tile"))
def build_panels(u4, rows, cinv, Bl, Bp, n_cams, interpret=False, tile=8):
    """Returns (Ut, Wt) as [Bl, Nl, nred] row-planes.

    Nl must be a multiple of `tile` (the assembler's uniform layout pads
    landmark counts; callers pad or pick tile accordingly)."""
    from jax.experimental import pallas as pl

    Nl, M = rows.shape
    nred = n_cams * Bp
    dt = u4.dtype
    assert Nl % tile == 0, (Nl, tile)
    n_tiles = Nl // tile

    kern = functools.partial(_panel_kernel, TL=tile, M=M, Bl=Bl, Bp=Bp,
                             n_cams=n_cams)
    out_shape = [jax.ShapeDtypeStruct((Bl, Nl, nred), dt),
                 jax.ShapeDtypeStruct((Bl, Nl, nred), dt)]
    out_spec = pl.BlockSpec((Bl, tile, nred), lambda i: (0, i, 0))
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, M, Bl, Bp), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((tile, M), lambda i: (i, 0)),
                  pl.BlockSpec((tile, Bl * Bl), lambda i: (i, 0))],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(u4, rows, cinv)
