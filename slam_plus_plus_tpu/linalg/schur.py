"""Schur-complement elimination of the landmark class, fully on device.

Reference analogue: CLinearSolver_Schur::Solve_PosDef_Blocky
(reference include/slam/LinearSolver_Schur.h:1623-1849) and its CUDA backend
(reference src/slam/LinearSolver_Schur_GPU.cpp — cuSPARSE SpDGEMM + CULA dense
Cholesky).  TPU-native design:

  * the guided camera/landmark split is free — the assembler already
    partitions by vertex type (reference CSchurOrdering::n_Calculate_GuidedOrdering,
    LinearSolver_Schur.h:292);
  * C^-1 is an unrolled planar batched inverse (ops/planar.binv — reference
    InverseOf_BlockDiag_FBS_Parallel, BlockMatrix.h:3165);
  * the two SpDGEMMs (U C^-1, U C^-1 V) become **chunked dense GEMMs on the
    MXU**: planar blocks scatter (via precomputed flat indices) into a dense
    [Np*Bp, chunk*Bl] panel and SC accumulates W_panel @ U_panel^T over
    landmark chunks.  A sparse block-pair-product formulation materializes
    [n_pairs, Bp, Bp] intermediates which TPU tiling pads ~28x (observed
    55 GB for 13.5M pairs); the dense panels are tens of MB and run at MXU
    speed-of-light;
  * the reduced camera system solves densely (the reference's own default,
    __SCHUR_USE_DENSE_SOLVER, LinearSolver_Schur.h:49-55) with MXU Cholesky.

Everything is planar ([K, Br*Bc]) until the final dense panels/matrices.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.ops import planar


def _pick_chunk(Nl: int, np_bp: int, Bl: int, target_bytes=512 << 20) -> int:
    """Landmark-chunk size keeping the two dense panels under target_bytes."""
    per_lm = np_bp * Bl * 4 * 2  # U and W panels, f32
    c = max(256, target_bytes // max(per_lm, 1))
    c = int(min(Nl, c))
    return ((c + 255) // 256) * 256 if c >= 256 else c


class SchurSolver:
    """End-to-end Schur solve bound to an Assembler's structure.

    Solve path (all jitted, static shapes, planar block storage):
      c_inv   = planar.binv(ll)                                  [Nl,Bl*Bl]
      w       = planar.bmm(u, c_inv[col])                        [Kpl,Bp*Bl]
      rhs_p   = eta_p - segsum(planar.bmv(w, eta_l[col]))        [Np,Bp]
      SC      = dense(Hpp) - sum over landmark chunks of
                  scatter(w)_panel @ scatter(u)_panel^T          [Np*Bp]^2
      dx_p    = mxu_cholesky_solve(SC, rhs_p)
      dx_l    = planar.bmv(c_inv, eta_l - segsum(u^T dx_p))      [Nl,Bl]
    """

    def __init__(self, asm, dense_reduced: Optional[bool] = None,
                 chunk: Optional[int] = None, panel_mode: str = "auto",
                 sparse_reduced_limit: int = 20000):
        """panel_mode: how the dense panels are built from planar blocks.
        "scatter": flat-index scatter-add (general; XLA scatters serialize
        on TPU).  "onehot": per-landmark one-hot GEMM construction — turns
        the scatter into batched MXU matmuls (observed 2.5x+ faster on TPU);
        requires a bounded max-observations-per-landmark.  "auto" picks
        onehot when the bound is reasonable."""
        self.asm = asm
        self.panel_mode = "sparse"   # overwritten on the dense branches
        if asm.Nl == 0 or asm.Kpl == 0:
            raise ValueError("Schur solver requires an eliminated class")
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        self.n_reduced = Np * Bp

        # many-pose landmark SLAM (cityTrees10k / victoria-park class): the
        # reduced system is itself big and sparse — form SC block-sparsely
        # and solve it with the nested MIS-Schur engine (the reference's
        # sparse blocky reduced solve, LinearSolver_Schur.h:1840-1849),
        # instead of densifying [Np*Bp]^2
        # venice-real-class scenes (871 cams x 100k pts x 800k obs): the
        # reduced system is small enough to densify, but the PANELS are not
        # — [Nl*Bl, nred] at ~1% block density would be ~12.5 GB and the
        # dense SC GEMM would spend >99% of its MXU passes on structural
        # zeros.  Route low-density big-panel scenes through the
        # block-sparse SC too (the reference's sparse blocky reduced solve,
        # LinearSolver_Schur.h:1840-1849).
        panel_gb = 2.0 * Nl * Bl * self.n_reduced * 4 / (1 << 30)
        density = (asm.Kpl * Bp * Bl) / max(Nl * Bl * self.n_reduced, 1)
        self.sparse_reduced = (dense_reduced is not True and
                               (self.n_reduced > sparse_reduced_limit or
                                (panel_gb > 2.0 and density < 0.05)))
        if self.sparse_reduced:
            self._build_sparse_reduced()
            self._solve_jit = jax.jit(self._solve_sparse_impl)
            return

        # uniform-layout fast path: the assembler emitted pl blocks in a
        # padded per-landmark [Nl, M] slot layout (assembler.py uniform
        # layout), so the dense panels are pure reshapes + one-hot einsums —
        # no O(Kpl) gathers/scatters at all.  Falls back to the generic
        # paths when the panels would not fit.
        channels = getattr(asm, "pl_uniform", None)
        panel_bytes = 2 * Nl * Bl * self.n_reduced * 4
        if (panel_mode in ("auto", "uniform") and channels and
                panel_bytes <= (3 << 29)):
            self.panel_mode = "uniform"
            self.max_obs = max(ch["M"] for ch in channels)
            self._pl_rows_dev = jnp.asarray(asm.pl_rows)
            self._pl_cols_dev = jnp.asarray(asm.pl_cols)
            self._uniform_channels = [
                dict(offset=ch["offset"], M=ch["M"],
                     rows=jnp.asarray(np.asarray(ch["rows"])
                                      .reshape(Nl, ch["M"])))
                for ch in channels]
            # degree-bucketed panel padding (round-3 VERDICT weak #3): the
            # per-landmark one-hot einsum pads every landmark to the GLOBAL
            # max observation count; grouping landmarks into <=4 degree
            # buckets bounds each batched MXU pass at the bucket max
            # instead.  Real observations occupy the first `count` slots of
            # each uniform group by construction, so a bucket is a plain
            # leading-axis gather + [:, :Mb] slice.
            import numpy as _np
            for ch, raw in zip(self._uniform_channels, channels):
                counts = raw.get("counts")
                M = ch["M"]
                if counts is None or M < 16:
                    continue
                counts = _np.asarray(counts)
                cand = sorted({-(-M // 8), -(-M // 4), -(-M // 2), M})
                buckets, total, prev = [], 0, 0
                for Mb in cand:
                    sel = _np.flatnonzero((counts > prev) & (counts <= Mb))
                    if len(sel):
                        buckets.append((jnp.asarray(sel), int(Mb)))
                        total += len(sel) * Mb
                    prev = Mb
                if len(buckets) > 1 and total <= 0.85 * len(counts) * M:
                    ch["buckets"] = buckets
            self._build_dense_pp_indices()
            self._solve_jit = jax.jit(self._solve_uniform_impl)
            return
        self.chunk = chunk or _pick_chunk(Nl, self.n_reduced, Bl)
        self.n_chunks = (Nl + self.chunk - 1) // self.chunk

        # per-landmark observation table for the one-hot panel build
        import numpy as _np
        counts = _np.bincount(asm.pl_cols, minlength=Nl)
        self.max_obs = int(counts.max()) if Nl else 0
        if panel_mode == "auto":
            panel_mode = ("onehot" if self.n_chunks == 1 and
                          self.max_obs <= max(4 * counts.mean(), 64)
                          else "scatter")
        self.panel_mode = panel_mode
        if panel_mode == "onehot":
            order0 = _np.argsort(asm.pl_cols, kind="stable")
            tbl = _np.zeros((Nl, self.max_obs), dtype=_np.int32)
            tbl_rows = _np.zeros((Nl, self.max_obs), dtype=_np.int32)
            valid = _np.zeros((Nl, self.max_obs), dtype=_np.float32)
            fill = _np.zeros(Nl, dtype=_np.int64)
            for k in order0:
                c = asm.pl_cols[k]
                j = fill[c]
                tbl[c, j] = k
                tbl_rows[c, j] = asm.pl_rows[k]
                valid[c, j] = 1.0
                fill[c] += 1
            self._obs_tbl = jnp.asarray(tbl)
            self._obs_rows = jnp.asarray(tbl_rows)
            self._obs_valid = jnp.asarray(valid)

        # sort pl blocks by landmark column; chunk ci covers the contiguous
        # range [starts[ci], starts[ci+1]) of the sorted arrays
        order = np.argsort(asm.pl_cols, kind="stable")
        sorted_cols = asm.pl_cols[order]
        sorted_rows = asm.pl_rows[order]
        starts = np.searchsorted(sorted_cols,
                                 np.arange(0, self.n_chunks + 1) * self.chunk)
        self._chunk_starts = jnp.asarray(starts.astype(np.int32))
        # max blocks in any chunk (static pad size for dynamic slices)
        self.max_chunk_blocks = int((starts[1:] - starts[:-1]).max()) \
            if self.n_chunks > 1 else len(order)

        self._order_dev = jnp.asarray(order)
        self._sorted_rows_dev = jnp.asarray(sorted_rows)
        self._sorted_cols_dev = jnp.asarray(sorted_cols)

        # flat scatter indices of each sorted block into a [nred, chunk*Bl]
        # panel, assuming the block's landmark is at chunk-relative column 0;
        # per chunk we add rel_col*Bl to the whole row (see _solve_impl)
        self._panel_base = jnp.asarray(planar.scatter_flat_indices(
            sorted_rows, np.zeros_like(sorted_cols), Bp, Bl,
            row_stride=self.chunk * Bl))

        self._pl_rows_dev = jnp.asarray(asm.pl_rows)
        self._pl_cols_dev = jnp.asarray(asm.pl_cols)
        self._build_dense_pp_indices()

        self._solve_jit = jax.jit(self._solve_impl)

    def _build_dense_pp_indices(self):
        asm = self.asm
        Bp = asm.Bp
        # dense pp scatter: flat indices for upper blocks and their mirrors
        self._pp_idx = jnp.asarray(planar.scatter_flat_indices(
            asm.pp_rows, asm.pp_cols, Bp, Bp, row_stride=self.n_reduced))
        off = asm.pp_rows != asm.pp_cols
        self._pp_idx_t = jnp.asarray(planar.scatter_flat_indices(
            asm.pp_cols, asm.pp_rows, Bp, Bp, row_stride=self.n_reduced))
        self._pp_off_mask = jnp.asarray(off.astype(np.float32))
        self._tperm = [i * Bp + j for j in range(Bp) for i in range(Bp)]

    def _pallas_panels_ok(self, dt) -> bool:
        """The masked-broadcast Pallas panel kernel (ops/pallas_panel.py)
        — DEFAULT OFF after on-chip measurement: the Mosaic-safe
        formulation needs the (landmark, cam-dim) sublane expansion, which
        multiplies the VPU work by Bp and lands at 17.0 ms vs the one-hot
        MXU einsum's 7.7 ms on the bench scene (v5e, 2026-08-21).  Kept
        (with interpret-mode parity tests) as the documented exploration;
        SLAMPP_PALLAS_PANELS=1 opts in."""
        import os
        env = os.environ.get("SLAMPP_PALLAS_PANELS", "0")
        if env in ("0", "off", "auto"):
            return False
        chs = self._uniform_channels
        return (len(chs) == 1 and "buckets" not in chs[0] and
                dt == jnp.float32)

    def _uniform_panels_pallas(self, system, c_inv):
        """Panel build via ops/pallas_panel (VPU mask-select; replaces the
        ~7%-MXU one-hot einsum, the round-4 profile's dominant stage)."""
        from slam_plus_plus_tpu.ops.pallas_panel import build_panels
        asm = self.asm
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        ch = self._uniform_channels[0]
        M = ch["M"]
        u4 = (system.pl_blocks[ch["offset"]:ch["offset"] + Nl * M]
              .reshape(Nl, M, Bp, Bl).transpose(0, 1, 3, 2))
        tile = 8
        pad = (-Nl) % tile
        rows = ch["rows"].astype(jnp.int32)
        cinv = c_inv
        if pad:
            u4 = jnp.concatenate(
                [u4, jnp.zeros((pad,) + u4.shape[1:], u4.dtype)])
            rows = jnp.concatenate(
                [rows, jnp.zeros((pad, M), rows.dtype)])
            cinv = jnp.concatenate(
                [cinv, jnp.zeros((pad, Bl * Bl), cinv.dtype)])
        interp = jax.default_backend() != "tpu"
        Ut, Wt = build_panels(u4, rows, cinv, Bl, Bp, Np,
                              interpret=interp, tile=tile)
        if pad:
            Ut = Ut[:Nl * Bl]
            Wt = Wt[:Nl * Bl]
        return Ut, Wt

    def _uniform_panels(self, system):
        """(c_inv, Ut, Wt) from the uniform [Nl, M] pl layout — pure
        reshapes + one-hot einsums (or the Pallas mask-select kernel), no
        O(Kpl) gathers.  Panels are [Nl*Bl, nred] with rows (landmark,
        tangent) and columns flattened camera dims; shared by the solve
        and the BA marginals recovery."""
        asm = self.asm
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        nred = self.n_reduced
        dt = system.pp_blocks.dtype
        c_inv = planar.binv(system.ll_blocks, Bl)              # [Nl, Bl*Bl]
        if self._pallas_panels_ok(dt):
            Ut, Wt = self._uniform_panels_pallas(system, c_inv)
            return c_inv, Ut, Wt
        u = system.pl_blocks
        Ut = jnp.zeros((Nl * Bl, nred), dtype=dt)
        for ch in self._uniform_channels:
            M, off = ch["M"], ch["offset"]
            u3 = u[off:off + Nl * M].reshape(Nl, M, Bp * Bl)
            if "buckets" in ch:
                # degree buckets: each batched one-hot pass padded to the
                # BUCKET max observation count, not the global max
                Utv = Ut.reshape(Nl, Bl, nred)
                for (sel, Mb) in ch["buckets"]:
                    u3b = u3[sel, :Mb]
                    ohb = (ch["rows"][sel, :Mb, None] ==
                           jnp.arange(Np, dtype=ch["rows"].dtype)[
                               None, None, :]).astype(dt)
                    U3b = jnp.einsum("cmn,cmk->cnk", ohb, u3b)
                    nb = len(sel)
                    Utv = Utv.at[sel].add(
                        U3b.reshape(nb, Np, Bp, Bl).transpose(0, 3, 1, 2)
                        .reshape(nb, Bl, nred))
                Ut = Utv.reshape(Nl * Bl, nred)
                continue
            oh = (ch["rows"][:, :, None] ==
                  jnp.arange(Np, dtype=ch["rows"].dtype)[None, None, :]
                  ).astype(dt)                                  # [Nl, M, Np]
            U3 = jnp.einsum("cmn,cmk->cnk", oh, u3)
            Ut = Ut + (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
                       .reshape(Nl * Bl, nred))
        # W = U C^-1 per landmark block; on the row-partitioned panel this
        # is an unrolled tangent-dim recombination of Ut's row groups —
        # elementwise on [Nl, nred] slices, no batched tiny matmuls
        U3r = Ut.reshape(Nl, Bl, nred)
        Wt = jnp.stack(
            [sum(c_inv[:, l * Bl + k, None] * U3r[:, l, :]
                 for l in range(Bl)) for k in range(Bl)],
            axis=1).reshape(Nl * Bl, nred)
        return c_inv, Ut, Wt

    def _solve_uniform_impl(self, system):
        """Gather-free Schur solve over the uniform [Nl, M] pl layout.

        All landmark-side structures are reshapes of the assembler's padded
        slot arrays; the camera placement is a per-landmark one-hot einsum
        (batched MXU contraction); SC is one large GEMM.  Dummy slots hold
        zero blocks and vanish in every product.
        """
        asm = self.asm
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        nred = self.n_reduced
        dt = system.pp_blocks.dtype

        c_inv, Ut, Wt = self._uniform_panels(system)

        eta_l_flat = system.eta_l.reshape(Nl * Bl)
        rhs_flat = system.eta_p.reshape(nred) - Wt.T @ eta_l_flat
        sc = self._dense_pp(system.pp_blocks) - Wt.T @ Ut

        L = jnp.linalg.cholesky(sc)
        y = jax.scipy.linalg.solve_triangular(L, rhs_flat, lower=True)
        dx_flat = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx_p = dx_flat.reshape(Np, Bp)

        ut_dx = (Ut @ dx_flat).reshape(Nl, Bl)
        dx_l = planar.bmv(c_inv, system.eta_l - ut_dx, Bl, Bl)
        return dx_p, dx_l

    def _build_sparse_reduced(self):
        """Host plan: SC pattern = pp pairs + landmark-induced fill pairs;
        per-landmark (i<=j) observation pairs feed batched planar products
        segment-summed into the pattern (one more MIS level, with the whole
        landmark class as the independent set)."""
        asm = self.asm
        Np = asm.Np
        order = np.argsort(asm.pl_cols, kind="stable")
        rows_s = asm.pl_rows[order]
        counts = np.bincount(asm.pl_cols, minlength=asm.Nl)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pa_l, pb_l = [], []
        for d in np.unique(counts):
            if d == 0:
                continue
            g = np.flatnonzero(counts == d)
            ii, jj = np.triu_indices(d)
            base = starts[g][:, None]
            pa_l.append((base + ii[None, :]).ravel())
            pb_l.append((base + jj[None, :]).ravel())
        pa = np.concatenate(pa_l) if pa_l else np.zeros(0, dtype=np.int64)
        pb = np.concatenate(pb_l) if pb_l else np.zeros(0, dtype=np.int64)
        ra, rb = rows_s[pa], rows_s[pb]
        p_flip = ra > rb
        fill_keys = np.where(p_flip, rb * Np + ra, ra * Np + rb)
        pp_keys = asm.pp_rows * Np + asm.pp_cols
        sc_keys = np.unique(np.concatenate([pp_keys, fill_keys]))
        self._sc_rows = sc_keys // Np
        self._sc_cols = sc_keys % Np
        self._pp_to_sc = jnp.asarray(np.searchsorted(sc_keys, pp_keys))
        self._fill_dst = jnp.asarray(np.searchsorted(sc_keys, fill_keys))
        self._fill_pa = jnp.asarray(order[pa])   # original pl block ids
        self._fill_pb = jnp.asarray(order[pb])
        self._fill_flip = jnp.asarray(p_flip)
        self.Ksc = len(sc_keys)
        from slam_plus_plus_tpu.linalg.block_cholesky import (
            BlockCholeskySolver)
        self._reduced_chol = BlockCholeskySolver(
            self._sc_rows, self._sc_cols, Np, asm.Bp)
        self._pl_rows_dev = jnp.asarray(asm.pl_rows)
        self._pl_cols_dev = jnp.asarray(asm.pl_cols)
        self._tperm = [i * asm.Bp + j for j in range(asm.Bp)
                       for i in range(asm.Bp)]

        # uniform-layout clique fast path (venice-real profile, v5e: the
        # w and pair-product GATHERS cost 112 + 205 ms/solve at 800k/3.6M
        # rows — TPU gathers are ~11 ns/row regardless of locality).  With
        # the single-channel uniform [Nl, M] layout every gather becomes a
        # reshape/broadcast and the pair products one batched per-landmark
        # clique einsum [M*Bp, Bl] @ [Bl, M*Bp]; the existing
        # _fill_dst/_fill_flip arrays already enumerate the same
        # landmark-major triu order (np.triu_indices over uniform degree).
        self._clique_uniform = None
        ch = getattr(asm, "pl_uniform", None)
        if (ch and len(ch) == 1 and len(np.unique(counts)) == 1 and
                int(counts[0]) == int(ch[0]["M"]) and
                np.array_equal(order, np.arange(len(order)))):
            M = int(ch[0]["M"])
            ii, jj = np.triu_indices(M)
            self._clique_uniform = dict(
                M=M, triu=jnp.asarray((ii * M + jj).astype(np.int32)))

    def _solve_sparse_impl(self, system):
        # full-f32 pin: the formed SC feeds the MIS-Schur factorization,
        # which needs an exactly-SPD input — TPU default f32 matmuls round
        # through bf16 and corrupted lambda assembly the same way
        # (docs/BENCH_NOTES.md round-4 root cause)
        with jax.default_matmul_precision("highest"):
            return self._solve_sparse_body(system)

    def _solve_sparse_body(self, system):
        asm = self.asm
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        dt = system.pp_blocks.dtype
        cu = self._clique_uniform
        c_inv = planar.binv(system.ll_blocks, Bl)
        u = system.pl_blocks
        if cu is not None:
            # gather-free: c_inv/eta_l broadcast over the uniform M slots
            M = cu["M"]
            ci_rep = jnp.broadcast_to(
                c_inv[:, None, :], (Nl, M, Bl * Bl)).reshape(Nl * M,
                                                             Bl * Bl)
            w = planar.bmm(u, ci_rep, Bp, Bl, Bl)
            eta_rep = jnp.broadcast_to(
                system.eta_l[:, None, :], (Nl, M, Bl)).reshape(Nl * M, Bl)
            w_eta = planar.bmv(w, eta_rep, Bp, Bl)
        else:
            w = planar.bmm(u, c_inv[self._pl_cols_dev], Bp, Bl, Bl)
            w_eta = planar.bmv(w, system.eta_l[self._pl_cols_dev], Bp, Bl)
        rhs_p = system.eta_p - jax.ops.segment_sum(
            w_eta, self._pl_rows_dev, num_segments=Np)

        sc = jnp.zeros((self.Ksc, Bp * Bp), dtype=dt)
        sc = sc.at[self._pp_to_sc].set(system.pp_blocks)
        if cu is not None:
            # chunked over landmarks: the full clique tensor
            # [Nl, M, M, Bp*Bp] is ~0.9 GB at venice-real scale and tipped
            # HBM over capacity by 75 MB — each chunk's triu products
            # segment-sum straight into sc (fill_dst is landmark-major, so
            # chunk slices are contiguous)
            M = cu["M"]
            T = M * (M + 1) // 2
            nch = max(1, -(-Nl // 25000))
            CL = -(-Nl // nch)
            flip = self._fill_flip.reshape(Nl, T)
            dstv = self._fill_dst.reshape(Nl, T)
            for c0 in range(0, Nl, CL):
                c1 = min(c0 + CL, Nl)
                W4 = w.reshape(Nl, M, Bp, Bl)[c0:c1]
                U4 = u.reshape(Nl, M, Bp, Bl)[c0:c1]
                clique = jnp.einsum("cmil,cnjl->cmnij", W4, U4)
                pr = (clique.reshape(c1 - c0, M * M, Bp * Bp)
                      [:, cu["triu"]].reshape(-1, Bp * Bp))
                pr = jnp.where(flip[c0:c1].reshape(-1)[:, None],
                               planar.btranspose(pr, Bp, Bp), pr)
                sc = sc - jax.ops.segment_sum(
                    pr, dstv[c0:c1].reshape(-1), num_segments=self.Ksc)
        else:
            prod = planar.bmm_A_Bt(w[self._fill_pa], u[self._fill_pb],
                                   Bp, Bl, Bp)
            prod = jnp.where(self._fill_flip[:, None],
                             planar.btranspose(prod, Bp, Bp), prod)
            sc = sc - jax.ops.segment_sum(prod, self._fill_dst,
                                          num_segments=self.Ksc)
        dx_p = self._reduced_chol._factor_solve_impl(sc, rhs_p)

        ut_dx = planar.bmv_At(u, dx_p[self._pl_rows_dev], Bp, Bl)
        if cu is not None:
            rhs_l = system.eta_l - ut_dx.reshape(Nl, cu["M"], Bl).sum(1)
        else:
            rhs_l = system.eta_l - jax.ops.segment_sum(
                ut_dx, self._pl_cols_dev, num_segments=Nl)
        dx_l = planar.bmv(c_inv, rhs_l, Bl, Bl)
        return dx_p, dx_l

    def _dense_pp(self, pp_blocks):
        """Planar upper block pairs -> dense symmetric [nred, nred]."""
        nred = self.n_reduced
        dt = pp_blocks.dtype
        dense = jnp.zeros((nred * nred,), dtype=dt)
        dense = dense.at[self._pp_idx.reshape(-1)].add(pp_blocks.reshape(-1))
        mirrored = (pp_blocks[:, self._tperm] *
                    self._pp_off_mask[:, None].astype(dt))
        dense = dense.at[self._pp_idx_t.reshape(-1)].add(mirrored.reshape(-1))
        return dense.reshape(nred, nred)

    def _solve_impl(self, system):
        asm = self.asm
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        nred = self.n_reduced
        dt = system.pp_blocks.dtype

        c_inv = planar.binv(system.ll_blocks, Bl)              # [Nl, Bl*Bl]
        u = system.pl_blocks                                    # [Kpl, Bp*Bl]
        w = planar.bmm(u, c_inv[self._pl_cols_dev], Bp, Bl, Bl)

        # rhs_p = eta_p - W eta_l
        w_eta = planar.bmv(w, system.eta_l[self._pl_cols_dev], Bp, Bl)
        rhs_p = system.eta_p - jax.ops.segment_sum(
            w_eta, self._pl_rows_dev, num_segments=Np)

        # SC = dense(Hpp) - sum_chunks W_panel @ U_panel^T  (MXU GEMMs)
        sc0 = self._dense_pp(system.pp_blocks)
        u_sorted = u[self._order_dev]
        w_sorted = w[self._order_dev]
        C = self.chunk
        panel_elems = nred * C * Bl

        def build_panel(vals, idx):
            panel = jnp.zeros((panel_elems,), dtype=dt)
            return panel.at[idx.reshape(-1)].add(
                vals.reshape(-1)).reshape(nred, C * Bl)

        if self.panel_mode == "onehot" and self.n_chunks == 1:
            # scatter-free: per-landmark one-hot GEMM panel construction.
            # For each landmark, its <= max_obs blocks are summed into camera
            # rows via a one-hot contraction — batched MXU matmuls instead of
            # a serialized TPU scatter.
            M = self.max_obs
            u_pad = u[self._obs_tbl] * self._obs_valid[:, :, None].astype(dt)
            w_pad = w[self._obs_tbl] * self._obs_valid[:, :, None].astype(dt)
            onehot = (self._obs_rows[:, :, None] ==
                      jnp.arange(Np, dtype=self._obs_rows.dtype)[None, None, :]
                      ).astype(dt) * self._obs_valid[:, :, None].astype(dt)
            # [Nl, M, Np] x [Nl, M, Bp*Bl] -> [Nl, Np, Bp*Bl]
            U3 = jnp.einsum("cmn,cmk->cnk", onehot, u_pad)
            W3 = jnp.einsum("cmn,cmk->cnk", onehot, w_pad)
            # -> [Nl*Bl, nred] panels (transpose block cols to rows)
            Ut = (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
                  .reshape(Nl * Bl, nred))
            Wt = (W3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
                  .reshape(Nl * Bl, nred))
            sc = sc0 - Wt.T @ Ut
        elif self.n_chunks == 1:
            idx = self._panel_base + (self._sorted_cols_dev * Bl)[:, None]
            up = build_panel(u_sorted, idx)
            wp = build_panel(w_sorted, idx)
            sc = sc0 - wp @ up.T
        else:
            M = self.max_chunk_blocks

            def body(sc, ci):
                lo = self._chunk_starts[ci]
                n_in = self._chunk_starts[ci + 1] - lo
                sl = jnp.arange(M, dtype=lo.dtype) + lo
                valid = jnp.arange(M) < n_in
                sl = jnp.minimum(sl, u_sorted.shape[0] - 1)
                mask = valid.astype(dt)[:, None]
                rel = self._sorted_cols_dev[sl] - ci * C
                idx = self._panel_base[sl] + (rel * Bl)[:, None]
                idx = jnp.where(valid[:, None], idx, 0)
                up = build_panel(u_sorted[sl] * mask, idx)
                wp = build_panel(w_sorted[sl] * mask, idx)
                return sc - wp @ up.T, None

            sc, _ = jax.lax.scan(body, sc0, jnp.arange(self.n_chunks))

        # dense reduced solve (MXU Cholesky)
        L = jnp.linalg.cholesky(sc)
        y = jax.scipy.linalg.solve_triangular(L, rhs_p.reshape(nred),
                                              lower=True)
        dx_flat = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx_p = dx_flat.reshape(Np, Bp)

        # landmark backsub: dx_l = C^-1 (eta_l - U^T dx_p)
        ut_dx = planar.bmv_At(u, dx_p[self._pl_rows_dev], Bp, Bl)
        rhs_l = system.eta_l - jax.ops.segment_sum(
            ut_dx, self._pl_cols_dev, num_segments=Nl)
        dx_l = planar.bmv(c_inv, rhs_l, Bl, Bl)
        return dx_p, dx_l

    # public ------------------------------------------------------------

    def solve(self, system):
        return self._solve_jit(system)

    def solve_impl(self, system):
        """Unjitted impl dispatch — for embedding in fused step functions
        (bench / __graft_entry__) that jit the whole iteration."""
        if self.panel_mode == "uniform":
            return self._solve_uniform_impl(system)
        if self.sparse_reduced:
            return self._solve_sparse_impl(system)
        return self._solve_impl(system)

    # exposed for fused step functions (bench / __graft_entry__)
    _solve_dense_impl = solve_impl
