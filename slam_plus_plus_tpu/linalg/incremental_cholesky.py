"""Incremental (dirty-set) refactorization of the nested MIS-Schur factor,
fused into a single scanned device program per step.

The O(affected)-per-step analogue of the reference FastL's trailing-submatrix
R11 refactorization (reference include/slam/NonlinearSolver_FastL.h:2104-2263
Refresh_R_IncR11/Refresh_d_IncR11): when new-edge Hessian contributions
(omega) land on a few lambda pairs, only the factorization blocks REACHABLE
from those pairs change.  Reachability follows the elimination levels of
linalg/block_cholesky.py.

TPU-shaped redesign (round 4): the previous engine unrolled a Python loop
over the L elimination levels into one XLA graph of ~15 ops/level — hundreds
of tiny sequential ops, the wrong shape for the chip (80 ms/step observed on
TPU, ~11 ms on CPU) and a multi-second compile.  This version:

  * stores the whole factorization FLAT: one [sum K_l, B*B] array per kind
    (H pattern blocks incl. the bottom, pivot inverses C, couplings W, fill
    products P), each with two trailing rows — DUMMY (always zero, the
    target of padded *gathers*) and SINK (scratch, the target of padded
    *scatters*).  With that convention no mask vectors are needed anywhere:
    a padded lane reads zeros, computes zeros, and writes them where nobody
    looks.
  * gives every level the SAME dirty-set capacities, so the per-level update
    is one `lax.scan` body (~15 ops TOTAL in the compiled program, L trips)
    instead of 15*L unrolled ops.  The host walk packs global flat indices
    into one [L, SLOTS] int32 buffer — a single host->device transfer.
  * fuses the dirty refactorization, the dense-bottom re-Cholesky, AND the
    solve (descend + bottom + ascend, also scans) into ONE jitted program
    returning (stores', dx, |dx|): one dispatch per incremental step.

Per-level capacities are fixed at plan time; a step whose dirty set
overflows falls back to the full (still batched) redescent — the analogue
of the reference's Refresh_R_FullR fallback (NonlinearSolver_FastL.h:2367).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.ops import planar
from slam_plus_plus_tpu.linalg.block_cholesky import (
    BlockCholeskySolver, _equilibrated_cholesky, _full_f32)


class IncrementalCholesky:
    _NOT_PREPARED = object()   # sentinel: "compute prepare_host inline"

    def __init__(self, chol: BlockCholeskySolver,
                 caps: Optional[dict] = None, omega_cap: int = 768):
        self.chol = chol
        self.plan = chol.plan
        self.B = chol.B
        # static capacity of the per-step omega delta batch: the fused step
        # compiles exactly once; larger batches overflow to the full
        # redescent (amortized — they only arise from long quiet stretches)
        self.omega_cap = omega_cap
        self._build_offsets()
        self._set_caps(caps)
        self._build_host_maps()
        self._build_solve_consts()
        # stores are donated: the step updates tens of MB of factor state in
        # place instead of copying it every step
        self._step_jit = jax.jit(self._step_impl, donate_argnums=(0,))
        self._full_jit = jax.jit(self._full_impl)
        self._solve_jit = jax.jit(self._solve_only_impl)
        self.n_overflows = 0

    # ------------------------------------------------------------------
    # flat store layout
    # ------------------------------------------------------------------

    def _build_offsets(self) -> None:
        plan = self.plan
        levels = plan.levels
        # H: level patterns 0..L-1, then the bottom pattern, then dummy+sink
        self.off_H = np.concatenate(
            [[0], np.cumsum([lv.K for lv in levels])]).astype(np.int64)
        self.KB = len(plan._bottom_idx)          # bottom pattern pairs
        self.KH = int(self.off_H[-1]) + self.KB  # data rows
        self.H_dummy, self.H_sink = self.KH, self.KH + 1
        self.off_H_bottom = int(self.off_H[-1])

        self.off_C = np.concatenate(
            [[0], np.cumsum([lv.n_elim for lv in levels])]).astype(np.int64)
        self.NC = int(self.off_C[-1])
        self.C_dummy, self.C_sink = self.NC, self.NC + 1

        self.off_W = np.concatenate(
            [[0], np.cumsum([len(lv.u_src) for lv in levels])]).astype(
                np.int64)
        self.NW = int(self.off_W[-1])
        self.W_dummy, self.W_sink = self.NW, self.NW + 1

        self.off_P = np.concatenate(
            [[0], np.cumsum([len(lv.pa) for lv in levels])]).astype(np.int64)
        self.NP = int(self.off_P[-1])
        self.P_dummy = self.NP          # P pad is both gather and scatter:
        #                                 padded lanes write the zeros they
        #                                 read, so one row serves both roles

        nbB = plan.n_bottom * self.B
        self.nbB = nbB
        self.dense_sink = nbB * nbB     # dense stored flat with 1 sink slot

        # device-constant extended bottom scatter plans (row KB = sink)
        sink_row = np.full((1, self.B * self.B), self.dense_sink)
        self._bot_idx_ext = jnp.asarray(np.concatenate(
            [plan._bottom_idx, sink_row]).astype(np.int32))
        self._bot_idx_t_ext = jnp.asarray(np.concatenate(
            [plan._bottom_idx_t, sink_row]).astype(np.int32))
        self._bot_off_ext = jnp.asarray(
            np.concatenate([plan._bottom_off, [0.0]]))
        self._tperm = np.asarray(plan._tperm)

    def _set_caps(self, caps) -> None:
        # uniform per-level capacities (the scan body is one program).
        # Dirty sets stay small and nearly scale-free (a few dozen pairs
        # even at the deepest level on 10k-pose replays — measured); the
        # full redescent is the (rare) overflow fallback.
        if caps is None:
            caps = {}
        levels = self.plan.levels
        self.cap_d = int(caps.get("d", 384))
        self.cap_e = int(caps.get("e", 192))
        self.cap_w = int(caps.get("w", 384))
        self.cap_p = int(caps.get("p", 768))
        if levels:
            self.cap_e = min(self.cap_e, max(lv.n_elim for lv in levels) + 1)
            self.cap_w = min(self.cap_w,
                             max(len(lv.u_src) for lv in levels) + 1)
            self.cap_p = min(self.cap_p,
                             max(len(lv.pa) for lv in levels) + 1)
        self.cap_d = min(self.cap_d,
                         max(max((lv.K for lv in levels), default=1),
                             self.KB) + 1)
        # flat per-level slot layout (int32): all global indices.  The
        # *_dpos/_epos/_wapos slots localize each read to this step's dirty
        # lists so the scan body never touches the big stores — old values
        # are gathered once OUTSIDE the scan (see _step_impl), and the scan
        # carries only the [cap_d, B*B] running pair deltas.  (Carrying the
        # full H/C/W/P through the scan forced XLA to copy them every
        # level: 3.8 ms/step at 3500 poses; the small-carry form is ~1 ms.)
        slots = [("d_pos", self.cap_d), ("e_diag", self.cap_e),
                 ("e_pos", self.cap_e), ("e_dpos", self.cap_e),
                 ("w_usrc", self.cap_w), ("w_celim", self.cap_w),
                 ("w_pos", self.cap_w), ("w_dpos", self.cap_w),
                 ("w_epos", self.cap_w),
                 ("p_wa", self.cap_p), ("p_wapos", self.cap_p),
                 ("p_ubsrc", self.cap_p), ("p_ub_dpos", self.cap_p),
                 ("p_pos", self.cap_p), ("p_seg", self.cap_p),
                 ("c_pos", self.cap_d), ("c_seg", self.cap_d)]
        off = 0
        self._slots = {}
        for name, size in slots:
            self._slots[name] = (off, off + size)
            off += size
        self._row_len = off

    # ------------------------------------------------------------------
    # host symbolic maps (reachability walk)
    # ------------------------------------------------------------------

    def _build_host_maps(self) -> None:
        self.maps = []
        for lv in self.plan.levels:
            elim_of_pair = np.full(lv.K, -1, dtype=np.int64)
            elim_of_pair[lv.elim_diag_idx] = np.arange(lv.n_elim)
            u_of_pair = np.full(lv.K, -1, dtype=np.int64)
            u_of_pair[lv.u_src] = np.arange(len(lv.u_src))
            carry_dst_of_pair = np.full(lv.K, -1, dtype=np.int64)
            carry_dst_of_pair[lv.carry_src] = lv.carry_dst

            # u grouped by elim (u arrays are already sorted by u_elim)
            cnt = np.bincount(lv.u_elim, minlength=lv.n_elim)
            u_start = np.concatenate([[0], np.cumsum(cnt)])

            # prods grouped by pa and by pb
            order_a = np.argsort(lv.pa, kind="stable")
            a_start = np.concatenate(
                [[0], np.cumsum(np.bincount(lv.pa[order_a],
                                            minlength=len(lv.u_src)))]) \
                if len(lv.pa) else np.zeros(len(lv.u_src) + 1, dtype=np.int64)
            order_b = np.argsort(lv.pb, kind="stable")
            b_start = np.concatenate(
                [[0], np.cumsum(np.bincount(lv.pb[order_b],
                                            minlength=len(lv.u_src)))]) \
                if len(lv.pb) else np.zeros(len(lv.u_src) + 1, dtype=np.int64)

            self.maps.append(dict(
                elim_of_pair=elim_of_pair, u_of_pair=u_of_pair,
                carry_dst_of_pair=carry_dst_of_pair,
                u_start=u_start,
                prods_by_pa=order_a, pa_start=a_start,
                prods_by_pb=order_b, pb_start=b_start))

    def _host_walk(self, dirty_pos: List[np.ndarray]):
        """Walk reachability level by level; returns per-level bundles
        (host numpy, level-local indices) or (None, None) on capacity
        overflow.  dirty_pos: per-edge level-0 pair position arrays."""
        plan = self.plan
        levels = plan.levels
        bundles = []
        all_pos = (np.concatenate(dirty_pos) if dirty_pos
                   else np.zeros(0, dtype=np.int64))
        D, _ = np.unique(all_pos, return_inverse=True)

        for li, lv in enumerate(levels):
            m = self.maps[li]
            if len(D) > self.cap_d:
                return None, None
            e_ids = m["elim_of_pair"][D]
            E_d = e_ids[e_ids >= 0]
            u_val = m["u_of_pair"][D]
            U_val_d = u_val[u_val >= 0]
            # W dirty: U value changed, or pivot inverse changed
            if len(E_d):
                us, ue = m["u_start"][E_d], m["u_start"][E_d + 1]
                tot = (ue - us).sum()
                w_from_e = np.repeat(us, ue - us) + (
                    np.arange(tot) - np.repeat(np.cumsum(ue - us) - (ue - us),
                                               ue - us))
            else:
                w_from_e = np.zeros(0, dtype=np.int64)
            W_d = np.unique(np.concatenate([U_val_d, w_from_e]))

            def _ranges(ids, order, start):
                if not len(ids):
                    return np.zeros(0, dtype=np.int64)
                s, e = start[ids], start[ids + 1]
                tot = (e - s).sum()
                flat = np.repeat(s, e - s) + (
                    np.arange(tot) - np.repeat(np.cumsum(e - s) - (e - s),
                                               e - s))
                return order[flat]
            P_d = np.unique(np.concatenate([
                _ranges(W_d, m["prods_by_pa"], m["pa_start"]),
                _ranges(U_val_d, m["prods_by_pb"], m["pb_start"])]))
            if (len(E_d) > self.cap_e or len(W_d) > self.cap_w or
                    len(P_d) > self.cap_p):
                return None, None

            # next-level dirty pairs: carry copies + product destinations
            carry_dst = m["carry_dst_of_pair"][D]
            carry_sel = np.flatnonzero(carry_dst >= 0)   # positions in D
            p_dst = lv.p_dst[P_d] if len(P_d) else np.zeros(0, dtype=np.int64)
            D_next = np.unique(np.concatenate([carry_dst[carry_sel], p_dst]))
            carry_seg = np.searchsorted(D_next, carry_dst[carry_sel])
            p_seg = np.searchsorted(D_next, p_dst)

            bundles.append(dict(
                D=D, E=E_d, W=W_d, P=P_d,
                carry_sel=carry_sel, carry_seg=carry_seg, p_seg=p_seg))
            D = D_next

        if len(D) > self.cap_d:
            return None, None
        return bundles, D

    def _pack(self, bundles, D_bot):
        """Pack the walk into the [L, ROW] int32 buffer (global indices,
        pads per the dummy/sink convention) + the bottom selection."""
        plan, B = self.plan, self.B
        L = len(plan.levels)
        buf = np.empty((max(L, 1), self._row_len), dtype=np.int32)
        s = self._slots

        def put(row, name, a, fill):
            lo, hi = s[name]
            n = len(a)
            row[lo:lo + n] = a
            row[lo + n:hi] = fill

        def locate(sorted_list, values, miss):
            """Position of each value in sorted_list, or `miss`."""
            if not len(values) or not len(sorted_list):
                return np.full(len(values), miss, dtype=np.int64)
            pos = np.searchsorted(sorted_list, values)
            pos_c = np.minimum(pos, len(sorted_list) - 1)
            hit = np.asarray(sorted_list)[pos_c] == values
            return np.where(hit, pos_c, miss)

        for li, lv in enumerate(plan.levels):
            b = bundles[li]
            row = buf[li]
            oh, oc, ow, op = (self.off_H[li], self.off_C[li],
                              self.off_W[li], self.off_P[li])
            D, E, Wd, P = b["D"], b["E"], b["W"], b["P"]
            if li == 0:
                # level-0 H values were already updated by the omega scatter;
                # the add becomes a no-op into the sink (d_val still carries
                # the deltas for propagation)
                put(row, "d_pos", np.full(len(D), self.H_sink), self.H_sink)
            else:
                put(row, "d_pos", oh + D, self.H_sink)
            # delta localization: position of each read pair in this level's
            # dirty list D, or cap_d (zero row).  At level 0 the omega
            # kernel has ALREADY scattered the deltas into H, so the
            # pre-gathered old values are current — localize to the zero
            # row to avoid double-counting.
            def dloc(pairs):
                if li == 0:
                    return np.full(len(pairs), self.cap_d, dtype=np.int64)
                return locate(D, pairs, self.cap_d)

            put(row, "e_diag", oh + lv.elim_diag_idx[E], self.H_dummy)
            put(row, "e_pos", oc + E, self.C_sink)
            # every dirty pivot's diag pair is in D by construction
            put(row, "e_dpos", dloc(lv.elim_diag_idx[E]), self.cap_d)
            # W inputs: U source pair (flip encoded in sign: ~idx = flip)
            usrc = oh + lv.u_src[Wd]
            usrc = np.where(lv.u_flip[Wd], -usrc - 1, usrc)
            put(row, "w_usrc", usrc, self.H_dummy)
            put(row, "w_celim", oc + lv.u_elim[Wd], self.C_dummy)
            put(row, "w_pos", ow + Wd, self.W_sink)
            put(row, "w_dpos", dloc(lv.u_src[Wd]), self.cap_d)
            put(row, "w_epos", locate(E, lv.u_elim[Wd], self.cap_e),
                self.cap_e)
            # fill products
            put(row, "p_wa", ow + lv.pa[P], self.W_dummy)
            put(row, "p_wapos", locate(Wd, lv.pa[P], self.cap_w), self.cap_w)
            ub = oh + lv.u_src[lv.pb[P]]
            ub = np.where(lv.u_flip[lv.pb[P]], -ub - 1, ub)
            put(row, "p_ubsrc", ub, self.H_dummy)
            put(row, "p_ub_dpos", dloc(lv.u_src[lv.pb[P]]), self.cap_d)
            ppos = op + P
            ppos = np.where(lv.p_flip[P], -ppos - 1, ppos)
            put(row, "p_pos", ppos, self.P_dummy)
            put(row, "p_seg", b["p_seg"], self.cap_d)
            put(row, "c_pos", b["carry_sel"], self.cap_d)
            put(row, "c_seg", b["carry_seg"], self.cap_d)

        bot_sel = np.full(self.cap_d, self.KB, dtype=np.int32)
        bot_sel[:len(D_bot)] = D_bot
        bot_h = np.full(self.cap_d, self.H_sink, dtype=np.int32)
        bot_h[:len(D_bot)] = self.off_H_bottom + D_bot
        return buf, bot_sel, bot_h

    # ------------------------------------------------------------------
    # full redescent -> flat stores
    # ------------------------------------------------------------------

    @_full_f32
    def _full_impl(self, H0):
        """Full redescent from level-0 blocks (PLAN order, [K0, B*B]),
        producing the flat stores the fused step updates in place."""
        with jax.default_matmul_precision("highest"):
            plan, B = self.plan, self.B
            sv, outer0 = self.chol._jacobi_scale(H0)
            H_parts, C_parts, W_parts, P_parts = [], [], [], []
            H = H0 * outer0
            for li, lv in enumerate(plan.levels):
                dt = H.dtype
                H_parts.append(H)
                C = H[lv.elim_diag_idx]
                if dt == jnp.float32:
                    # f32 pivot ridge (see block_cholesky._descend): bounds
                    # kappa of eliminated pivots so c_inv stays a contraction
                    dmean = jnp.mean(jnp.abs(planar.bdiag(C, B)), axis=1)
                    C = planar.badd_diag(C, 1e-5 * jnp.maximum(dmean, 1e-30),
                                         B)
                c_inv = planar.binv(C, B)
                U0 = H[lv.u_src]
                U = jnp.where(jnp.asarray(lv.u_flip)[:, None],
                              planar.btranspose(U0, B, B), U0)
                W = planar.bmm(U, c_inv[lv.u_elim], B, B, B)
                if len(lv.pa):
                    prod = planar.bmm_A_Bt(W[lv.pa], U[lv.pb], B, B, B)
                    prod = jnp.where(jnp.asarray(lv.p_flip)[:, None],
                                     planar.btranspose(prod, B, B), prod)
                else:
                    prod = jnp.zeros((0, B * B), dtype=dt)
                Hn = jnp.zeros((lv.K_next, B * B), dtype=dt)
                Hn = Hn.at[jnp.asarray(lv.carry_dst)].set(H[lv.carry_src])
                if len(lv.pa):
                    Hn = Hn - jax.ops.segment_sum(
                        prod, jnp.asarray(lv.p_dst), num_segments=lv.K_next)
                C_parts.append(c_inv)
                W_parts.append(W)
                P_parts.append(prod)
                H = Hn
            H_parts.append(H)    # bottom pattern blocks
            dense = self.chol._bottom_dense(H)
            L, s = _equilibrated_cholesky(dense)
            dt = H.dtype
            pad2 = jnp.zeros((2, B * B), dtype=dt)
            pad1 = jnp.zeros((1, B * B), dtype=dt)
            return dict(
                H=jnp.concatenate(H_parts + [pad2]),
                C=jnp.concatenate(C_parts + [pad2]),
                W=jnp.concatenate(W_parts + [pad2]),
                P=jnp.concatenate(P_parts + [pad1]),
                dense=jnp.concatenate([dense.reshape(-1),
                                       jnp.zeros((1,), dtype=dt)]),
                L=L, s=s, sv=sv,
                outer0=jnp.concatenate(
                    [outer0, jnp.ones((1, B * B), dtype=dt)]))

    def init_stores(self, H0) -> Dict:
        """H0: level-0 blocks in PLAN order, no dummy row.

        The returned stores expose 'H0' as an ALIAS of the flat H — level-0
        positions are < K0, so omega scatters land in the right segment."""
        out = dict(self._full_jit(H0))
        out["H0"] = out["H"]
        return out

    def refactor_full(self, stores) -> Dict:
        K0 = int(self.off_H[1]) if len(self.plan.levels) else self.KH
        raw = stores["H"][:K0] / stores["outer0"][:K0]
        out = dict(self._full_jit(raw))
        out["H0"] = out["H"]
        return out

    # ------------------------------------------------------------------
    # fused step: dirty refactorization + bottom + solve, one dispatch
    # ------------------------------------------------------------------

    def _dirty_scan(self, stores, omega_vals, omega_seg, buf, bot_sel,
                    bot_h):
        plan, B = self.plan, self.B
        H, C, W, P = stores["H"], stores["C"], stores["W"], stores["P"]
        dt = H.dtype

        # level-0 dirty values from the omega deltas (padded rows: dropped
        # segment cap_d sums to the sliced-off row)
        d_val = jax.ops.segment_sum(omega_vals, omega_seg,
                                    num_segments=self.cap_d + 1)[:self.cap_d]

        s = self._slots

        def col(name):
            lo, hi = s[name]
            return buf[:, lo:hi]                       # [L, cap]

        # ---- pre-gather every OLD value the scan reads (batched over all
        # levels; the big stores never enter the scan carry) --------------
        usrc = col("w_usrc")
        uflip = usrc < 0
        usrc = jnp.where(uflip, -usrc - 1, usrc)
        ub = col("p_ubsrc")
        ubflip = ub < 0
        ub = jnp.where(ubflip, -ub - 1, ub)
        ppos = col("p_pos")
        pflip = ppos < 0
        ppos = jnp.where(pflip, -ppos - 1, ppos)
        pre = dict(
            Hd_old=H[col("e_diag")], Uw_old=H[usrc], uflip=uflip,
            C_old_w=C[col("w_celim")], W_old_pa=W[col("p_wa")],
            Upb_old=H[ub], ubflip=ubflip, P_old=P[ppos], pflip=pflip,
            e_dpos=col("e_dpos"), w_dpos=col("w_dpos"),
            w_epos=col("w_epos"), p_wapos=col("p_wapos"),
            p_ub_dpos=col("p_ub_dpos"), p_seg=col("p_seg"),
            c_pos=col("c_pos"), c_seg=col("c_seg"))

        zero1 = jnp.zeros((1, B * B), dtype=dt)

        def body(d_val, x):
            d_ext = jnp.concatenate([d_val, zero1])
            Hd = x["Hd_old"] + d_ext[x["e_dpos"]]
            if dt == jnp.float32:
                dmean = jnp.mean(jnp.abs(planar.bdiag(Hd, B)), axis=1)
                Hd = planar.badd_diag(Hd, 1e-5 * jnp.maximum(dmean, 1e-30),
                                      B)
            c_new = planar.binv(Hd, B)                 # [cap_e, B*B]

            Uw = x["Uw_old"] + d_ext[x["w_dpos"]]
            Uw = jnp.where(x["uflip"][:, None],
                           planar.btranspose(Uw, B, B), Uw)
            c_ext = jnp.concatenate([c_new, zero1])
            c_eff = jnp.where((x["w_epos"] < self.cap_e)[:, None],
                              c_ext[x["w_epos"]], x["C_old_w"])
            W_new = planar.bmm(Uw, c_eff, B, B, B)     # [cap_w, B*B]

            W_ext = jnp.concatenate([W_new, zero1])
            W_eff = jnp.where((x["p_wapos"] < self.cap_w)[:, None],
                              W_ext[x["p_wapos"]], x["W_old_pa"])
            Upb = x["Upb_old"] + d_ext[x["p_ub_dpos"]]
            Upb = jnp.where(x["ubflip"][:, None],
                            planar.btranspose(Upb, B, B), Upb)
            newp = planar.bmm_A_Bt(W_eff, Upb, B, B, B)
            newp = jnp.where(x["pflip"][:, None],
                             planar.btranspose(newp, B, B), newp)
            delta = newp - x["P_old"]

            carry_vals = d_ext[x["c_pos"]]
            vals = jnp.concatenate([carry_vals, -delta])
            segs = jnp.concatenate([x["c_seg"], x["p_seg"]])
            d_next = jax.ops.segment_sum(
                vals, segs, num_segments=self.cap_d + 1)[:self.cap_d]
            return d_next, (d_val, c_new, W_new, newp)

        if len(plan.levels):
            d_val, (d_all, c_all, W_all, newp_all) = jax.lax.scan(
                body, d_val, pre)
            # ---- apply all updates to the flat stores in one batched
            # scatter per array (entries belong to exactly one level, so
            # there are no cross-level duplicates)
            BB = B * B
            H = H.at[col("d_pos").reshape(-1)].add(d_all.reshape(-1, BB))
            C = C.at[col("e_pos").reshape(-1)].set(c_all.reshape(-1, BB))
            W = W.at[col("w_pos").reshape(-1)].set(W_all.reshape(-1, BB))
            P = P.at[ppos.reshape(-1)].set(newp_all.reshape(-1, BB))

        # bottom: apply deltas to the stored blocks + dense, refactor
        H = H.at[bot_h].add(d_val)
        dense = stores["dense"]
        dense = dense.at[self._bot_idx_ext[bot_sel].reshape(-1)].add(
            d_val.reshape(-1))
        mirr = (d_val[:, self._tperm] *
                self._bot_off_ext[bot_sel][:, None].astype(dt))
        dense = dense.at[self._bot_idx_t_ext[bot_sel].reshape(-1)].add(
            mirr.reshape(-1))
        L, sc = _equilibrated_cholesky(
            dense[:-1].reshape(self.nbB, self.nbB))
        return dict(H=H, C=C, W=W, P=P, dense=dense, L=L, s=sc,
                    sv=stores["sv"], outer0=stores["outer0"])

    @_full_f32
    def _step_impl(self, stores, omega_vals, omega_seg, buf, bot_sel, bot_h,
                   eta0):
        with jax.default_matmul_precision("highest"):
            out = self._dirty_scan(stores, omega_vals, omega_seg, buf,
                                   bot_sel, bot_h)
            dx = self._solve_scan(out, eta0)
            return out, dx, jnp.linalg.norm(dx)

    def step(self, stores, eta0, dirty_pos: List[np.ndarray], dirty_vals,
             host_packed=_NOT_PREPARED):
        """Fused dirty refactorization + solve; returns
        (stores', dx, norm) or None on capacity overflow (caller falls back
        to refactor_full + solve).  stores['H'] must already include the
        omega deltas at level 0 (the omega kernel scatters them).
        host_packed: optional precomputed prepare_host result (pipelining)."""
        packed = self._prepare(dirty_pos, dirty_vals, host_packed)
        if packed is None:
            return None
        omega_vals, seg, buf, bot_sel, bot_h = packed
        out, dx, norm = self._step_jit(
            {k: stores[k] for k in ("H", "C", "W", "P", "dense", "L", "s",
                                    "sv", "outer0")},
            omega_vals, seg, buf, bot_sel, bot_h, eta0)
        stores.update(out)
        stores["H0"] = out["H"]
        return stores, dx, norm

    def prepare_host(self, dirty_pos: List[np.ndarray]):
        """Host half of a step: reachability walk + index packing.  Pure
        numpy (no device work) so callers can run it for solve point k+1
        WHILE the device executes step k.  Returns (seg, buf, bot_sel,
        bot_h) or None on capacity overflow."""
        all_pos = np.concatenate(dirty_pos)
        if len(all_pos) > self.omega_cap:
            self.n_overflows += 1
            return None
        bundles, D_bot = self._host_walk(dirty_pos)
        if bundles is None:
            self.n_overflows += 1
            return None
        buf, bot_sel, bot_h = self._pack(bundles, D_bot)
        # segment map: each omega contribution -> its position in the
        # level-0 dirty list (duplicates sum); unpadded — callers pad as
        # their omega-value layout requires
        D0 = bundles[0]["D"] if self.plan.levels else D_bot
        seg = np.searchsorted(D0, all_pos)
        return (seg, buf, bot_sel, bot_h)

    def _prepare(self, dirty_pos, dirty_vals, host_packed=_NOT_PREPARED):
        if host_packed is IncrementalCholesky._NOT_PREPARED:
            host_packed = self.prepare_host(dirty_pos)
        if host_packed is None:
            return None
        seg, buf, bot_sel, bot_h = host_packed
        # pad segments to the STATIC omega_cap (dropped dummy segment) so
        # the standalone step kernel never recompiles
        seg_pad = np.full(self.omega_cap, self.cap_d, dtype=np.int64)
        seg_pad[:len(seg)] = seg
        omega_vals = (jnp.concatenate(dirty_vals)
                      if len(dirty_vals) > 1 else dirty_vals[0])
        npad = self.omega_cap - omega_vals.shape[0]
        if npad:
            omega_vals = jnp.concatenate(
                [omega_vals,
                 jnp.zeros((npad, self.B * self.B), dtype=omega_vals.dtype)])
        return (omega_vals, jnp.asarray(seg_pad), jnp.asarray(buf),
                jnp.asarray(bot_sel), jnp.asarray(bot_h))

    def refactor_dirty(self, stores, dirty_pos: List[np.ndarray],
                       dirty_vals) -> bool:
        """Dirty update without the fused solve (kept for callers that only
        maintain the factor); False on overflow."""
        packed = self._prepare(dirty_pos, dirty_vals)
        if packed is None:
            return False
        omega_vals, seg, buf, bot_sel, bot_h = packed
        if not hasattr(self, "_dirty_only_jit"):
            @_full_f32
            def dirty_only(stores, omega_vals, seg, buf, bot_sel, bot_h):
                with jax.default_matmul_precision("highest"):
                    return self._dirty_scan(stores, omega_vals, seg, buf,
                                            bot_sel, bot_h)
            self._dirty_only_jit = jax.jit(dirty_only, donate_argnums=(0,))
        out = self._dirty_only_jit(
            {k: stores[k] for k in ("H", "C", "W", "P", "dense", "L", "s",
                                    "sv", "outer0")},
            omega_vals, seg, buf, bot_sel, bot_h)
        stores.update(out)
        stores["H0"] = out["H"]
        return True

    # ------------------------------------------------------------------
    # scanned solve (descend + dense bottom + ascend)
    # ------------------------------------------------------------------

    def _build_solve_consts(self) -> None:
        """Stacked per-level device constants for the scanned solve,
        BUCKETED by level size: levels shrink ~0.6x each, so padding every
        level to the level-0 width wastes ~9x the work — contiguous levels
        within a <2x size range share one scan instead.  All index arrays
        pad per the dummy convention (row Nb of the bucket's eta/x carry is
        always zero)."""
        plan = self.plan
        levels = plan.levels
        L = len(levels)
        self.Nmax = int(plan.N)
        self._solve_buckets = []
        b_start = 0
        while b_start < L:
            n0 = levels[b_start].n
            b_end = b_start + 1
            while b_end < L and levels[b_end].n > 0.55 * n0:
                b_end += 1
            lvls = levels[b_start:b_end]
            Lb = len(lvls)
            Nb = int(n0)
            nE_max = max(lv.n_elim for lv in lvls)
            Ku_max = max(max(len(lv.u_src) for lv in lvls), 1)

            def stack(get, width, fill):
                out = np.full((Lb, width), fill, dtype=np.int32)
                for li, lv in enumerate(lvls):
                    a = get(b_start + li, lv)
                    out[li, :len(a)] = a
                return jnp.asarray(out)

            xs = dict(
                elim=stack(lambda gi, lv: lv.elim_orig, nE_max, Nb),
                rest_full=stack(lambda gi, lv: lv.rest_orig, Nb, Nb),
                u_w=stack(lambda gi, lv: self.off_W[gi] + np.arange(
                    len(lv.u_src)), Ku_max, self.W_dummy),
                u_elim=stack(lambda gi, lv: lv.u_elim, Ku_max, nE_max),
                u_rest=stack(lambda gi, lv: lv.u_rest_next, Ku_max, Nb),
                c_g=stack(lambda gi, lv: self.off_C[gi] +
                          np.arange(lv.n_elim), nE_max, self.C_dummy),
                elim_full=stack(lambda gi, lv: lv.elim_orig, Nb, Nb),
            )
            self._solve_buckets.append(dict(
                xs=xs, Nb=Nb, nE_max=nE_max,
                n_exit=int(lvls[-1].n_next)))
            b_start = b_end

    def _solve_scan(self, stores, eta0):
        """Solve lambda dx = eta0 with the current flat factor stores."""
        plan, B = self.plan, self.B
        C, W = stores["C"], stores["W"]
        dt = C.dtype
        eta = eta0 * stores["sv"]
        eta = jnp.concatenate([eta, jnp.zeros((1, B), dtype=dt)])

        eta_Es_l = []
        for bk in self._solve_buckets:
            Nb, nE_max, xs = bk["Nb"], bk["nE_max"], bk["xs"]
            eta = eta[:Nb + 1]     # rows >= entering size are zero

            def down(eta, x, Nb=Nb):
                eta_E = eta[x["elim"]]                       # [nE_max, B]
                eta_E_ext = jnp.concatenate(
                    [eta_E, jnp.zeros((1, B), dtype=dt)])
                corr = planar.bmv(W[x["u_w"]], eta_E_ext[x["u_elim"]], B, B)
                seg = jax.ops.segment_sum(corr, x["u_rest"],
                                          num_segments=Nb + 1)[:Nb]
                eta_next = eta[x["rest_full"]] - seg
                eta_next = jnp.concatenate(
                    [eta_next, jnp.zeros((1, B), dtype=dt)])
                return eta_next, eta_E

            eta, eta_Es = jax.lax.scan(down, eta, xs)
            eta_Es_l.append(eta_Es)

        nb = plan.n_bottom
        eta_b = eta[:nb].reshape(nb * B)
        y = jax.scipy.linalg.solve_triangular(
            stores["L"], eta_b * stores["s"], lower=True)
        xb = stores["s"] * jax.scipy.linalg.solve_triangular(
            stores["L"].T, y, lower=False)
        x = jnp.zeros((nb + 1, B), dtype=dt)
        x = x.at[:nb].set(xb.reshape(nb, B))

        for bi in range(len(self._solve_buckets) - 1, -1, -1):
            bk = self._solve_buckets[bi]
            Nb, nE_max, xs = bk["Nb"], bk["nE_max"], bk["xs"]
            # widen the carry from the deeper bucket's numbering to this one
            pad_rows = Nb + 1 - x.shape[0]
            if pad_rows > 0:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_rows, B), dtype=dt)])

            def up(x, inp, Nb=Nb, nE_max=nE_max):
                xcon, eta_E = inp
                corr = planar.bmv_At(W[xcon["u_w"]], x[xcon["u_rest"]], B, B)
                x_e = planar.bmv(C[xcon["c_g"]], eta_E, B, B) - \
                    jax.ops.segment_sum(corr, xcon["u_elim"],
                                        num_segments=nE_max + 1)[:nE_max]
                xk = jnp.zeros((Nb + 1, B), dtype=dt)
                xk = xk.at[xcon["rest_full"]].set(x[:Nb])
                xk = xk.at[xcon["elim_full"]].set(
                    jnp.concatenate(
                        [x_e, jnp.zeros((Nb - nE_max, B), dtype=dt)]))
                return xk, None

            x, _ = jax.lax.scan(up, x, (xs, eta_Es_l[bi]), reverse=True)

        return x[:self.Nmax] * stores["sv"]

    @_full_f32
    def _solve_only_impl(self, stores, eta0):
        with jax.default_matmul_precision("highest"):
            dx = self._solve_scan(stores, eta0)
            return dx, jnp.linalg.norm(dx)

    def solve(self, stores, eta0):
        dx, _ = self.solve_with_norm(stores, eta0)
        return dx

    def solve_with_norm(self, stores, eta0):
        return self._solve_jit(
            {k: stores[k] for k in ("C", "W", "L", "s", "sv")}, eta0)

    # ------------------------------------------------------------------

    def to_factor(self, stores):
        """Slice the flat stores back into a BlockCholeskyFactor — the
        bridge from the maintained incremental state to the recurrent
        marginals recovery (BlockCholeskySolver.marginals)."""
        from slam_plus_plus_tpu.linalg.block_cholesky import (
            BlockCholeskyFactor)
        L = len(self.plan.levels)
        c_invs = tuple(stores["C"][self.off_C[i]:self.off_C[i + 1]]
                       for i in range(L))
        Ws = tuple(stores["W"][self.off_W[i]:self.off_W[i + 1]]
                   for i in range(L))
        return BlockCholeskyFactor(c_invs, Ws, stores["L"], stores["s"],
                                   stores["sv"])
