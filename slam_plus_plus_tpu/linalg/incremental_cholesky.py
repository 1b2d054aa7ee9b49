"""Incremental (dirty-set) refactorization of the nested MIS-Schur factor.

The O(affected)-per-step analogue of the reference FastL's trailing-submatrix
R11 refactorization (reference include/slam/NonlinearSolver_FastL.h:2104-2263
Refresh_R_IncR11/Refresh_d_IncR11): when new-edge Hessian contributions
(omega) land on a few lambda pairs, only the factorization blocks REACHABLE
from those pairs change.  Reachability follows the elimination levels of
linalg/block_cholesky.py:

    pair delta at level L
      -> pivot inverse c_inv[e]      (if the pair is an eliminated diagonal)
      -> coupling products W[u]      (if the pair is a U block, or its
                                      eliminated pivot changed)
      -> fill products prod[t]       (if either input changed)
      -> pair deltas at level L+1    (carry copies + product deltas)

The host walks this reachability per step (pure index arithmetic on the
symbolic plan — no device sync); the device runs ONE fused kernel over all
levels with capacity-padded index bundles, updating the stored factor
in place via value DELTAS, then refactors the (small) dense bottom.  A step
whose dirty set overflows the per-level capacity falls back to the full
(still batched) redescent — the analogue of the reference's
Refresh_R_FullR fallback when the update window degrades
(NonlinearSolver_FastL.h:2367).

Per-level capacities are fixed at plan time, so the whole incremental run
compiles exactly three programs: dirty step, full redescent, solve.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from slam_plus_plus_tpu.ops import planar
from slam_plus_plus_tpu.linalg.block_cholesky import (
    BlockCholeskyFactor, BlockCholeskySolver, _equilibrated_cholesky,
    _full_f32)


class IncrementalCholesky:
    def __init__(self, chol: BlockCholeskySolver,
                 caps: Optional[List[dict]] = None, omega_cap: int = 256):
        self.chol = chol
        self.plan = chol.plan
        self.B = chol.B
        # static capacity of the per-step omega delta batch: the dirty
        # kernel compiles exactly once; larger batches overflow to the full
        # redescent (amortized — they only arise from long quiet stretches)
        self.omega_cap = omega_cap
        self._build_host_maps()
        self._set_caps(caps)
        self._build_layout()
        # stores are donated: the dirty step updates tens of MB of factor
        # state in place instead of copying it every step
        self._dirty_jit = jax.jit(self._dirty_impl, donate_argnums=(0,))
        self._full_jit = jax.jit(self._full_impl)
        self._solve_jit = jax.jit(self._solve_impl)
        self.n_overflows = 0

    # ------------------------------------------------------------------
    # host symbolic maps
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

        # device-side extended constant index arrays (dummy entry appended)
        self._dev = []
        B = self.B
        for lv in self.plan.levels:
            Ku, T, K = len(lv.u_src), len(lv.pa), lv.K
            self._dev.append(dict(
                diag_ext=jnp.asarray(np.append(lv.elim_diag_idx, K)),
                u_src_ext=jnp.asarray(np.append(lv.u_src, K)),
                u_flip_ext=jnp.asarray(np.append(lv.u_flip, False)),
                u_elim_ext=jnp.asarray(np.append(lv.u_elim, lv.n_elim)),
                pa_ext=jnp.asarray(np.append(lv.pa, Ku)),
                pb_ext=jnp.asarray(np.append(lv.pb, Ku)),
                p_flip_ext=jnp.asarray(np.append(lv.p_flip, False)),
            ))
        eye = np.eye(B).reshape(-1)
        self._eye = jnp.asarray(eye)

    def _set_caps(self, caps) -> None:
        if caps is not None:
            self.caps = caps
            return
        # dirty sets stay small and nearly scale-free (a few dozen pairs even
        # at the deepest level on 10k-pose replays — measured); absolute caps
        # keep the padded kernel work O(1) in the problem size, with the full
        # redescent as the (rare) overflow fallback
        self.caps = []
        for li, lv in enumerate(self.plan.levels):
            grow = 1 + min(li, 3)
            self.caps.append(dict(
                d=int(min(lv.K, 128 * grow)),
                e=int(min(lv.n_elim + 1, 64 * grow)),
                w=int(min(len(lv.u_src) + 1, 128 * grow)),
                p=int(min(len(lv.pa) + 1, 256 * grow)),
            ))
        K_bot = len(self.plan._bottom_idx)
        self.cap_bot = int(min(K_bot, 512))

    # ------------------------------------------------------------------
    # store init / full redescent
    # ------------------------------------------------------------------

    @_full_f32
    def _full_impl(self, H0):
        """Full redescent from level-0 blocks (PLAN order), collecting every
        intermediate the dirty path updates in place."""
        with jax.default_matmul_precision("highest"):
            return self._full_body(H0)

    def _full_body(self, H0):
        plan, B = self.plan, self.B
        # level-0 Jacobi equilibration (see BlockCholeskyFactor): all stores
        # live in the SCALED space; incremental deltas are scaled on entry
        sv, outer0 = self.chol._jacobi_scale(H0)
        H_levels, c_invs, Ws, prods = [], [], [], []
        H = H0 * outer0
        for li, lv in enumerate(plan.levels):
            dt = H.dtype
            pad = jnp.zeros((1, B * B), dtype=dt)
            H_levels.append(jnp.concatenate([H, pad]))
            C = H[lv.elim_diag_idx]
            if dt == jnp.float32:
                # f32 pivot ridge (see block_cholesky._descend): bounds
                # kappa of eliminated pivots so c_inv stays a contraction
                dmean = jnp.mean(jnp.abs(planar.bdiag(C, B)), axis=1)
                C = planar.badd_diag(C, 1e-5 * jnp.maximum(dmean, 1e-30), B)
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
            c_invs.append(jnp.concatenate([c_inv, pad]))
            Ws.append(jnp.concatenate([W, pad]))
            prods.append(jnp.concatenate([prod, pad]))
            H = Hn
        dense = self.chol._bottom_dense(H)
        L, s = _equilibrated_cholesky(dense)
        pad = jnp.zeros((1, B * B), dtype=H.dtype)
        H_levels.append(jnp.concatenate([H, pad]))  # bottom pattern blocks
        return dict(H_levels=tuple(H_levels), c_invs=tuple(c_invs),
                    Ws=tuple(Ws), prods=tuple(prods), dense=dense, L=L,
                    s=s, sv=sv,
                    outer0=jnp.concatenate(
                        [outer0, jnp.ones((1, B * B), dtype=H0.dtype)]))

    def init_stores(self, H0) -> Dict:
        """H0: level-0 blocks in PLAN order, no dummy row.

        The returned stores expose 'H0' as an ALIAS of H_levels[0] (dummy
        row included) — scatters into it keep positions < K0 so the dummy
        stays zero, and refactor_dirty just re-installs the updated alias."""
        out = dict(self._full_jit(H0))
        out["H0"] = out["H_levels"][0]
        return out

    def refactor_full(self, stores) -> Dict:
        raw = stores["H0"][:-1] / stores["outer0"][:-1]
        out = dict(self._full_jit(raw))
        out["H0"] = out["H_levels"][0]
        return out

    # ------------------------------------------------------------------
    # dirty step
    # ------------------------------------------------------------------

    def _host_walk(self, dirty_pos: List[np.ndarray]):
        """Walk reachability level by level; returns per-level padded index
        bundles (host numpy) or None on capacity overflow.

        dirty_pos: list of [C_i] level-0 pair positions (one per edge)."""
        plan = self.plan
        levels = plan.levels
        bundles = []
        # level-0 dirty pairs with the mapping of each edge contribution to
        # its position in the unique list
        all_pos = (np.concatenate(dirty_pos) if dirty_pos
                   else np.zeros(0, dtype=np.int64))
        D, inv0 = np.unique(all_pos, return_inverse=True)

        for li, lv in enumerate(levels):
            cap = self.caps[li]
            m = self.maps[li]
            if len(D) > cap["d"]:
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
            # prods: pa in W_d, or pb value changed
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
            if (len(E_d) > cap["e"] or len(W_d) > cap["w"] or
                    len(P_d) > cap["p"]):
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
                carry_sel=carry_sel, carry_seg=carry_seg, p_seg=p_seg,
                n_next=len(D_next)))
            D = D_next

        if len(D) > self.cap_bot:
            return None, None
        return bundles, D

    def _build_layout(self) -> None:
        """Static layout of the per-step flat index buffer: one device_put
        per step instead of ~10 per level."""
        off = 0
        self._layout = []
        for li, lv in enumerate(self.plan.levels):
            cap = self.caps[li]
            slots = {}
            for name, size in (("d", cap["d"]), ("e", cap["e"]),
                               ("w", cap["w"]), ("p", cap["p"]),
                               ("p_seg", cap["p"]), ("c_pos", cap["d"]),
                               ("c_seg", cap["d"])):
                slots[name] = (off, off + size)
                off += size
            self._layout.append(slots)
        self._bot_slot = (off, off + self.cap_bot)
        off += self.cap_bot
        self._flat_len = off

    def _bundles_to_device(self, bundles, D_bot):
        """Pack all padded bundles into one flat int64 buffer + one counts
        vector (two host->device transfers per step)."""
        plan = self.plan
        flat = np.empty(self._flat_len, dtype=np.int64)
        counts = np.empty(2 * len(plan.levels), dtype=np.int32)

        def put(slot, a, fill):
            lo, hi = slot
            n = len(a)
            flat[lo:lo + n] = a
            flat[lo + n:hi] = fill

        for li, lv in enumerate(plan.levels):
            b = bundles[li]
            s = self._layout[li]
            Ku, T, K = len(lv.u_src), len(lv.pa), lv.K
            cap = self.caps[li]
            put(s["d"], b["D"], K)
            put(s["e"], b["E"], lv.n_elim)
            put(s["w"], b["W"], Ku)
            put(s["p"], b["P"], T)
            put(s["p_seg"], b["p_seg"], b["n_next"])
            put(s["c_pos"], b["carry_sel"], cap["d"])
            put(s["c_seg"], b["carry_seg"], b["n_next"])
            counts[2 * li] = len(b["E"])
            counts[2 * li + 1] = len(b["P"])
        put(self._bot_slot, D_bot, len(plan._bottom_idx))
        return jnp.asarray(flat), jnp.asarray(counts)

    @_full_f32
    def _dirty_impl(self, stores, omega_vals, omega_seg, flat, counts):
        """One fused dirty refactorization.

        omega_vals: [C_tot, B*B] level-0 delta blocks (concatenated edges);
        omega_seg: [C_tot] position of each block in the level-0 dirty list;
        flat/counts: packed per-level index bundles (see _build_layout).
        stores['H_levels'][0] already contains the applied omega, so level 0
        skips the H update and only needs the delta VALUES."""
        with jax.default_matmul_precision("highest"):
            return self._dirty_body(stores, omega_vals, omega_seg, flat,
                                    counts)

    def _dirty_body(self, stores, omega_vals, omega_seg, flat, counts):
        plan, B = self.plan, self.B
        H_levels = list(stores["H_levels"])
        c_invs = list(stores["c_invs"])
        Ws = list(stores["Ws"])
        prods = list(stores["prods"])
        dt = H_levels[0].dtype

        def sl(slot):
            lo, hi = slot
            return jax.lax.slice_in_dim(flat, lo, hi)

        # level-0 dirty values from the omega deltas
        cap0 = self.caps[0]["d"] if plan.levels else self.cap_bot
        d_val = jax.ops.segment_sum(omega_vals, omega_seg,
                                    num_segments=cap0 + 1)[:cap0]

        for li, lv in enumerate(plan.levels):
            s = self._layout[li]
            cap = self.caps[li]
            d_idx = sl(s["d"])
            e_idx = sl(s["e"])
            w_idx = sl(s["w"])
            p_idx = sl(s["p"])
            e_mask = (jnp.arange(cap["e"]) < counts[2 * li]).astype(dt)
            p_mask = (jnp.arange(cap["p"]) < counts[2 * li + 1]).astype(dt)
            H = H_levels[li]
            if li > 0:
                H = H.at[d_idx].add(d_val)
                H_levels[li] = H
            ext = self._dev[li]

            # pivot inverses
            Hd = H[ext["diag_ext"][e_idx]]
            Hd = (Hd * e_mask[:, None] +
                  self._eye.astype(dt)[None, :] * (1.0 - e_mask[:, None]))
            if dt == jnp.float32:
                dmean = jnp.mean(jnp.abs(planar.bdiag(Hd, B)), axis=1)
                Hd = planar.badd_diag(Hd, 1e-5 * jnp.maximum(dmean, 1e-30),
                                      B)
            c_invs[li] = c_invs[li].at[e_idx].set(planar.binv(Hd, B))

            # coupling products W = U c_inv
            U_w = H[ext["u_src_ext"][w_idx]]
            U_w = jnp.where(ext["u_flip_ext"][w_idx][:, None],
                            planar.btranspose(U_w, B, B), U_w)
            W_new = planar.bmm(U_w, c_invs[li][ext["u_elim_ext"][w_idx]],
                               B, B, B)
            Ws[li] = Ws[li].at[w_idx].set(W_new)

            # fill products (delta vs the stored value)
            pa = ext["pa_ext"][p_idx]
            pb = ext["pb_ext"][p_idx]
            U_pb = H[ext["u_src_ext"][pb]]
            U_pb = jnp.where(ext["u_flip_ext"][pb][:, None],
                             planar.btranspose(U_pb, B, B), U_pb)
            newp = planar.bmm_A_Bt(Ws[li][pa], U_pb, B, B, B)
            newp = jnp.where(ext["p_flip_ext"][p_idx][:, None],
                             planar.btranspose(newp, B, B), newp)
            newp = newp * p_mask[:, None]
            delta_p = newp - prods[li][p_idx] * p_mask[:, None]
            prods[li] = prods[li].at[p_idx].set(newp)

            # propagate deltas to the next level
            carry_vals = jnp.concatenate(
                [d_val, jnp.zeros((1, B * B), dtype=dt)])
            vals = jnp.concatenate([carry_vals[sl(s["c_pos"])], -delta_p])
            segs = jnp.concatenate([sl(s["c_seg"]), sl(s["p_seg"])])
            cap_next = (self.caps[li + 1]["d"]
                        if li + 1 < len(plan.levels) else self.cap_bot)
            d_val = jax.ops.segment_sum(vals, segs,
                                        num_segments=cap_next + 1)[:cap_next]

        # bottom: apply deltas to the stored blocks + dense, refactor
        bot_idx = sl(self._bot_slot)
        Hb = H_levels[-1]
        if plan.levels:
            Hb = Hb.at[bot_idx].add(d_val)
            H_levels[-1] = Hb
        nbB = plan.n_bottom * B
        bidx = jnp.concatenate([jnp.asarray(plan._bottom_idx),
                                jnp.zeros((1, B * B), dtype=jnp.int32)])
        bidx_t = jnp.concatenate([jnp.asarray(plan._bottom_idx_t),
                                  jnp.zeros((1, B * B), dtype=jnp.int32)])
        boff = jnp.concatenate([jnp.asarray(plan._bottom_off),
                                jnp.zeros((1,))]).astype(dt)
        dense = stores["dense"].reshape(-1)
        # padded rows of d_val are exactly zero (segment sums of nothing)
        dense = dense.at[bidx[bot_idx].reshape(-1)].add(d_val.reshape(-1))
        mirr = (d_val[:, np.asarray(self.plan._tperm)] *
                boff[bot_idx][:, None])
        dense = dense.at[bidx_t[bot_idx].reshape(-1)].add(mirr.reshape(-1))
        dense = dense.reshape(nbB, nbB)
        L, s = _equilibrated_cholesky(dense)
        return dict(H_levels=tuple(H_levels), c_invs=tuple(c_invs),
                    Ws=tuple(Ws), prods=tuple(prods), dense=dense, L=L,
                    s=s)

    def refactor_dirty(self, stores, dirty_pos: List[np.ndarray],
                       dirty_vals) -> bool:
        """Apply the walked dirty update in place; False on overflow.

        dirty_pos/dirty_vals: per pending edge, level-0 pair positions and
        the corresponding delta blocks (device).  stores['H0'] must already
        include the deltas (FastLSolver applies them when scattering)."""
        all_pos = np.concatenate(dirty_pos)
        if len(all_pos) > self.omega_cap:
            self.n_overflows += 1
            return False
        bundles, D_bot = self._host_walk(dirty_pos)
        if bundles is None:
            self.n_overflows += 1
            return False
        flat, cnts = self._bundles_to_device(bundles, D_bot)

        # segment map: each omega contribution -> its position in the padded
        # level-0 dirty list (duplicates sum); pad to the STATIC omega_cap
        # with the dropped dummy segment so the kernel never recompiles
        D0 = bundles[0]["D"] if self.plan.levels else D_bot
        cap0 = self.caps[0]["d"] if self.plan.levels else self.cap_bot
        seg = np.full(self.omega_cap, cap0, dtype=np.int64)
        seg[:len(all_pos)] = np.searchsorted(D0, all_pos)
        omega_vals = (jnp.concatenate(dirty_vals)
                      if len(dirty_vals) > 1 else dirty_vals[0])
        npad = self.omega_cap - omega_vals.shape[0]
        if npad:
            omega_vals = jnp.concatenate(
                [omega_vals,
                 jnp.zeros((npad, self.B * self.B), dtype=omega_vals.dtype)])
        # install the omega-updated level-0 alias before the kernel runs
        inner = {k: stores[k] for k in
                 ("H_levels", "c_invs", "Ws", "prods", "dense", "L", "s")}
        inner["H_levels"] = (stores["H0"],) + tuple(stores["H_levels"][1:])
        out = self._dirty_jit(inner, omega_vals, jnp.asarray(seg),
                              flat, cnts)
        stores.update(out)
        stores["H0"] = out["H_levels"][0]
        return True

    # ------------------------------------------------------------------

    @_full_f32
    def _solve_impl(self, stores, eta0):
        plan = self.plan  # precision handled inside _solve_with_factor_impl
        c_invs = tuple(c[:-1] for c in stores["c_invs"])
        Ws = tuple(w[:-1] for w in stores["Ws"])
        f = BlockCholeskyFactor(c_invs, Ws, stores["L"], stores["s"],
                                stores["sv"])
        return self.chol._solve_with_factor_impl(f, eta0)

    def solve(self, stores, eta0):
        return self._solve_jit(
            {k: stores[k] for k in ("c_invs", "Ws", "L", "s", "sv")}, eta0)
