"""Landmark-sharded bundle adjustment: the BlockSystem itself distributed.

Round-2's distributed path sharded only the *compute* (edge sums, panel
products) while every device held a replicated copy of the whole
BlockSystem — the first thing that breaks at venice-real scale.  This module
shards the STATE: landmark vertex states, their lambda blocks (ll, eta_l,
the pl observation blocks) and the Schur panels all live partitioned over a
1-D ``lm`` mesh axis; only the small camera-side quantities (pp, eta_p, the
reduced SC) are psum'd and replicated.

The uniform per-landmark [Nl, M] edge layout (assembly/assembler.py) is what
makes this natural: padding Nl to a multiple of the mesh size makes every
landmark-side array an even leading-axis shard, each device's slice is
exactly ``G = Nl_pad / n`` whole landmark groups, and all landmark-side
reductions stay device-local reshapes — there is NO landmark-axis collective
at all.  Per solve, the only collectives are psum(pp), psum(eta_p),
psum(SC [nred^2]) and psum(chi2), all riding ICI.

Reference analogue: none — the reference is single-process
(LinearSolver_Schur.h:1744 runs its SpDGEMMs on one GPU); this is the
capability SURVEY.md section 7 stage 9 adds.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.models.types import EDGE_TYPES, VERTEX_TYPES
from slam_plus_plus_tpu.ops import planar


def make_lm_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the landmark-shard axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("lm",))


class ShardedBAOptimizer:
    """Damped-GN bundle adjustment with landmark-sharded state.

    Requirements: a landmark class exists, every edge plan observes exactly
    one landmark, all landmarks share one vertex type, and the uniform edge
    layout applies (guaranteed by construction here via
    ``edge_layout='uniform'``).
    """

    def __init__(self, system, mesh: Mesh, config: Optional[SolverConfig] = None,
                 damping: float = 1e-3):
        self.mesh = mesh
        self.n_shards = n = mesh.devices.size
        cfg = dataclasses.replace(config or SolverConfig(),
                                  edge_layout="uniform")
        self.asm = asm = Assembler(system, cfg)
        self.system = system
        self.damping = damping
        if asm.pl_uniform is None or not asm.pl_uniform:
            raise ValueError("sharded BA requires the uniform edge layout "
                             "(landmark problem, bounded padding)")
        # landmark TYPES: one sharded state channel per type (the uniform
        # layout already spans the full class-slot space per plan, so the
        # union [Nl]-indexed arrays below are type-agnostic; only the state
        # vector width and the ⊞ differ per type)
        self.l_types = sorted(t for t in asm.type_names
                              if asm.type_class[t] == "l")
        if not self.l_types:
            raise ValueError("sharded BA requires a landmark class")
        # primary type kept for backward compat with existing callers
        self.l_type = self.l_types[0]
        dt = asm.dtype

        Nl = asm.Nl
        self.G = G = -(-Nl // n)            # landmark groups per device
        self.Nl_pad = Nl_pad = G * n
        Np, Bp, Bl = asm.Np, asm.Bp, asm.Bl
        self.nred = Np * Bp

        sh_lm = NamedSharding(mesh, P("lm"))
        sh_rep = NamedSharding(mesh, P())

        def put_lm(arr_np):
            return jax.device_put(jnp.asarray(arr_np), sh_lm)

        # ---- sharded landmark state (class-slot order, padded) ----------
        ldim = max(VERTEX_TYPES[t].state_dim for t in self.l_types)
        self.l_state_dim = ldim
        xyz = np.zeros((Nl_pad, ldim))
        type_rows = {t: np.zeros(Nl_pad) for t in self.l_types}
        for c, (tn, li) in enumerate(asm.l_order):
            sd = VERTEX_TYPES[tn].state_dim
            xyz[c, :sd] = system.vertex_stores[tn].data[li]
            type_rows[tn][c] = 1.0
        self._l_locals = np.array([li for (_t, li) in asm.l_order])
        self._l_typenames = [t for (t, _li) in asm.l_order]
        self.xyz = put_lm(np.asarray(xyz, dtype=np.float64))
        self._type_rows = {t: put_lm(type_rows[t]) for t in self.l_types}
        l_mask = np.zeros((Nl_pad, Bl))
        l_mask[:Nl] = asm.l_mask[:Nl]
        self._l_mask = put_lm(np.asarray(l_mask, dtype=np.float64))

        # ---- replicated camera-side state -------------------------------
        self.cam_types = [t for t in asm.type_names if asm.type_class[t] == "p"]

        # ---- per-plan sharded edge arrays (pad Nl -> Nl_pad groups) -----
        self.plan_data = []
        for ch_i, plan in enumerate(asm.plans):
            if asm._pad_maps.get(plan.name) is None:
                raise NotImplementedError(
                    f"sharded BA: plan {plan.name} is not landmark-uniform")
            data = asm.edge_data[plan.name]
            M = plan.E // Nl
            pad_rows = Nl_pad * M - plan.E

            def padE(x, fill=0):
                x = np.asarray(x)
                if pad_rows == 0:
                    return x
                widths = [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, widths, constant_values=fill)

            lslot = plan.slot_class.index("l")
            l_sd = VERTEX_TYPES[
                EDGE_TYPES[plan.name].vertex_types[lslot]].state_dim
            entry = dict(
                name=plan.name, M=M, lslot=lslot, l_sd=l_sd,
                z=put_lm(padE(data["z"])),
                info=put_lm(padE(data["info"])),   # zero-info padding
                slot_local=[None if k == lslot else put_lm(padE(sl))
                            for k, sl in enumerate(plan.slot_local)],
                slot_cslot=[put_lm(padE(cs)) for cs in plan.slot_cslot],
                pp_seg=[put_lm(padE(s)) for (_a, _b, s, _w) in
                        plan.pp_contribs],
                pp_swap=[put_lm(padE(w)) for (_a, _b, _s, w) in
                         plan.pp_contribs],
                pp_meta=[(a, b) for (a, b, _s, _w) in plan.pp_contribs],
                pl_slots=[pa for (pa, _lb, _s) in plan.pl_contribs],
            )
            self.plan_data.append(entry)

        # camera-side finalize constants (replicated)
        self._pp_diag_ids = jnp.asarray(asm.pp_diag_ids)
        self._p_mask = jnp.asarray(asm.p_mask, dtype=dt)
        self._anchor = asm.anchor_cslot
        self._pp_idx = jnp.asarray(planar.scatter_flat_indices(
            asm.pp_rows, asm.pp_cols, Bp, Bp, row_stride=self.nred))
        self._pp_idx_t = jnp.asarray(planar.scatter_flat_indices(
            asm.pp_cols, asm.pp_rows, Bp, Bp, row_stride=self.nred))
        self._pp_off = jnp.asarray(
            (asm.pp_rows != asm.pp_cols).astype(np.float32))
        self._tperm = [i * Bp + j for j in range(Bp) for i in range(Bp)]

        in_specs = (P(), P("lm"), P("lm"),
                    jax.tree.map(lambda _: P("lm"), self._type_rows),
                    jax.tree.map(lambda _: P("lm"), self._tree_of_plans()))
        out_specs = (P(), P("lm"), P())
        self._step = jax.jit(jax.shard_map(
            self._step_fn, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False))
        self._sh_rep = sh_rep

    def _tree_of_plans(self):
        return [dict(z=e["z"], info=e["info"],
                     slot_local=[s for s in e["slot_local"] if s is not None],
                     slot_cslot=e["slot_cslot"], pp_seg=e["pp_seg"],
                     pp_swap=e["pp_swap"])
                for e in self.plan_data]

    # ---- memory accounting ---------------------------------------------

    def per_device_bytes(self):
        """Estimated per-device HBM for the solve: sharded arrays / n plus
        replicated camera-side arrays.  The scaling test asserts the
        landmark-side terms divide by the mesh size."""
        asm = self.asm
        n = self.n_shards
        itemsize = jnp.zeros((), asm.dtype).itemsize
        G, Bl, Bp, nred = self.G, asm.Bl, asm.Bp, self.nred
        sharded = 0
        for e in self.plan_data:
            E_loc = G * e["M"]
            m = int(np.prod(np.asarray(e["z"]).shape[1:]))
            per_edge = (m + 4 + len(e["slot_cslot"]) * 8 +
                        Bp * Bp + Bp * Bl + 2 + Bp)   # z/info/idx + H chunks
            sharded += E_loc * per_edge * itemsize
        sharded += G * (Bl * Bl * 2 + Bl * 2) * itemsize      # ll, c_inv, eta
        sharded += 2 * G * Bl * nred * itemsize               # U, W panels
        replicated = (nred * nred * 2 + asm.Kpp * Bp * Bp +
                      asm.Np * Bp) * itemsize                 # SC, chol, pp
        return dict(sharded=int(sharded), replicated=int(replicated),
                    total=int(sharded + replicated))

    def projected_scaling(self, n_devices=None, flops_per_device=2.0e14,
                          ici_bytes_per_s=4.5e10, bf16=False):
        """Analytic per-step time/scaling model for the sharded solve.

        The CPU-mesh dryrun validates CORRECTNESS; real multi-chip timing
        needs hardware we do not have, so this is the committed projection
        the scaling tests check for internal consistency: per-device
        compute = (edge kernels + panel products + SC GEMM)/n, collectives
        = psum(pp + eta_p + SC) at ring-allreduce cost 2(n-1)/n * bytes,
        plus the replicated reduced Cholesky.  Returns a dict per device
        count with est. step ms and parallel efficiency vs 1 device.

        Defaults are v5e-class: ~200 TFLOP/s bf16 MXU (halve for f32) and
        ~45 GB/s effective per-link ICI all-reduce bandwidth."""
        asm = self.asm
        Bp, Bl, Np, Nl = asm.Bp, asm.Bl, asm.Np, asm.Nl
        nred = self.nred
        if not bf16:
            flops_per_device = flops_per_device / 2
        E = sum(self.G * self.n_shards * e["M"] for e in self.plan_data)
        # FLOPs: per-edge jacobian+Hessian kernels (~40 ops/entry est.),
        # panel build einsums, SC GEMM, landmark backsub
        f_kernel = E * (Bp + Bl) ** 2 * 40
        f_panels = E * Np * Bp * Bl * 2
        f_sc = 2 * (Nl * Bl) * nred * nred
        f_bottom = nred ** 3 / 3
        itemsize = 4
        psum_bytes = (nred * nred + asm.Kpp * Bp * Bp + Np * Bp) * itemsize
        out = {}
        counts = n_devices if n_devices is not None else [1, 2, 4, 8, 16]
        for n in np.atleast_1d(counts):
            n = int(n)
            t_comp = (f_kernel + f_panels + f_sc) / n / flops_per_device
            t_bottom = f_bottom / flops_per_device   # replicated
            t_coll = (0.0 if n == 1 else
                      2 * (n - 1) / n * psum_bytes / ici_bytes_per_s)
            t = t_comp + t_bottom + t_coll
            out[n] = dict(step_ms=round(t * 1e3, 6),
                          compute_ms=round((t_comp + t_bottom) * 1e3, 6),
                          collective_ms=round(t_coll * 1e3, 6), _t=t)
        t1 = out.get(1, None)
        if t1:
            for n, d in out.items():
                d["efficiency"] = round(t1["_t"] / (n * d["_t"]), 3)
        for d in out.values():
            del d["_t"]
        return out

    # ---- the fused distributed step ------------------------------------

    def _step_fn(self, cam_states, xyz_local, l_mask_local, type_rows,
                 plan_arrays):
        asm = self.asm
        Np, Bp, Bl = asm.Np, asm.Bp, asm.Bl
        nred = self.nred
        dt = asm.dtype
        G = self.G
        xyz_c = xyz_local.astype(dt)

        pp = jnp.zeros((asm.Kpp, Bp * Bp), dtype=dt)
        eta_p = jnp.zeros((max(Np, 1), Bp), dtype=dt)
        ll = jnp.zeros((G, Bl * Bl), dtype=dt)
        eta_l = jnp.zeros((G, Bl), dtype=dt)
        chi2 = jnp.zeros((), dtype=dt)
        hdiag = jnp.zeros((), dtype=dt)
        swap_perm = [i * Bp + j for j in range(Bp) for i in range(Bp)]
        u_channels = []

        for e, arrs in zip(self.plan_data, plan_arrays):
            et = EDGE_TYPES[e["name"]]
            M, lslot = e["M"], e["lslot"]
            E_loc = G * M
            gathered = []
            sl_i = 0
            for k, t in enumerate(et.vertex_types):
                if k == lslot:
                    sd = e["l_sd"]
                    gathered.append(jnp.broadcast_to(
                        xyz_c[:, None, :sd], (G, M, sd)
                    ).reshape(E_loc, sd))
                    continue
                st = cam_states[t]
                sl = arrs["slot_local"][sl_i]
                sl_i += 1
                if st.shape[0] <= 1024:
                    oh = (sl[:, None] ==
                          jnp.arange(st.shape[0], dtype=sl.dtype)).astype(dt)
                    gathered.append(jnp.matmul(
                        oh, st, precision=jax.lax.Precision.HIGHEST))
                else:
                    gathered.append(st[sl])
            chi2_e, hdiag_e, gs, Hpp, Hll, Hpl = asm._kernels[e["name"]](
                tuple(gathered), arrs["z"], arrs["info"])
            chi2 = chi2 + jnp.sum(chi2_e)
            hdiag = jnp.maximum(hdiag, jnp.max(hdiag_e))

            li = 0
            for k in range(len(et.vertex_types)):
                cs = arrs["slot_cslot"][k]
                if k == lslot:
                    eta_l = eta_l + gs[k].reshape(G, M, Bl).sum(axis=1)
                    ll = ll + Hll[li].reshape(G, M, Bl * Bl).sum(axis=1)
                    li += 1
                elif Np <= 1024:
                    oh = (cs[:, None] ==
                          jnp.arange(Np, dtype=cs.dtype)).astype(dt)
                    eta_p = eta_p + oh.T @ gs[k]
                else:
                    eta_p = eta_p + jax.ops.segment_sum(
                        gs[k], cs, num_segments=Np)
            for ci, (a, b) in enumerate(e["pp_meta"]):
                H = Hpp[ci]
                if a != b:
                    swap = arrs["pp_swap"][ci]
                    H = jnp.where(swap[:, None], H[:, swap_perm], H)
                seg = arrs["pp_seg"][ci]
                if asm.Kpp <= 1024:
                    oh = (seg[:, None] ==
                          jnp.arange(asm.Kpp, dtype=seg.dtype)).astype(dt)
                    pp = pp + oh.T @ H
                else:
                    pp = pp + jax.ops.segment_sum(H, seg,
                                                  num_segments=asm.Kpp)
            for hi in range(len(e["pl_slots"])):
                u_channels.append((e, arrs, Hpl[hi].reshape(G, M, Bp * Bl),
                                   e["pl_slots"][hi]))

        pp, eta_p, chi2 = jax.lax.psum((pp, eta_p, chi2), "lm")
        hdiag = jax.lax.pmax(hdiag, "lm")

        # finalize (replicated camera side): pad pivots + gauge anchor +
        # additive lambda damping
        p_diag_cols = [i * Bp + i for i in range(Bp)]
        pp = pp.at[self._pp_diag_ids[:, None], p_diag_cols].add(
            1.0 - self._p_mask)
        if self._anchor is not None:
            aid = self._pp_diag_ids[self._anchor]
            pp = pp.at[aid, p_diag_cols].add(self._p_mask[self._anchor])
        alpha = self.damping * hdiag
        pp = pp.at[self._pp_diag_ids[:, None], p_diag_cols].add(alpha)
        # landmark side (local): pad pivots + damping (damp_system semantics:
        # alpha on every diagonal entry, masks only for the pad pivots)
        l_mask = l_mask_local.astype(dt)
        l_diag_cols = [i * Bl + i for i in range(Bl)]
        ll = ll.at[:, l_diag_cols].add(1.0 - l_mask + alpha)

        # ---- sharded Schur ------------------------------------------------
        c_inv = planar.binv(ll, Bl)
        Ut = jnp.zeros((G * Bl, nred), dtype=dt)
        for (e, arrs, u3, p_slot) in u_channels:
            M = e["M"]
            rows = arrs["slot_cslot"][p_slot].reshape(G, M)
            oh = (rows[:, :, None] ==
                  jnp.arange(Np, dtype=rows.dtype)[None, None, :]).astype(dt)
            U3 = jnp.einsum("cmn,cmk->cnk", oh, u3)
            Ut = Ut + (U3.reshape(G, Np, Bp, Bl).transpose(0, 3, 1, 2)
                       .reshape(G * Bl, nred))
        U3r = Ut.reshape(G, Bl, nred)
        Wt = jnp.stack(
            [sum(c_inv[:, l * Bl + k, None] * U3r[:, l, :]
                 for l in range(Bl)) for k in range(Bl)],
            axis=1).reshape(G * Bl, nred)

        # dense replicated pp
        dense = jnp.zeros((nred * nred,), dtype=dt)
        dense = dense.at[self._pp_idx.reshape(-1)].add(pp.reshape(-1))
        mirrored = pp[:, self._tperm] * self._pp_off[:, None].astype(dt)
        dense = dense.at[self._pp_idx_t.reshape(-1)].add(mirrored.reshape(-1))
        sc0 = dense.reshape(nred, nred)

        sc = sc0 - jax.lax.psum(Wt.T @ Ut, "lm")
        rhs = eta_p.reshape(nred) - jax.lax.psum(
            Wt.T @ eta_l.reshape(G * Bl), "lm")

        L = jnp.linalg.cholesky(sc)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        dx_flat = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx_p = dx_flat.reshape(Np, Bp)

        ut_dx = (Ut @ dx_flat).reshape(G, Bl)
        dx_l = planar.bmv(c_inv, eta_l - ut_dx, Bl, Bl)

        # ---- updates ------------------------------------------------------
        new_cam = {}
        for t in self.cam_types:
            vt = VERTEX_TYPES[t]
            _cls, cslot = asm.state_meta[t]
            delta = dx_p[cslot][:, :vt.tangent_dim]
            new_cam[t] = jax.vmap(vt.boxplus)(cam_states[t], delta)
        # per-type ⊞ on the sharded landmark channel (rows selected by the
        # type-membership masks; widths padded back to the union layout)
        new_xyz = xyz_c
        for t in self.l_types:
            vt = VERTEX_TYPES[t]
            upd = jax.vmap(vt.boxplus)(xyz_c[:, :vt.state_dim],
                                       dx_l[:, :vt.tangent_dim])
            if vt.state_dim < xyz_c.shape[1]:
                upd = jnp.concatenate(
                    [upd, xyz_c[:, vt.state_dim:]], axis=1)
            new_xyz = jnp.where(type_rows[t][:, None] > 0, upd, new_xyz)
        new_xyz = new_xyz.astype(xyz_local.dtype)
        return new_cam, new_xyz, chi2

    # ---- public ---------------------------------------------------------

    def _cam_snapshot(self):
        return {t: jax.device_put(
            jnp.asarray(self.system.vertex_stores[t].data, dtype=self.asm.dtype),
            self._sh_rep) for t in self.cam_types}

    def optimize(self, max_iterations=5):
        """Run damped-GN steps; returns (chi2_before_last_update, iters)."""
        # the local l_mask slice is closed over via shard_map input: pass it
        # through plan-free state (bound at first call)
        cam = self._cam_snapshot()
        xyz = self.xyz
        chi2 = None
        for _ in range(max_iterations):
            cam, xyz, chi2 = self._step(cam, xyz, self._l_mask,
                                        self._type_rows,
                                        self._tree_of_plans())
        self.xyz = xyz
        self._last_cam = cam
        return float(chi2), max_iterations

    def writeback(self):
        xyz_np = np.asarray(self.xyz)[:self.asm.Nl]
        for c, li in enumerate(self._l_locals):
            t = self._l_typenames[c]
            sd = VERTEX_TYPES[t].state_dim
            self.system.vertex_stores[t].states[li] = xyz_np[c, :sd]
        for t, arr in getattr(self, "_last_cam", {}).items():
            self.system.vertex_stores[t].states[:self.system.vertex_stores[t].n] = \
                np.asarray(arr, dtype=np.float64)
