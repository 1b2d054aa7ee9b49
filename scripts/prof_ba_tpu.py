"""Stage-level TPU profiling of the flagship BA iteration (bench.py workload).

Times each piece in its own jit (fusion differs from the fused bench step,
so totals exceed bench.py's number — this locates the hot spots, it does not
replace the bench).  Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from slam_plus_plus_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.schur import SchurSolver
from slam_plus_plus_tpu.ops import planar

print("backend:", jax.default_backend(), flush=True)

N_CAMS, N_POINTS, SEED = 100, 8000, 77
path = f"/tmp/bench_ba_{N_CAMS}_{N_POINTS}_{SEED}.txt"
if not os.path.exists(path):
    cams, pts, obs = datasets.make_ba_scene(n_cams=N_CAMS, n_points=N_POINTS,
                                            seed=SEED)
    datasets.write_ba_graph(path, cams, pts, obs)
s = parse_g2o(path)
asm = Assembler(s)
solver = SchurSolver(asm)
states = asm.snapshot_states(s)
bs = asm.assemble(states)
jax.block_until_ready(bs.chi2)
print(f"Np={asm.Np} Nl={asm.Nl} Kpp={asm.Kpp} Kpl={asm.Kpl} "
      f"panel_mode={solver.panel_mode} max_obs={solver.max_obs}", flush=True)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:38s} {dt:8.2f} ms", flush=True)
    return out


# ---- top-level stages -------------------------------------------------
timeit("assemble (full)", asm.assemble, states)
timeit("solve (full)", solver.solve, bs)

# ---- assembly sub-stages ---------------------------------------------
plan = asm.plans[0]
data = asm.edge_data[plan.name]
E = plan.E


@jax.jit
def gather_only(states):
    return tuple(states[t][data["slot_local"][k]]
                 for k, t in enumerate(plan.slot_types))


gathered = timeit("asm: state gather", gather_only, states)


@jax.jit
def pallas_only(gathered):
    return asm._pallas_edge_terms(plan, gathered, data)


terms = timeit("asm: pallas P2C kernel (+T)", pallas_only, gathered)
chi2_e, hdiag_e, gs, Hpp, Hll, Hpl = terms


@jax.jit
def reduce_pp(H):
    return jax.ops.segment_sum(H, data["pp_seg"][0], num_segments=asm.Kpp)


@jax.jit
def reduce_ll(H):
    return jax.ops.segment_sum(H, data["slot_cslot"][1], num_segments=asm.Nl)


@jax.jit
def reduce_eta(g0, g1):
    a = jax.ops.segment_sum(g0, data["slot_cslot"][0], num_segments=asm.Np)
    b = jax.ops.segment_sum(g1, data["slot_cslot"][1], num_segments=asm.Nl)
    return a, b


@jax.jit
def gather_pl(H):
    return H[asm._pl_gather] if asm._pl_gather is not False else H


timeit("asm: pp segsum (457k->Kpp)", reduce_pp, Hpp[0])
timeit("asm: ll segsum (457k->8000)", reduce_ll, Hll[0])
timeit("asm: eta segsums", reduce_eta, gs[0], gs[1])
timeit("asm: pl gather", gather_pl, Hpl[0])

# ---- solve sub-stages -------------------------------------------------
Bp, Bl, Np, Nl = asm.Bp, asm.Bl, asm.Np, asm.Nl


@jax.jit
def st_cinv(ll):
    return planar.binv(ll, Bl)


c_inv = timeit("solve: c_inv (binv 8000x3x3)", st_cinv, bs.ll_blocks)


@jax.jit
def st_w(u, c_inv):
    return planar.bmm(u, c_inv[solver._pl_rows_dev * 0 + solver._pl_cols_dev],
                      Bp, Bl, Bl)


w = timeit("solve: w = u @ c_inv", st_w, bs.pl_blocks, c_inv)

if solver.panel_mode == "onehot":
    @jax.jit
    def st_panels(u, w):
        dt = u.dtype
        u_pad = u[solver._obs_tbl] * solver._obs_valid[:, :, None].astype(dt)
        w_pad = w[solver._obs_tbl] * solver._obs_valid[:, :, None].astype(dt)
        onehot = (solver._obs_rows[:, :, None] ==
                  jnp.arange(Np, dtype=solver._obs_rows.dtype)[None, None, :]
                  ).astype(dt) * solver._obs_valid[:, :, None].astype(dt)
        U3 = jnp.einsum("cmn,cmk->cnk", onehot, u_pad)
        W3 = jnp.einsum("cmn,cmk->cnk", onehot, w_pad)
        nred = Np * Bp
        Ut = (U3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
              .reshape(Nl * Bl, nred))
        Wt = (W3.reshape(Nl, Np, Bp, Bl).transpose(0, 3, 1, 2)
              .reshape(Nl * Bl, nred))
        return Ut, Wt

    Ut, Wt = timeit("solve: one-hot panels", st_panels, bs.pl_blocks, w)

    @jax.jit
    def st_scgemm(Ut, Wt, pp):
        return solver._dense_pp(pp) - Wt.T @ Ut

    sc = timeit("solve: SC gemm + dense_pp", st_scgemm, Ut, Wt, bs.pp_blocks)

    @jax.jit
    def st_chol(sc, rhs):
        L = jnp.linalg.cholesky(sc)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    timeit("solve: dense chol 600 + trisolve", st_chol, sc,
           bs.eta_p.reshape(-1))


@jax.jit
def st_backsub(u, c_inv, dxp, eta_l):
    ut_dx = planar.bmv_At(u, dxp[solver._pl_rows_dev], Bp, Bl)
    rhs_l = eta_l - jax.ops.segment_sum(ut_dx, solver._pl_cols_dev,
                                        num_segments=Nl)
    return planar.bmv(c_inv, rhs_l, Bl, Bl)


timeit("solve: landmark backsub", st_backsub, bs.pl_blocks, c_inv,
       bs.eta_p, bs.eta_l)
