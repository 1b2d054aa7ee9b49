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
def reduce_pp_onehot(H):
    ids = data["pp_seg"][0]
    oh = (ids[:, None] == jnp.arange(asm.Kpp, dtype=ids.dtype)).astype(H.dtype)
    return oh.T @ H


@jax.jit
def reduce_ll_reshape(H):
    M = plan.E // asm.Nl
    return H.reshape(asm.Nl, M, 9).sum(axis=1)


timeit("asm: pp one-hot GEMM", reduce_pp_onehot, Hpp[0])
timeit("asm: ll reshape-sum", reduce_ll_reshape, Hll[0])

# ---- solve sub-stages (uniform path) ---------------------------------
Bp, Bl, Np, Nl = asm.Bp, asm.Bl, asm.Np, asm.Nl


@jax.jit
def st_panels(bsys):
    return solver._uniform_panels(bsys)


c_inv, Ut, Wt = timeit("solve: uniform panels (c_inv+U+W)", st_panels, bs)


@jax.jit
def st_sc(Ut, Wt, pp):
    return solver._dense_pp(pp) - Wt.T @ Ut


sc = timeit("solve: SC gemm + dense_pp", st_sc, Ut, Wt, bs.pp_blocks)


@jax.jit
def st_chol(sc, rhs):
    L = jnp.linalg.cholesky(sc)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


timeit("solve: dense chol 600 + trisolve", st_chol, sc, bs.eta_p.reshape(-1))
