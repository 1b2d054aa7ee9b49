"""Micro-benchmark the fused IncrementalCholesky step in isolation."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io.datasets import make_manhattan_2d, write_g2o_2d
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.fastl import FastLSolver

poses, edges = make_manhattan_2d(n_poses=600, seed=3)
write_g2o_2d('/tmp/prof_m.txt', edges, poses)
system = parse_g2o('/tmp/prof_m.txt')
solver = FastLSolver(system, every_n=1)
asm = solver.asm
states = asm.snapshot_states(system)
counts = {n: len(asm.edge_data[n]['z']) for n in asm.edge_data}
stores, eta0 = solver._init_stores(states, counts, asm.Np)
inc = solver.inc

# one typical pending edge: the last odometry edge
ename = list(asm.edge_data.keys())[0]
el = counts[ename] - 1
pos_meta, _ = solver._omega_meta[ename]
dirty_pos = [np.array([int(p[el]) for p in pos_meta], dtype=np.int64)]
C = len(dirty_pos[0])
dirty_vals = [jax.numpy.zeros((C, asm.Bp * asm.Bp), dtype=asm.dtype)]

bundles, D_bot = inc._host_walk(dirty_pos)
print("bundle sizes per level:",
      [(len(b['D']), len(b['E']), len(b['W']), len(b['P'])) for b in bundles],
      "bot:", len(D_bot))

N = 200
t0 = time.perf_counter()
for _ in range(N):
    hp = inc.prepare_host(dirty_pos)
dt_host = (time.perf_counter() - t0) / N
print(f"prepare_host (walk + pack): {1e3 * dt_host:.3f} ms")

# warm, then steady-state fused dirty+solve step
res = inc.step(stores, eta0, dirty_pos, dirty_vals)
stores, dx, nrm = res
t0 = time.perf_counter()
for _ in range(N):
    stores, dx, nrm = inc.step(stores, eta0, dirty_pos, dirty_vals)
jax.block_until_ready(dx)
dt = (time.perf_counter() - t0) / N
print(f"fused step (omega-vals + dirty + solve): {1e3 * dt:.3f} ms/call")

# cost breakdown: compiled HLO stats of the fused program
packed = inc._prepare(dirty_pos, dirty_vals)
inner = {k: stores[k] for k in
         ('H', 'C', 'W', 'P', 'dense', 'L', 's', 'sv', 'outer0')}
lowered = jax.jit(inc._step_impl, donate_argnums=(0,)).lower(
    inner, *packed, eta0)
comp = lowered.compile()
try:
    an = comp.cost_analysis()
    an = an[0] if isinstance(an, list) else an
    print("flops:", an.get('flops'), "bytes:", an.get('bytes accessed'))
except Exception as e:  # noqa: BLE001
    print("cost analysis unavailable:", e)
