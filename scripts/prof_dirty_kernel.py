"""Micro-benchmark the IncrementalCholesky dirty kernel in isolation."""
import time

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

# warm up host walk + pack
bundles, D_bot = inc._host_walk(dirty_pos)
print("bundle sizes per level:",
      [(len(b['D']), len(b['E']), len(b['W']), len(b['P'])) for b in bundles],
      "bot:", len(D_bot))
flat, cnts = inc._bundles_to_device(bundles, D_bot)
all_pos = np.concatenate(dirty_pos)
D0 = bundles[0]['D'] if inc.plan.levels else D_bot
seg = np.searchsorted(D0, all_pos)
omega_vals = dirty_vals[0]

inner = {k: stores[k] for k in
         ('H_levels', 'c_invs', 'Ws', 'prods', 'dense', 'L', 's')}
inner['H_levels'] = (stores['H0'],) + tuple(stores['H_levels'][1:])

# donation consumes buffers: chain the output back in as input
out = inc._dirty_jit(inner, omega_vals, jax.numpy.asarray(seg), flat, cnts)
jax.block_until_ready(out)
N = 200
t0 = time.perf_counter()
for _ in range(N):
    inner = {k: out[k] for k in
             ('H_levels', 'c_invs', 'Ws', 'prods', 'dense', 'L', 's')}
    out = inc._dirty_jit(inner, omega_vals, jax.numpy.asarray(seg),
                         flat, cnts)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / N
print(f"dirty kernel steady state: {1e3 * dt:.3f} ms/call")

# cost breakdown: compiled HLO op count
lowered = jax.jit(inc._dirty_impl, donate_argnums=(0,)).lower(
    inner, omega_vals, jax.numpy.asarray(seg), flat, cnts)
comp = lowered.compile()
try:
    an = comp.cost_analysis()
    an = an[0] if isinstance(an, list) else an
    print("flops:", an.get('flops'), "bytes:", an.get('bytes accessed'))
except Exception as e:  # noqa: BLE001
    print("cost analysis unavailable:", e)
