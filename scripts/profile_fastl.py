"""Stage-level profiling of the FastL incremental per-step constant.

Usage: python scripts/profile_fastl.py [n_poses]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
from slam_plus_plus_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io.datasets import make_manhattan_2d, write_g2o_2d
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.fastl import FastLSolver

n = int(sys.argv[1]) if len(sys.argv) > 1 else 600

poses, edges = make_manhattan_2d(n_poses=n, seed=3)
write_g2o_2d('/tmp/prof_m.txt', edges, poses)
system = parse_g2o('/tmp/prof_m.txt')

solver = FastLSolver(system, every_n=1)

# instrument the stage methods
stages = {}


def wrap(obj, name, key):
    orig = getattr(obj, name)

    def inner(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        jax.block_until_ready(out if not isinstance(out, tuple) else out[0])
        stages.setdefault(key, []).append(time.perf_counter() - t0)
        return out
    setattr(obj, name, inner)


wrap(solver, '_apply_pending', 'omega+scatter')
wrap(solver, '_init_stores', 'full_init(assemble+factor)')
wrap(solver, '_solve', 'solve(standalone)')
wrap(solver, '_refactor', 'full_refactor')
if solver.inc is not None:
    wrap(solver.inc, '_host_walk', 'host_walk')
    wrap(solver.inc, '_pack', 'pack_bundles')
    wrap(solver.inc, '_step_jit', 'fused_step_kernel')

t0 = time.perf_counter()
chi2, iters = solver.run()
elapsed = time.perf_counter() - t0

print(f"n={n} chi2={chi2:.2f} iters={iters} total={elapsed:.2f}s "
      f"({1e3 * elapsed / len(solver.steps):.2f} ms/step)")
print(f"stats: {solver.stats}")
if solver.inc is not None:
    print(f"overflows: {solver.inc.n_overflows}")
print(f"plan: levels={len(solver.chol.plan.levels)} "
      f"n_bottom={solver.chol.plan.n_bottom}")
for k, ts in sorted(stages.items(), key=lambda kv: -sum(kv[1])):
    a = np.array(ts)
    print(f"  {k:28s} tot={a.sum():7.2f}s n={len(a):5d} "
          f"med={1e3 * np.median(a):7.3f}ms p90={1e3 * np.percentile(a, 90):7.3f}ms "
          f"max={1e3 * a.max():8.1f}ms")
ss = sum(np.median(np.array(ts)) for ts in stages.values()
         if len(ts) > 50)
print(f"steady-state per-step (sum of hot-stage medians): {1e3 * ss:.3f} ms")
