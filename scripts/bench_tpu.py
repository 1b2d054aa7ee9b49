#!/usr/bin/env python
"""TPU benchmark: batch pose-graph GN (w100K class) + incremental FastL.

Run on the real chip (axon backend).  Prints timings to stdout; this feeds
docs/BENCH_NOTES.md and the bench.py metric choices.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
from slam_plus_plus_tpu.solvers.fastl import FastLSolver

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def bench_batch_100k():
    path = "/tmp/w100k_s77.txt"
    if not os.path.exists(path):
        poses, edges = D.make_city_2d(n_poses=100000, seed=77)
        D.write_g2o_2d(path, edges, poses)
    s = parse_g2o(path)
    t0 = time.time()
    gn = GaussNewtonSolver(s)
    print(f"[100k batch] build+symbolic {time.time()-t0:.1f}s "
          f"levels={gn._sparse_chol.n_levels} "
          f"bottom={gn._sparse_chol.plan.n_bottom}", flush=True)
    states = gn.asm.snapshot_states(s)
    # warm up assemble+solve
    t0 = time.time()
    bs = gn.asm.assemble(states)
    dx, _ = gn._solve(bs)
    jax.block_until_ready(dx)
    print(f"[100k batch] compile+first iter {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    N = 5
    for _ in range(N):
        bs = gn.asm.assemble(states)
        dx, _ = gn._solve(bs)
    jax.block_until_ready(dx)
    per = (time.time() - t0) / N
    print(f"[100k batch] steady assemble+solve: {per*1000:.1f} ms/iter",
          flush=True)
    # full optimize for chi2
    t0 = time.time()
    chi2, iters = gn.optimize(5)
    print(f"[100k batch] optimize(5): chi2={chi2:.2f} iters={iters} "
          f"in {time.time()-t0:.1f}s  (reference binary: 213795479.57, "
          f"0.80s single-core)", flush=True)


def bench_fastl(n=3500, seed=95):
    path = f"/tmp/man{n}_s{seed}.txt"
    if not os.path.exists(path):
        poses, edges = D.make_manhattan_2d(n_poses=n, seed=seed,
                                           loop_prob=0.3)
        D.write_g2o_2d(path, edges, poses)
    s = parse_g2o(path)
    t0 = time.time()
    inc = FastLSolver(s, every_n=1, refresh="dirty")
    print(f"[fastl {n}] build+symbolic {time.time()-t0:.1f}s "
          f"steps={len(inc.steps)}", flush=True)
    t0 = time.time()
    chi2, iters = inc.run()
    t = time.time() - t0
    st = inc.stats
    print(f"[fastl {n}] chi2={chi2:.2f} iters={iters} "
          f"{t:.1f}s total = {1000*t/st['steps']:.1f} ms/step "
          f"(pushes={st['pushes']} full={st['full_refactors']} "
          f"overflows={inc.inc.n_overflows})", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batch"):
        bench_batch_100k()
    if which in ("all", "fastl"):
        bench_fastl()
