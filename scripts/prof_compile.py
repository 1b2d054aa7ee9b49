"""Where does compile time go? Constants-embedded vs args-passed indices."""
import time

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io.datasets import make_manhattan_2d, write_g2o_2d
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.fastl import FastLSolver

poses, edges = make_manhattan_2d(n_poses=600, seed=3)
write_g2o_2d('/tmp/prof_m.txt', edges, poses)
system = parse_g2o('/tmp/prof_m.txt')
solver = FastLSolver(system, every_n=1)
inc = solver.inc
asm = solver.asm
K0 = len(asm.pp_rows)
H0 = jnp.zeros((K0, 9), dtype=asm.dtype)

for name, fn, args in [
    ("full(H0)", inc._full_impl, (H0,)),
]:
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    comp = lowered.compile()
    t2 = time.perf_counter()
    hlo = lowered.as_text()
    print(f"{name}: trace+lower={t1 - t0:.2f}s compile={t2 - t1:.2f}s "
          f"hlo_chars={len(hlo) / 1e6:.2f}M")
