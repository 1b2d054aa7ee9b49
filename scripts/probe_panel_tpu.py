#!/usr/bin/env python
"""On-chip probe for the Pallas masked-broadcast panel kernel.

Validates (a) Mosaic compiles it, (b) values match the one-hot einsum path,
(c) standalone timing on the bench BA scene.  Run FIRST in a TPU session;
if it fails, export SLAMPP_PALLAS_PANELS=0 for the remaining steps.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from slam_plus_plus_tpu.utils.tpu_guard import TpuSessionLock
    with TpuSessionLock():
        import jax
        import jax.numpy as jnp
        import numpy as np
        from slam_plus_plus_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        import slam_plus_plus_tpu.models  # noqa: F401
        from slam_plus_plus_tpu.io import datasets as D
        from slam_plus_plus_tpu.io.parser import parse_g2o
        from slam_plus_plus_tpu.assembly.assembler import Assembler
        from slam_plus_plus_tpu.linalg.schur import SchurSolver

        print("backend:", jax.default_backend(), flush=True)
        path = "/tmp/bench_ba_100_8000_77.txt"
        if not os.path.exists(path):
            cams, pts, obs = D.make_ba_scene(n_cams=100, n_points=8000,
                                             seed=77)
            D.write_g2o_ba(path, cams, pts, obs)
        s = parse_g2o(path)
        asm = Assembler(s)
        bs = asm.assemble(asm.snapshot_states(s))
        sch = SchurSolver(asm)
        print("panel mode:", sch.panel_mode, flush=True)

        os.environ["SLAMPP_PALLAS_PANELS"] = "0"
        f_ein = jax.jit(lambda b: sch._uniform_panels(b))
        c0, U0, W0 = f_ein(bs)
        jax.block_until_ready(U0)
        t0 = time.perf_counter()
        for _ in range(20):
            c0, U0, W0 = f_ein(bs)
        jax.block_until_ready(U0)
        t_ein = (time.perf_counter() - t0) / 20 * 1e3

        os.environ["SLAMPP_PALLAS_PANELS"] = "1"
        f_pal = jax.jit(lambda b: sch._uniform_panels(b))
        c1, U1, W1 = f_pal(bs)
        jax.block_until_ready(U1)
        t0 = time.perf_counter()
        for _ in range(20):
            c1, U1, W1 = f_pal(bs)
        jax.block_until_ready(U1)
        t_pal = (time.perf_counter() - t0) / 20 * 1e3

        du = float(jnp.max(jnp.abs(U0 - U1)))
        dw = float(jnp.nanmax(jnp.abs(W0 - W1)))
        print(f"einsum panels: {t_ein:.2f} ms   pallas panels: {t_pal:.2f} "
              f"ms   maxdiff U {du:.2e} W {dw:.2e}", flush=True)
        ok = du < 1e-3 and t_pal > 0
        print("PROBE", "PASS" if ok else "FAIL", flush=True)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
