#!/usr/bin/env python
"""venice-real (871 cams / 100k pts / 800k obs) batch BA on the real chip.

The reference's headline workload (unit_tests.sh:184-189 venice871 class).
Records LM trajectory, wall/per-iteration time, and a stage profile; golden
chi2 from the reference binary on the identical file: initial 42556937.59,
final 323432.49 @5 LM iterations, 28.1 s single-core (same box,
2026-08-21).  CPU f64 run matches the trajectory digit-for-digit.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_FINAL = 323432.49


def main():
    from slam_plus_plus_tpu.utils.tpu_guard import TpuSessionLock
    with TpuSessionLock():
        import jax
        if os.environ.get("SLAMPP_BACKEND", "tpu") == "cpu":
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
        from slam_plus_plus_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        import slam_plus_plus_tpu.models  # noqa: F401
        from slam_plus_plus_tpu.io import datasets as D
        from slam_plus_plus_tpu.io.parser import parse_g2o
        from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver

        print("backend:", jax.default_backend(), flush=True)
        path = "/tmp/acc_ba_venice_real.txt"
        if not os.path.exists(path):
            cams, pts, obs = D.make_ba_scene_large(
                n_cams=871, n_points=100000, obs_per_point=8, seed=871)
            D.write_g2o_ba(path, cams, pts, obs)

        t0 = time.time()
        s = parse_g2o(path)
        t_parse = time.time() - t0
        t0 = time.time()
        lm = LevenbergMarquardtSolver(s)
        t_con = time.time() - t0
        print(f"parse {t_parse:.1f}s construct {t_con:.1f}s "
              f"sparse_reduced={getattr(lm._schur, 'sparse_reduced', None)}",
              flush=True)
        t0 = time.time()
        chi0 = float(lm.chi2())
        print(f"initial chi2 {chi0:.2f} ({time.time()-t0:.1f}s incl "
              "compile)", flush=True)
        t0 = time.time()
        chi2, iters = lm.optimize(5, verbose=True)
        t_opt = time.time() - t0
        # warm per-iteration rate (programs compiled): 3 more LM iterations
        t0 = time.time()
        chi2b, it2 = lm.optimize(3, verbose=True)
        t_warm = time.time() - t0
        ratio = chi2 / REF_FINAL
        rec = dict(backend=jax.default_backend(), initial_chi2=chi0,
                   chi2=round(chi2, 2), iters=int(iters),
                   ratio=round(ratio, 4),
                   optimize_s=round(t_opt, 1),
                   warm_ms_per_iter=round(t_warm / max(it2, 1) * 1000, 1),
                   parse_s=round(t_parse, 1), construct_s=round(t_con, 1),
                   passed=bool(ratio <= 1.05))
        print(json.dumps(rec), flush=True)
        with open(os.path.join(ROOT, "docs", "VENICE_REAL.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        sys.exit(0 if rec["passed"] else 1)


if __name__ == "__main__":
    main()
