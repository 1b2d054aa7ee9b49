"""slam_plus_plus_tpu CLI — flag-compatible with the reference app.

Reference analogue: src/slam_app/Main.cpp:41 (main), TCommandLineArgs
(include/slam_app/Main.h:1645, defaults src/slam_app/Main.cpp:670-707) and
the per-family dispatchers n_Run_*_Solver (include/slam_app/Main.h:1782).

Supported flags (reference names):
  -i <file>          input dataset (g2o dialect)
  -po                pose-only (expect no landmarks; informational)
  -nsp <N>           nonlinear solve every N vertices (incremental mode)
  -lsp <N>           linear solve every N vertices (incremental mode)
  -A | -,\\ | -,\\lm   solver: A (GN over A) / lambda (GN) / lambda-LM
  -fL | -L | -,\\dl   FastL / L / dogleg — mapped to the incremental engine
  -us                use Schur complement (auto-on for landmark problems)
  -dm                compute marginals after the final solve
  -mnsi <N>          max nonlinear-solve iterations        (default 10)
  -nset <e>          nonlinear-solve dx threshold          (default 20)
  -mfnsi <N>         max final-optimization iterations     (default 5)
  -fnset <e>         final-optimization dx threshold       (default 0.01)
  -s / -v            silent / verbose
  -nb                no bitmaps (plots)
  -dx <file>         write solution (default solution.txt; '' disables)
  --cpu              force the CPU backend (f64) — useful for verification
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(
        prog="slam_plus_plus_tpu",
        description="TPU-native incremental sparse NLS optimizer "
                    "(SLAM / BA), flag-compatible with SLAM++")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-po", "--pose-only", action="store_true")
    p.add_argument("-nsp", "--nonlinear-solve-period", type=int, default=0)
    p.add_argument("-lsp", "--linear-solve-period", type=int, default=0)
    p.add_argument("-A", dest="solver", action="store_const", const="a")
    p.add_argument("-lm", "-,\\lm", dest="solver", action="store_const",
                   const="lambda_lm")
    p.add_argument("-fL", "-L", dest="solver", action="store_const",
                   const="fast_l")
    p.add_argument("-dl", "-,\\dl", dest="solver", action="store_const",
                   const="lambda_dl")
    p.add_argument("-us", "--use-schur", action="store_true")
    p.add_argument("-dm", "--marginals", action="store_true")
    p.add_argument("-mnsi", type=int, default=10)
    p.add_argument("-nset", type=float, default=20.0)
    p.add_argument("-mfnsi", type=int, default=5)
    p.add_argument("-fnset", type=float, default=0.01)
    p.add_argument("-s", "--silent", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-nb", "--no-bitmaps", action="store_true")
    p.add_argument("-dx", "--solution", default="solution.txt")
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import slam_plus_plus_tpu.models  # noqa: F401 (register the type zoo)
    from slam_plus_plus_tpu.io.parser import parse_g2o, peek_dataset
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
    from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver

    flags = peek_dataset(args.input)
    is_ba = flags["has_ba"] or flags["has_stereo"] or flags["has_spheron"]
    if not args.silent:
        fam = [k for k, v in flags.items() if v]
        print(f"dataset: {args.input} ({', '.join(fam) or 'unknown'})")

    t_parse0 = time.perf_counter()
    system = parse_g2o(args.input)
    t_parse = time.perf_counter() - t_parse0
    if not args.silent:
        nv = len(system.vertex_order)
        ne = sum(s.n for s in system.edge_stores.values())
        print(f"parsed {nv} vertices, {ne} edges in {t_parse:.3f}s")
    if not system.edge_stores:
        print("error: no edges in the dataset", file=sys.stderr)
        return 1

    # solver selection: BA defaults to lambda-LM like the reference
    # (src/slam_app/Main.cpp:205-210); everything else to lambda (GN)
    solver_kind = args.solver or ("lambda_lm" if is_ba else "lambda")

    incremental = args.nonlinear_solve_period > 0 or args.linear_solve_period > 0

    t0 = time.perf_counter()
    if incremental:
        from slam_plus_plus_tpu.solvers.incremental import IncrementalSolver
        every_n = args.nonlinear_solve_period or args.linear_solve_period
        max_it = args.mnsi if args.nonlinear_solve_period else 1
        thresh = args.nset if args.nonlinear_solve_period else 0.0
        inc = IncrementalSolver(system, every_n=every_n,
                                max_iterations=max_it, dx_threshold=thresh)
        chi2, iters = inc.run(verbose=args.verbose)
        elapsed = time.perf_counter() - t0
        print(f"done. it took {elapsed:.5f} sec")
        print(f"solver took {iters} iterations")
    else:
        cls = (LevenbergMarquardtSolver if solver_kind == "lambda_lm"
               else GaussNewtonSolver)
        solver = cls(system)
        if args.verbose:
            print(f"initial denormalized chi2 error: {solver.chi2():.2f}")
        chi2, iters = solver.optimize(args.mfnsi, args.fnset,
                                      verbose=args.verbose)
        elapsed = time.perf_counter() - t0
        print(f"done. it took {elapsed:.5f} sec")
        print(f"solver took {iters} iterations")

    print(f"denormalized chi2 error: {chi2:.2f}")

    if args.marginals:
        from slam_plus_plus_tpu.assembly.assembler import Assembler
        from slam_plus_plus_tpu.marginals import Marginals
        asm = Assembler(system)
        bs = asm.assemble(asm.snapshot_states(system))
        marg = Marginals(asm).compute(bs)
        import numpy as np
        print("marginals: mean pose sigma "
              f"{float(np.sqrt(np.abs(np.asarray(marg.p_diag)).mean())):.6f}")

    if args.solution:
        _dump_solution(system, args.solution)
        if not args.silent:
            print(f"solution written to {args.solution}")

    if not args.no_bitmaps:
        try:
            from slam_plus_plus_tpu.app.plot import plot_system
            out = plot_system(system, "solution.png")
            if out and not args.silent:
                print(f"plot written to {out}")
        except Exception as e:  # plotting is best-effort, like the reference
            print(f"warning: plot failed: {e}", file=sys.stderr)
    return 0


def _dump_solution(system, path):
    """Vertex states in global-id order (reference CFlatSystem::Dump)."""
    with open(path, "w") as f:
        for gid in sorted(system.vertex_directory.keys()):
            tname, li = system.vertex_directory[gid]
            state = system.vertex_stores[tname].states[li]
            f.write(" ".join(f"{v:.10f}" for v in state) + "\n")


if __name__ == "__main__":
    sys.exit(main())
