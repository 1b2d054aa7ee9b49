#!/usr/bin/env python
"""Schur-ordering research analysis CLI.

The analogue of the reference's slam_schur_orderings research binary
(reference src/slam_schur_orderings/Main.cpp:759,2139,2524): load a dataset,
analyze elimination orderings of its block structure, and print
per-level statistics:

  * the nested MIS-Schur elimination (the engine's own ordering,
    linalg/block_cholesky.py): per level n, eliminated set size, pairs,
    fill-product count — the MIS/clique analysis output;
  * nested BFS-bisection Schur analysis (linalg/nested_schur.py) — the
    recursive-partition experiment of the reference tool;
  * comparison of the dense bottom size / fill against the natural
    (no-reordering) elimination estimate.

Usage: python scripts/schur_orderings.py <dataset.g2o> [--max-degree N]
"""
import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.block_cholesky import SymbolicPlan
from slam_plus_plus_tpu.linalg.nested_schur import nested_schur_analysis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--max-degree", type=int, default=16)
    ap.add_argument("--bottom", type=int, default=64)
    args = ap.parse_args()

    system = parse_g2o(args.input)
    asm = Assembler(system)
    print(f"dataset: {args.input}")
    print(f"block structure: Np={asm.Np} (Bp={asm.Bp}) Nl={asm.Nl} "
          f"(Bl={asm.Bl}) Kpp={asm.Kpp} Kpl={asm.Kpl}")

    # --- MIS-Schur elimination levels (the factorization's own ordering) --
    plan = SymbolicPlan(asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp,
                        bottom=args.bottom, max_degree=args.max_degree)
    print("\nMIS-Schur elimination levels "
          "(n, |MIS|, pairs, fill products, MIS frac):")
    total_fill = 0
    for li, lv in enumerate(plan.levels):
        total_fill += len(lv.pa)
        print(f"  L{li:2d}: n={lv.n:7d} elim={lv.n_elim:7d} "
              f"K={lv.K:8d} prods={len(lv.pa):8d} "
              f"frac={lv.n_elim / max(lv.n, 1):.2f}")
    nb = plan.n_bottom
    print(f"  bottom: {nb} blocks ({nb * asm.Bp} dims dense) "
          f"after {len(plan.levels)} levels; total fill products "
          f"{total_fill}")

    # flop model: batched level work vs one dense factorization
    B = asm.Bp
    level_flops = sum(
        lv.n_elim * B ** 3 + len(lv.u_src) * 2 * B ** 3 +
        len(lv.pa) * 2 * B ** 3 for lv in plan.levels)
    dense_flops = (asm.Np * B) ** 3 / 3
    bottom_flops = (nb * B) ** 3 / 3
    print(f"  flops: levels {level_flops / 1e9:.3f} GF + bottom "
          f"{bottom_flops / 1e9:.3f} GF  (one dense factorization: "
          f"{dense_flops / 1e9:.3f} GF, "
          f"x{dense_flops / max(level_flops + bottom_flops, 1):.1f})")

    # --- nested BFS Schur partitions (the reference tool's experiment) ----
    print("\nnested BFS-bisection Schur analysis:")
    for row in nested_schur_analysis(asm):
        print(f"  {row}")


if __name__ == "__main__":
    main()
