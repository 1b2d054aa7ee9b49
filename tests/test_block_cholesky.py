"""Nested MIS-Schur block Cholesky vs the scipy oracle.

Reference analogue: the built-in block-matrix decomposition unit tests
(reference include/slam_app/BlockUnit.h:59-120) — trusted side here is
scipy spsolve on the identical scalar system.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.block_cholesky import BlockCholeskySolver
from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy


def _random_block_spd(N, B, extra_pairs, seed):
    """Random SPD block system: diag + random off-diag, diagonally dominant."""
    rng = np.random.default_rng(seed)
    rr = rng.integers(0, N, size=extra_pairs)
    cc = rng.integers(0, N, size=extra_pairs)
    lo, hi = np.minimum(rr, cc), np.maximum(rr, cc)
    keep = lo != hi
    keys = np.unique(lo[keep] * N + hi[keep])
    rows = np.concatenate([np.arange(N), keys // N])
    cols = np.concatenate([np.arange(N), keys % N])
    order = np.argsort(rows * N + cols)
    rows, cols = rows[order], cols[order]
    K = len(rows)
    blocks = rng.normal(0, 1, (K, B, B))
    diag = rows == cols
    # symmetric diag blocks, strong dominance
    blocks[diag] = blocks[diag] @ blocks[diag].transpose(0, 2, 1)
    deg = np.bincount(rows[~diag], minlength=N) + np.bincount(
        cols[~diag], minlength=N)
    for k in np.flatnonzero(diag):
        blocks[k] += np.eye(B) * (3.0 * B * (deg[rows[k]] + 1))
    return rows, cols, blocks.reshape(K, B * B)


def _grid_pairs(side):
    """Planar grid graph pairs (the realistic pose-graph structure)."""
    N = side * side
    idx = np.arange(N).reshape(side, side)
    right = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], 1)
    down = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], 1)
    e = np.concatenate([right, down])
    return e[:, 0], e[:, 1]


def _block_spd_from_pairs(rr, cc, N, B, seed):
    lo, hi = np.minimum(rr, cc), np.maximum(rr, cc)
    keys = np.unique(lo * N + hi)
    rows = np.concatenate([np.arange(N), keys // N])
    cols = np.concatenate([np.arange(N), keys % N])
    order = np.argsort(rows * N + cols)
    rows, cols = rows[order], cols[order]
    K = len(rows)
    rng = np.random.default_rng(seed)
    blocks = rng.normal(0, 1, (K, B, B))
    diag = rows == cols
    blocks[diag] = blocks[diag] @ blocks[diag].transpose(0, 2, 1)
    deg = np.bincount(rows[~diag], minlength=N) + np.bincount(
        cols[~diag], minlength=N)
    for k in np.flatnonzero(diag):
        blocks[k] += np.eye(B) * (3.0 * B * (deg[rows[k]] + 1))
    return rows, cols, blocks.reshape(K, B * B)


@pytest.mark.parametrize("N,B,extra,seed", [
    (40, 3, 80, 0),
    (300, 3, 700, 1),
    (300, 6, 700, 2),
])
def test_matches_scipy_random(N, B, extra, seed):
    rows, cols, blocks = _random_block_spd(N, B, extra, seed)
    rng = np.random.default_rng(seed + 100)
    eta = rng.normal(0, 1, (N, B))

    solver = BlockCholeskySolver(rows, cols, N, B, bottom=max(8, N // 20))
    assert solver.n_levels >= 1
    dx = np.asarray(solver.solve(jnp.asarray(blocks), jnp.asarray(eta)))

    A = partitioned_to_scipy(rows, cols, blocks, N, B)
    import scipy.sparse.linalg as spla
    ref = spla.spsolve(A.tocsc(), eta.ravel()).reshape(N, B)
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(dx - ref).max() / scale < 1e-8


def test_matches_scipy_grid():
    """45x45 planar grid (2025 block vertices, the realistic structure)."""
    rr, cc = _grid_pairs(45)
    N = 45 * 45
    rows, cols, blocks = _block_spd_from_pairs(rr, cc, N, 3, 11)
    eta = np.random.default_rng(12).normal(0, 1, (N, 3))
    solver = BlockCholeskySolver(rows, cols, N, 3)
    assert solver.n_levels >= 3
    dx = np.asarray(solver.solve(jnp.asarray(blocks), jnp.asarray(eta)))
    A = partitioned_to_scipy(rows, cols, blocks, N, 3)
    import scipy.sparse.linalg as spla
    ref = spla.spsolve(A.tocsc(), eta.ravel()).reshape(N, 3)
    assert np.abs(dx - ref).max() / max(np.abs(ref).max(), 1.0) < 1e-8


def test_factor_reuse_multiple_rhs():
    rows, cols, blocks = _random_block_spd(200, 3, 400, 7)
    solver = BlockCholeskySolver(rows, cols, 200, 3, bottom=16)
    f = solver.factor(jnp.asarray(blocks))
    A = partitioned_to_scipy(rows, cols, blocks, 200, 3)
    import scipy.sparse.linalg as spla
    lu = spla.splu(A.tocsc())
    rng = np.random.default_rng(8)
    for _ in range(3):
        eta = rng.normal(0, 1, (200, 3))
        dx = np.asarray(solver.solve_with_factor(f, jnp.asarray(eta)))
        ref = lu.solve(eta.ravel()).reshape(200, 3)
        assert np.abs(dx - ref).max() < 1e-8 * max(np.abs(ref).max(), 1.0)


def test_manhattan_lambda_solve(tmp_path):
    """Solve the real assembled pose-graph lambda and check the GN step."""
    poses, edges = D.make_manhattan_2d(n_poses=400, seed=21)
    p = str(tmp_path / "m.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    asm = Assembler(s)
    bs = asm.assemble(asm.snapshot_states(s))

    solver = BlockCholeskySolver(asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp,
                                 bottom=32)
    dx = np.asarray(solver.solve(bs.pp_blocks, bs.eta_p))

    A = partitioned_to_scipy(asm.pp_rows, asm.pp_cols,
                             np.asarray(bs.pp_blocks), asm.Np, asm.Bp)
    import scipy.sparse.linalg as spla
    ref = spla.spsolve(A.tocsc(), np.asarray(bs.eta_p).ravel()).reshape(
        asm.Np, asm.Bp)
    assert np.abs(dx - ref).max() < 1e-8 * max(np.abs(ref).max(), 1.0)


def test_gn_city_uses_sparse_chol(tmp_path):
    """Mid-scale city pose graph routes through the MIS-Schur engine and
    matches the reference GN trajectory (golden via the scipy path)."""
    import jax.numpy as jnp  # noqa: F401
    from slam_plus_plus_tpu.config import SolverConfig
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver

    poses, edges = D.make_city_2d(n_poses=2600, seed=13)
    p = str(tmp_path / "c.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    gn = GaussNewtonSolver(s)
    assert gn._sparse_chol is not None  # 7800 dims > CPU dense limit
    chi2, iters = gn.optimize(5)

    s2 = parse_g2o(p)
    gn2 = GaussNewtonSolver(s2, SolverConfig(linear_solver="scipy"))
    chi2_ref, iters_ref = gn2.optimize(5)
    assert iters == iters_ref
    assert chi2 == pytest.approx(chi2_ref, rel=1e-6)


def test_pin_last_constrained_ordering(tmp_path):
    """pin_last keeps chosen vertices OUT of every elimination level — the
    analogue of the reference's constrained orderings that force blocks to
    the end of the factor (OrderingMagic.h:138-180).  Pinned vertices must
    land in the dense bottom, and the solve must be unchanged."""
    import slam_plus_plus_tpu.models  # noqa: F401
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.linalg.block_cholesky import BlockCholeskySolver

    poses, edges = D.make_manhattan_2d(n_poses=400, seed=5, loop_prob=0.3)
    p = str(tmp_path / "m.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    asm = Assembler(s)
    bs = asm.assemble(asm.snapshot_states(s))

    pins = [7, 123, 399]
    plain = BlockCholeskySolver(asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp,
                                bottom=16)
    pinned = BlockCholeskySolver(asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp,
                                 bottom=16, pin_last=pins)
    assert pinned.n_levels >= 3
    bot = set(int(v) for v in pinned.plan.bottom_orig)
    assert set(pins) <= bot
    import numpy as np
    dx_a = np.asarray(plain.solve(bs.pp_blocks, bs.eta_p))
    dx_b = np.asarray(pinned.solve(bs.pp_blocks, bs.eta_p))
    denom = max(np.abs(dx_a).max(), 1e-12)
    assert np.abs(dx_a - dx_b).max() / denom < 1e-9
