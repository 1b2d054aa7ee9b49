"""Solver-suite tests: dogleg, A solver, spmv."""

import numpy as np
import pytest

import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy
from slam_plus_plus_tpu.linalg.spmv import lambda_spmv
from slam_plus_plus_tpu.solvers.a_solver import ASolver
from slam_plus_plus_tpu.solvers.dogleg import DoglegSolver


@pytest.fixture(scope="module")
def man_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("s") / "man.txt"
    poses, edges = datasets.make_manhattan_2d(n_poses=150, seed=17)
    datasets.write_g2o_2d(str(p), edges, poses)
    return str(p)


@pytest.fixture(scope="module")
def ba_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("s") / "ba.txt"
    cams, pts, obs = datasets.make_ba_scene(n_cams=8, n_points=120, seed=18)
    datasets.write_g2o_ba(str(p), cams, pts, obs)
    return str(p)


def test_spmv_matches_scipy(man_file):
    system = parse_g2o(man_file)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    rng = np.random.default_rng(0)
    v_p = jnp.asarray(rng.normal(0, 1, (asm.Np, asm.Bp)))
    v_l = jnp.zeros((max(asm.Nl, 1), asm.Bl))
    out_p, _ = lambda_spmv(asm, bs, v_p, v_l)
    A = partitioned_to_scipy(asm.pp_rows, asm.pp_cols,
                             np.asarray(bs.pp_blocks), asm.Np, asm.Bp)
    ref = (A @ np.asarray(v_p).ravel()).reshape(asm.Np, asm.Bp)
    assert np.abs(np.asarray(out_p) - ref).max() < 1e-8 * np.abs(ref).max()


def test_spmv_matches_scipy_schur(ba_file):
    system = parse_g2o(ba_file)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    rng = np.random.default_rng(1)
    v_p = jnp.asarray(rng.normal(0, 1, (asm.Np, asm.Bp)))
    v_l = jnp.asarray(rng.normal(0, 1, (asm.Nl, asm.Bl)))
    out_p, out_l = lambda_spmv(asm, bs, v_p, v_l)
    A = partitioned_to_scipy(
        asm.pp_rows, asm.pp_cols, np.asarray(bs.pp_blocks), asm.Np, asm.Bp,
        asm.pl_rows, asm.pl_cols, np.asarray(bs.pl_blocks),
        np.asarray(bs.ll_blocks), asm.Nl, asm.Bl)
    v = np.concatenate([np.asarray(v_p).ravel(), np.asarray(v_l).ravel()])
    ref = A @ v
    out = np.concatenate([np.asarray(out_p).ravel(), np.asarray(out_l).ravel()])
    assert np.abs(out - ref).max() < 1e-8 * np.abs(ref).max()


def test_dogleg_manhattan(man_file):
    system = parse_g2o(man_file)
    dl = DoglegSolver(system)
    chi2, iters = dl.optimize(10)
    # must reach the GN fixed point
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
    system2 = parse_g2o(man_file)
    gn_chi2, _ = GaussNewtonSolver(system2).optimize(5)
    assert chi2 <= gn_chi2 * 1.01


def test_dogleg_ba(ba_file):
    system = parse_g2o(ba_file)
    chi2, iters = DoglegSolver(system).optimize(30)
    from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver
    system2 = parse_g2o(ba_file)
    lm_chi2, _ = LevenbergMarquardtSolver(system2).optimize(10)
    assert chi2 <= lm_chi2 * 1.05


def test_a_solver(man_file):
    system = parse_g2o(man_file)
    chi2, iters = ASolver(system).optimize(5)
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
    system2 = parse_g2o(man_file)
    gn_chi2, _ = GaussNewtonSolver(system2).optimize(5)
    assert abs(chi2 - gn_chi2) < 1e-6 * max(gn_chi2, 1.0)


def test_spcg(man_file):
    from slam_plus_plus_tpu.solvers.spcg import SPCGSolver
    system = parse_g2o(man_file)
    chi2, iters = SPCGSolver(system).optimize(5)
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
    system2 = parse_g2o(man_file)
    gn_chi2, _ = GaussNewtonSolver(system2).optimize(5)
    assert abs(chi2 - gn_chi2) < 1e-3 * max(gn_chi2, 1.0)


def test_ba_optimizer_facade(ba_file):
    import numpy as np
    from slam_plus_plus_tpu.app.ba_optimizer import BAOptimizer
    from slam_plus_plus_tpu.io import datasets as D
    cams, pts, obs = D.make_ba_scene(n_cams=8, n_points=120, seed=18)
    opt = BAOptimizer()
    rng = np.random.default_rng(5)
    for c, (pos, q, fx, fy, cx, cy, d) in enumerate(cams):
        opt.add_cam_vertex_g2o(c, pos, q, fx, fy, cx, cy, d)
    for p, pt in enumerate(pts):
        opt.add_xyz_vertex(len(cams) + p, pt + rng.normal(0, 0.05, 3))
    for (pid, cid, u, v) in obs:
        opt.add_p2c_edge(len(cams) + pid, cid, [u, v], np.eye(2))
    chi2_0 = opt.chi2()
    chi2, iters = opt.optimize(5)
    assert chi2 < chi2_0 * 0.1
    cov = opt.covariances()
    assert bool(np.isfinite(np.asarray(cov.p_diag)).all())


def test_incremental_ba_markers(tmp_path):
    import numpy as np
    from slam_plus_plus_tpu.app.incremental_ba import (run_incremental_ba,
                                                       write_incremental_ba)
    from slam_plus_plus_tpu.io import datasets as D
    cams, pts, obs = D.make_ba_scene(n_cams=6, n_points=60, seed=80)
    p = str(tmp_path / "iba.txt")
    write_incremental_ba(p, cams, pts, obs, cams_per_chunk=2)
    final, trace, marg = run_incremental_ba(p, marginals=True)
    assert len(trace) == 3
    assert final < 60.0  # converges near the batch optimum (55.57)
    assert bool(np.isfinite(np.asarray(marg.p_diag)).all())


def test_a_solver_materializes_and_matches_lambda(tmp_path):
    """The A solver builds the rectangular weighted Jacobian and its LSQR
    step equals the lambda (normal-equations) step; optimize() parity."""
    import scipy.sparse as sp
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver

    poses, edges = datasets.make_manhattan_2d(n_poses=120, seed=7)
    p = str(tmp_path / "a.txt")
    datasets.write_g2o_2d(p, edges, poses)
    s1 = parse_g2o(p)
    s2 = parse_g2o(p)

    a = ASolver(s1)
    A, b = a.materialize_A()
    assert sp.issparse(A) and A.shape[0] > A.shape[1]
    # chi2 == ||b||^2 at the linearization point (weighted residuals)
    chi2_direct = float(a.chi2())
    assert abs(float(b @ b) - chi2_direct) < 1e-6 * max(chi2_direct, 1.0)

    gn = GaussNewtonSolver(s2)
    st = gn.asm.snapshot_states(s2)
    bs = gn.asm.assemble(st)
    dx_ref, _ = gn._solve(bs)
    dx_a, _ = a._solve_via_A(a.asm.snapshot_states(s1))
    scale = max(1.0, float(np.abs(np.asarray(dx_ref)).max()))
    assert np.abs(np.asarray(dx_a) - np.asarray(dx_ref)).max() < 1e-6 * scale

    chi_a, it_a = a.optimize(5)
    chi_l, it_l = gn.optimize(5)
    assert it_a == it_l
    assert abs(chi_a - chi_l) < 1e-6 * max(chi_l, 1.0)


def test_spcg_subgraph_preconditioner(man_file):
    """The spanning-tree subgraph preconditioner (the reference solver's
    defining design, NonlinearSolver_SPCG.h:19) engages on pose graphs and
    matches the dense-solver optimum."""
    from slam_plus_plus_tpu.solvers.spcg import SPCGSolver
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver
    system = parse_g2o(man_file)
    sv = SPCGSolver(system, cg_iters=400)
    assert sv.preconditioner == "subgraph"
    assert sv._tree_chol.plan.n_bottom >= 1
    chi2, iters = sv.optimize(5)
    ref_chi2, _ = GaussNewtonSolver(parse_g2o(man_file)).optimize(5)
    assert chi2 <= ref_chi2 * 1.01 + 1e-6, (chi2, ref_chi2)
