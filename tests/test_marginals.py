"""Marginal covariance tests vs a dense inverse oracle.

Mirrors the reference's own validation strategy — marginals checked against
the dense inverse on small problems (reference Calculate_DenseMarginals_Ref,
include/slam/Marginals.h:81)."""

import numpy as np
import pytest

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy
from slam_plus_plus_tpu.marginals import Marginals


def _oracle_diag(asm, bs):
    """Dense inverse of the full partitioned lambda; block diagonals."""
    A = partitioned_to_scipy(
        asm.pp_rows, asm.pp_cols, np.asarray(bs.pp_blocks), asm.Np, asm.Bp,
        asm.pl_rows if asm.Nl else None, asm.pl_cols if asm.Nl else None,
        np.asarray(bs.pl_blocks) if asm.Nl else None,
        np.asarray(bs.ll_blocks) if asm.Nl else None, asm.Nl, asm.Bl).toarray()
    S = np.linalg.inv(A)
    Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
    p_diag = np.stack([S[i * Bp:(i + 1) * Bp, i * Bp:(i + 1) * Bp].reshape(-1)
                       for i in range(Np)])
    off = Np * Bp
    l_diag = (np.stack([S[off + i * Bl:off + (i + 1) * Bl,
                          off + i * Bl:off + (i + 1) * Bl].reshape(-1)
                        for i in range(Nl)]) if Nl else None)
    return p_diag, l_diag


def test_marginals_pose_only():
    poses, edges = datasets.make_manhattan_2d(n_poses=60, seed=13)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "m.txt")
    datasets.write_g2o_2d(path, edges, poses)
    system = parse_g2o(path)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    marg = Marginals(asm)
    res = marg.compute(bs)
    p_diag, _ = _oracle_diag(asm, bs)
    scale = np.abs(p_diag).max()
    assert np.abs(np.asarray(res.p_diag) - p_diag).max() < 1e-8 * scale


def test_marginals_schur():
    gp, gl, pe, le = datasets.make_landmark_2d(n_poses=50, n_landmarks=20,
                                               seed=14)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "lm.txt")
    datasets.write_g2o_landmark_2d(path, pe, le)
    system = parse_g2o(path)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    marg = Marginals(asm)
    res = marg.compute(bs)
    p_diag, l_diag = _oracle_diag(asm, bs)
    scale_p = np.abs(p_diag).max()
    scale_l = np.abs(l_diag).max()
    assert np.abs(np.asarray(res.p_diag) - p_diag).max() < 1e-8 * scale_p
    assert np.abs(np.asarray(res.l_diag)[:asm.Nl] - l_diag).max() < 1e-8 * scale_l


def test_marginals_schur_chunked():
    """Force multi-chunk landmark panels to exercise the scan path."""
    gp, gl, pe, le = datasets.make_landmark_2d(n_poses=50, n_landmarks=30,
                                               seed=15)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "lm.txt")
    datasets.write_g2o_landmark_2d(path, pe, le)
    system = parse_g2o(path)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))

    marg = Marginals(asm)
    # shrink the chunk to force the scan path
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    marg._schur = SchurSolver(asm, chunk=8)
    marg._compute_jit = __import__("jax").jit(marg._compute_impl)
    res = marg.compute(bs)
    p_diag, l_diag = _oracle_diag(asm, bs)
    assert np.abs(np.asarray(res.p_diag) - p_diag).max() < 1e-8 * np.abs(p_diag).max()
    assert np.abs(np.asarray(res.l_diag)[:asm.Nl] - l_diag).max() < 1e-8 * np.abs(l_diag).max()


def test_incremental_marginals_update():
    """Woodbury omega-update == full recompute after adding a closure edge."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.marginals.covariance import IncrementalMarginals
    poses, edges = datasets.make_manhattan_2d(n_poses=150, seed=16)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "m.txt")
    # hold out the last loop-closure edge
    closures = [e for e in edges if abs(e[0] - e[1]) > 1]
    assert closures
    held = closures[-1]
    rest = [e for e in edges if e is not held]
    datasets.write_g2o_2d(path, rest)
    system = parse_g2o(path)
    asm = Assembler(system)
    states = asm.snapshot_states(system)
    bs = asm.assemble(states)

    inc = IncrementalMarginals(asm)
    res0 = inc.compute(bs)

    # add the held-out edge; full graph assembler for the oracle
    path2 = os.path.join(tempfile.mkdtemp(), "m2.txt")
    datasets.write_g2o_2d(path2, rest + [held])
    system2 = parse_g2o(path2)
    # same states for both (system2's initializer composes identically for
    # existing vertices; closure edge adds no vertex)
    asm2 = Assembler(system2)
    states2 = asm2.snapshot_states(system2)
    bs2 = asm2.assemble(states2)
    oracle = Marginals(asm2).compute(bs2)

    # omega sqrt for the new edge, evaluated at the same linearization;
    # the writer sorts edges chronologically, so find it by vertex ids
    store2 = system2.edge_stores["edge_pose2d"]
    matches = [e for e in range(store2.n)
               if tuple(store2.vertex_ids[e]) == (held[0], held[1])
               and np.allclose(store2.measurements[e], held[2])]
    assert len(matches) == 1
    eidx = matches[0]
    G = IncrementalMarginals.omega_sqrt_for_edge(asm2, states2,
                                                 "edge_pose2d", eidx)
    assert inc.b_can_update(G.shape[1])
    updated = inc.update(jnp.asarray(G))

    a = np.asarray(updated)
    b = np.asarray(oracle.p_diag)
    scale = np.abs(b).max()
    assert np.abs(a - b).max() < 1e-8 * scale
