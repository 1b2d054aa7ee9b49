"""Multi-device distributed assembly tests (8 virtual CPU devices).

The new capability vs the single-process reference (SURVEY §2.3 P6): edge-
sharded shard_map assembly with psum over a Mesh must reproduce the
single-device BlockSystem bitwise-closely, through the full solve.
"""

import numpy as np
import pytest

import jax

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@needs_devices
@pytest.mark.parametrize("family", ["man", "ba"])
def test_distributed_assembly_matches(tmp_path, family):
    from slam_plus_plus_tpu.parallel import DistributedAssembler, make_edge_mesh
    if family == "man":
        poses, edges = D.make_manhattan_2d(n_poses=100, seed=101)
        p = str(tmp_path / "f.txt")
        D.write_g2o_2d(p, edges, poses)
    else:
        cams, pts, obs = D.make_ba_scene(n_cams=5, n_points=40, seed=102)
        p = str(tmp_path / "f.txt")
        D.write_g2o_ba(p, cams, pts, obs)
    system = parse_g2o(p)

    import dataclasses
    from slam_plus_plus_tpu.config import SolverConfig
    # flat layout on both sides: the distributed assembler shards parse-order
    # edge slices, and this test compares raw block arrays elementwise
    asm1 = Assembler(system, dataclasses.replace(SolverConfig(),
                                                 edge_layout="flat"))
    mesh = make_edge_mesh(8)
    asm8 = DistributedAssembler(system, mesh)
    st = asm1.snapshot_states(system)
    b1 = asm1.assemble(st)
    b8 = asm8.assemble(st)
    assert abs(float(b1.chi2) - float(b8.chi2)) < 1e-9 * max(float(b1.chi2), 1)
    for name in ("pp_blocks", "pl_blocks", "ll_blocks", "eta_p", "eta_l"):
        a = np.asarray(getattr(b1, name))
        b = np.asarray(getattr(b8, name))
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 1e-9 * scale, name


@needs_devices
def test_distributed_full_step(tmp_path):
    """One full distributed damped-GN/Schur step == single-device step."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    from slam_plus_plus_tpu.parallel import DistributedAssembler, make_edge_mesh
    from slam_plus_plus_tpu.solvers.lm import damp_system

    cams, pts, obs = D.make_ba_scene(n_cams=5, n_points=40, seed=103)
    p = str(tmp_path / "f.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    system = parse_g2o(p)

    def step(asm):
        schur = SchurSolver(asm)
        st = asm.snapshot_states(system)
        bs = asm.assemble(st)
        bs = damp_system(bs, float(bs.max_hdiag) * 1e-3, asm.pp_diag_ids_dev)
        dx_p, dx_l = schur.solve(bs)
        new_states = asm.update(st, dx_p, dx_l)
        return {k: np.asarray(v) for k, v in new_states.items()}

    s1 = step(Assembler(system))
    s8 = step(DistributedAssembler(system, make_edge_mesh(8)))
    for k in s1:
        assert np.abs(s1[k] - s8[k]).max() < 1e-8 * max(np.abs(s1[k]).max(), 1)


@needs_devices
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@needs_devices
def test_distributed_schur_matches_single(tmp_path):
    """Sharded SC panels + psum == single-chip Schur solve (the GPU-vs-CPU
    verification analogue, LinearSolver_Schur_GPU.cpp:58-61)."""
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    from slam_plus_plus_tpu.parallel import make_edge_mesh
    from slam_plus_plus_tpu.parallel.dist import DistributedSchurSolver
    from slam_plus_plus_tpu.solvers.lm import damp_system

    cams, pts, obs = D.make_ba_scene(n_cams=12, n_points=160, seed=111)
    p = str(tmp_path / "ba.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    system = parse_g2o(p)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    bs = damp_system(bs, float(bs.max_hdiag) * 1e-3, asm.pp_diag_ids_dev)

    single = SchurSolver(asm)
    dxp1, dxl1 = single.solve(bs)
    mesh = make_edge_mesh(8)
    dist = DistributedSchurSolver(asm, mesh)
    dxp8, dxl8 = dist.solve(bs)
    scale = max(float(np.abs(np.asarray(dxp1)).max()), 1e-12)
    assert np.abs(np.asarray(dxp8) - np.asarray(dxp1)).max() < 1e-9 * scale
    assert np.abs(np.asarray(dxl8) - np.asarray(dxl1)).max() < 1e-8


@needs_devices
def test_distributed_schur_flops_scaling(tmp_path):
    """Per-device FLOPs of the sharded SC panel product must scale ~1/n
    (>= 70% efficiency — the SURVEY gate; wall-clock on virtual CPU devices
    shares one physical socket, so the partitioning is measured via XLA
    cost analysis of the per-shard program)."""
    from slam_plus_plus_tpu.parallel import make_edge_mesh
    from slam_plus_plus_tpu.parallel.dist import DistributedSchurSolver

    cams, pts, obs = D.make_ba_scene(n_cams=20, n_points=600, seed=112)
    p = str(tmp_path / "ba.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    system = parse_g2o(p)
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))

    import jax
    flops = {}
    for n in (1, 2, 4):
        mesh = make_edge_mesh(n)
        dist = DistributedSchurSolver(asm, mesh)
        comp = jax.jit(dist._solve_impl).lower(bs).compile()
        fl = comp.cost_analysis()
        flops[n] = float((fl[0] if isinstance(fl, (list, tuple))
                          else fl)["flops"])
    # the panel product dominates; per-device total must drop with n
    # cost_analysis reports the whole program (per device): efficiency =
    # flops(1dev) / (n * flops_per_device(ndev))
    eff = {n: flops[1] / (n * flops[n]) for n in (2, 4)}
    assert eff[2] >= 0.7, (flops, eff)
    assert eff[4] >= 0.5, (flops, eff)


@needs_devices
def test_distributed_pose_graph_cholesky(tmp_path):
    """The sharded MIS-Schur factorization (W slices all_gathered, fill
    products psum'd per level) must reproduce the single-device factor's
    SOLVE bitwise-closely — the distributed pose-graph path of VERDICT r3
    (reference role: the Schur products, LinearSolver_Schur.h:1744-1767,
    sharded instead of single-node)."""
    from slam_plus_plus_tpu.linalg.block_cholesky import BlockCholeskySolver
    from slam_plus_plus_tpu.parallel import (DistributedBlockCholeskySolver,
                                             make_edge_mesh)

    poses, edges = D.make_manhattan_2d(n_poses=600, seed=31, loop_prob=0.3)
    p = str(tmp_path / "m.txt")
    D.write_g2o_2d(p, edges, poses)
    system = parse_g2o(p)
    asm = Assembler(system)
    st = asm.snapshot_states(system)
    bs = asm.assemble(st)

    single = BlockCholeskySolver(asm.pp_rows, asm.pp_cols, asm.Np, asm.Bp,
                                 bottom=32)
    mesh = make_edge_mesh(8)
    dist = DistributedBlockCholeskySolver(asm.pp_rows, asm.pp_cols, asm.Np,
                                          asm.Bp, mesh, bottom=32)
    assert dist.n_levels == single.n_levels and dist.n_levels >= 3

    dx1 = np.asarray(single.solve(bs.pp_blocks, bs.eta_p))
    dx8 = np.asarray(dist.solve(bs.pp_blocks, bs.eta_p))
    denom = max(np.abs(dx1).max(), 1e-12)
    assert np.abs(dx1 - dx8).max() / denom < 1e-10

    # factor artifacts replicated + reusable by the standard solve path
    f = dist.factor(bs.pp_blocks)
    dx8b = np.asarray(dist.solve_with_factor(f, bs.eta_p))
    assert np.abs(dx1 - dx8b).max() / denom < 1e-10
