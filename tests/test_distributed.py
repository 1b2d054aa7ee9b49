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

    asm1 = Assembler(system)
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
