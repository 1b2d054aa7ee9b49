"""The complete Sim(3) edge grid vs reference Sim3_Types.h:247-3598.

Axis-by-axis: {XYZ, InvDepth, InvDist} x {G, LS, LO} x {P2C, P2CI} x
{pixel, angle} plus the Landmark family.  Each edge is checked for (a)
zero residual at an exactly consistent configuration and (b) nonzero
residual under perturbation; a mixed graph exercises the solver path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.manifolds import sim3
from slam_plus_plus_tpu.models.types import EDGE_TYPES
from slam_plus_plus_tpu.models.sim3_types import (
    _invdepth_to_xyz, _invdist4_to_xyz, _local_to_cam, _project_local,
    _world_to_cam)

FX, FY, CX, CY, D = 500.0, 510.0, 320.0, 240.0, 0.0
INTR = np.array([FX, FY, CX, CY, D])
OWNER = np.concatenate([[0.1, -0.2, 0.3], [0.02, 0.05, -0.01], [1.05], INTR])
OBSERVER = np.concatenate([[-0.3, 0.1, 0.2], [0.0, -0.04, 0.03], [0.95],
                           INTR])
PW = np.array([0.4, -0.3, 5.0])          # world point, in front of both


def _as(x):
    return jnp.asarray(np.asarray(x, dtype=np.float64))


def _pix(x_cam):
    return np.asarray(_project_local(_as(x_cam), FX, FY, CX, CY, D))


def _cases():
    """(edge_name, states, exact_z) for every grid member."""
    owner, observer = _as(OWNER), _as(OBSERVER)
    pw = _as(PW)
    x_owner = np.asarray(_world_to_cam(owner, pw))          # owner frame
    p_local = x_owner                                        # owner-local
    x_obs = np.asarray(_local_to_cam(owner, observer, _as(p_local)))
    invdepth_w = np.array([PW[0] / PW[2], PW[1] / PW[2], 1.0 / PW[2]])
    invdepth_l = np.array([p_local[0] / p_local[2], p_local[1] / p_local[2],
                           1.0 / p_local[2]])
    nrm = np.linalg.norm(PW)
    invdist_w = np.concatenate([PW / nrm, [1.0 / nrm]])
    nl = np.linalg.norm(p_local)
    invdist_l = np.concatenate([p_local / nl, [1.0 / nl]])
    z_owner = _pix(x_owner)
    z_obs = _pix(x_obs)
    z_world_in_owner = _pix(x_owner)
    ls7 = np.concatenate([z_owner, INTR])
    intr = _as(INTR)

    return [
        # G family (world-frame landmarks)
        ("edge_p2c_sim3", (owner, pw), z_owner),
        ("edge_p2ci_xyz_sim3", (owner, pw, intr), z_owner),
        ("edge_p2c_invdepth_g", (_as(invdepth_w), owner), z_world_in_owner),
        ("edge_p2c_invdist_g", (_as(invdist_w), owner), z_world_in_owner),
        ("edge_p2ci_invdepth_g", (_as(invdepth_w), owner, intr),
         z_world_in_owner),
        # LS family (owner-local, unary / +intrinsics)
        ("edge_p2c_xyz_ls_u", (_as(p_local),), ls7),
        ("edge_p2c_invdepth_ls_u", (_as(invdepth_l),), ls7),
        ("edge_p2c_invdist_ls_u", (_as(invdist_l),), ls7),
        ("edge_p2ci_xyz_ls", (_as(p_local), intr), z_owner),
        ("edge_p2ci_invdepth_ls", (_as(invdepth_l), intr), z_owner),
        # LO family
        ("edge_p2c_xyz_lo", (owner, observer, _as(p_local)), z_obs),
        ("edge_p2ci_xyz_lo", (owner, observer, _as(p_local), intr), z_obs),
        ("edge_p2ci_invdepth_lo", (owner, observer, _as(invdepth_l), intr),
         z_obs),
        ("edge_p2c_invdepth_lo", (owner, observer, _as(invdepth_l)), z_obs),
        ("edge_p2c_invdist_lo", (owner, observer, _as(invdist_l)), z_obs),
        # Landmark family (direct 3D observations)
        ("edge_landmark_xyz_ls", (_as(p_local),), p_local),
        ("edge_landmark_invdepth_ls", (_as(invdepth_l),), p_local),
        ("edge_landmark_xyz_lo", (owner, observer, _as(p_local)), x_obs),
        ("edge_landmark_invdepth_lo", (owner, observer, _as(invdepth_l)),
         x_obs),
        # AngleErr family (3D cross-product residuals)
        ("edge_p2c_xyz_angle", (owner, pw), z_owner),
        ("edge_p2ci_xyz_angle", (owner, pw, intr), z_owner),
        ("edge_p2c_invdepth_angle", (owner, _as(invdepth_w)), z_owner),
        ("edge_p2ci_invdepth_angle", (owner, _as(invdepth_w), intr),
         z_owner),
        ("edge_p2ci_xyz_angle_ls", (_as(p_local), intr), z_owner),
        ("edge_p2ci_invdepth_angle_ls", (_as(invdepth_l), intr), z_owner),
        ("edge_p2ci_xyz_angle_lo", (owner, observer, _as(p_local), intr),
         z_obs),
        ("edge_p2ci_invdepth_angle_lo",
         (owner, observer, _as(invdepth_l), intr), z_obs),
    ]


@pytest.mark.parametrize("name,states,z", _cases(),
                         ids=[c[0] for c in _cases()])
def test_zero_residual_at_truth(name, states, z):
    et = EDGE_TYPES[name]
    r = np.asarray(et.residual(tuple(states), _as(z)))
    assert r.shape == (et.residual_dim,), (r.shape, et.residual_dim)
    assert np.linalg.norm(r) < 1e-8, (name, r)
    # perturb the first state -> residual moves (nondegenerate jacobian row)
    pert = tuple(s + 0.05 if i == 0 else s for i, s in enumerate(states))
    r1 = np.asarray(et.residual(pert, _as(z)))
    assert np.linalg.norm(r1) > 1e-6, name


def test_grid_is_complete_vs_reference():
    """Every reference Sim3_Types.h edge class has a registered analogue."""
    expected = [
        # ref class -> our registry name
        "edge_p2c_invdepth_g", "edge_p2c_invdist_g", "edge_p2c_sim3",
        "edge_p2ci_xyz_sim3", "edge_p2c_xyz_ls_u", "edge_p2c_xyz_lo",
        "edge_p2ci_xyz_ls", "edge_p2ci_xyz_lo", "edge_p2ci_invdepth_g",
        "edge_p2ci_invdepth_ls", "edge_p2ci_invdepth_lo",
        "edge_p2c_invdepth_ls_u", "edge_p2c_invdepth_lo",
        "edge_p2c_invdist_ls_u", "edge_p2c_invdist_lo",
        "edge_landmark_xyz_ls", "edge_landmark_xyz_lo",
        "edge_landmark_invdepth_ls", "edge_landmark_invdepth_lo",
        "edge_p2ci_xyz_angle_ls", "edge_p2ci_xyz_angle_lo",
        "edge_p2ci_invdepth_angle_ls", "edge_p2ci_invdepth_angle_lo",
        "edge_p2c_xyz_angle", "edge_p2ci_xyz_angle",
        "edge_p2c_invdepth_angle", "edge_p2ci_invdepth_angle",
        "edge_pose_cam_sim3",
    ]
    missing = [n for n in expected if n not in EDGE_TYPES]
    assert not missing, missing


def test_mixed_sim3_graph_converges():
    """Small mixed-edge Sim3 BA graph optimizes through the solver path."""
    from slam_plus_plus_tpu.graph.system import GraphSystem
    from slam_plus_plus_tpu.solvers.lm import LevenbergMarquardtSolver

    rng = np.random.default_rng(11)
    owner, observer = _as(OWNER), _as(OBSERVER)
    sys_ = GraphSystem()
    sys_.add_vertex(0, "cam_sim3", np.asarray(OWNER))
    sys_.add_vertex(1, "cam_sim3", np.asarray(OBSERVER))
    info2 = np.eye(2)
    nv = 2
    for i in range(30):
        pw = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                       rng.uniform(4, 7)])
        z0 = _pix(np.asarray(_world_to_cam(owner, _as(pw))))
        z1 = _pix(np.asarray(_world_to_cam(observer, _as(pw))))
        sys_.add_vertex(nv, "xyz", pw + rng.normal(0, 0.05, 3))
        sys_.add_edge("edge_p2c_sim3", (0, nv), z0, info2)
        sys_.add_edge("edge_p2c_sim3", (1, nv), z1, info2)
        nv += 1
    lm = LevenbergMarquardtSolver(sys_)
    chi0 = lm.chi2()
    chi2, _ = lm.optimize(10)
    assert chi2 < chi0 * 1e-2, (chi0, chi2)


def test_acra_parameterization_study():
    """ba_parameter_acra analogue: all three landmark parameterizations
    build consistent systems (identical initial chi2) and converge."""
    from slam_plus_plus_tpu.app.ba_parameter_acra import run_comparison

    rows = run_comparison(n_cams=4, n_points=30, max_iters=6, verbose=False)
    assert [r["param"] for r in rows] == ["xyz", "invdepth", "invdist"]
    # xyz and invdepth encode the same noisy point exactly -> identical init;
    # invdist's direction comes from the observation ray (different init by
    # design, the parameterization's whole point)
    assert abs(rows[0]["chi2_init"] - rows[1]["chi2_init"]) < \
        1e-6 * rows[0]["chi2_init"]
    # xyz/invdepth reach the pixel-noise floor; invdist (1 dof, frozen
    # direction) lands within a small factor of it — the trade-off the
    # ACRA study quantifies
    assert rows[0]["chi2_final"] < rows[0]["chi2_init"] * 0.05
    assert rows[1]["chi2_final"] < rows[1]["chi2_init"] * 0.05
    assert rows[2]["chi2_final"] < 4.0 * rows[0]["chi2_final"]
